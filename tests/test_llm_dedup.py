"""Near-dup dedup family (llm/dedup.py, llm/graph.py): recall and
guarantee tests against brute-force ground truth on a constructed
corpus. These are the checks the rows-only registry queries
(dedup_minhash_lsh, dedup_simhash, dedup_minhash_clusters) rely on —
their hash families aren't SQL-expressible, so the contract is proven
here instead of against DuckDB.

The corpus is written as a documents.parquet with the production
schema, so every test drives the exact registered query functions.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from spark_lever_spark import registry

VOCAB = [f"tok{i:03d}" for i in range(400)]


def _text(token_ids: list[int]) -> str:
    return " ".join(VOCAB[i] for i in token_ids)


# corpus design (token-id sets, all deterministic):
# 0,1: identical                     -> jaccard 1.0, simhash hamming 0
# 2,3: 30 tokens, one swapped        -> jaccard 29/31 ~ 0.935
# 4,5: mutually disjoint singletons  -> jaccard 0 with everything
# 6,7,8: chain, one swap per hop     -> 6~7 and 7~8 high-sim, 6~8 lower
_DOCS = {
    0: list(range(0, 30)),
    1: list(range(0, 30)),
    2: list(range(40, 70)),
    3: list(range(40, 69)) + [300],
    4: list(range(100, 130)),
    5: list(range(150, 180)),
    6: list(range(200, 230)),
    7: list(range(200, 229)) + [310],
    8: list(range(200, 228)) + [310, 320],
}


def _true_jaccard(a: int, b: int) -> float:
    sa, sb = set(_DOCS[a]), set(_DOCS[b])
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("dedup_corpus")
    rows = [
        {
            "doc_id": i,
            "text": _text(ids),
            "lang": "en",
            "source": "synthetic",
            "n_chars": len(_text(ids)),
        }
        for i, ids in _DOCS.items()
    ]
    pd.DataFrame(rows).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_minhash_lsh_recall_vs_bruteforce(spark, corpus_dir):
    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in registry.all_queries()["dedup_minhash_lsh"]
        .fn(spark, corpus_dir)
        .collect()
    }
    # recall: every truly-high-similarity pair must be a candidate
    # (8 bands x 4 rows: detection prob at s=0.93 is ~0.99998, and the
    # hash family is fixed, so this is deterministic for this corpus)
    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(_DOCS), 2)
        if _true_jaccard(a, b) >= 0.9
    }
    assert expected <= set(got), f"missed {expected - set(got)}"
    # estimate quality: k=32 signature -> sd ~ sqrt(s(1-s)/32) <= 0.09;
    # 0.35 is a >3-sigma tolerance for every emitted pair
    for (a, b), est in got.items():
        assert abs(est - _true_jaccard(a, b)) <= 0.35, (a, b, est)
    # precision floor: nothing disjoint may appear
    assert all(_true_jaccard(a, b) > 0 for a, b in got)


def test_simhash_pigeonhole_guarantee(spark, corpus_dir):
    rows = (
        registry.all_queries()["dedup_simhash"].fn(spark, corpus_dir).collect()
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    # identical docs: hamming 0, guaranteed found (all 4 chunks equal)
    assert pairs.get((0, 1)) == 0
    # the emitted set honors its own contract: only distances the
    # 4x15-bit chunk blocking actually guarantees (hamming <= 3)
    assert all(h <= 3 for h in pairs.values()), pairs
    # disjoint-vocabulary docs are far apart in hamming space — they
    # must not appear at <= 3
    assert (4, 5) not in pairs


def test_minhash_clusters_transitive_closure(spark, corpus_dir):
    rows = (
        registry.all_queries()["dedup_minhash_clusters"]
        .fn(spark, corpus_dir)
        .collect()
    )
    clusters = {r.component: r for r in rows}
    # 0,1 identical -> one cluster, canonical = 0
    assert clusters[0].cluster_size == 2 and clusters[0].canonical_doc == 0
    # 2,3 near-dup -> cluster canonical = 2
    assert clusters[2].cluster_size == 2 and clusters[2].canonical_doc == 2
    # 6~7~8 chain closes transitively even though 6-8 similarity is
    # below the direct threshold
    assert clusters[6].cluster_size == 3 and clusters[6].canonical_doc == 6
    # disjoint docs never cluster
    assert {r.component for r in rows} == {0, 2, 6}
