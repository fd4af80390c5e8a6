"""Approximate-similarity validation: the LSH/IVF paths have no SQL
oracle (randomized/approximate), so their contract is recall against
the exact brute-force baseline — the standard ANN acceptance metric."""

from __future__ import annotations

from spark_lever_spark import registry

ALL = registry.all_queries()


def _exact_top10_ids(spark, sf_dir):
    return {
        r["vec_id"] for r in ALL["knn_cosine_topk"].fn(spark, sf_dir).collect()
    }


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = _exact_top10_ids(spark, sf_dir)
    ivf = {r["vec_id"] for r in ALL["ann_ivf"].fn(spark, sf_dir).collect()}
    assert len(ivf) == 10
    # probing 2/10 cells of near-orthogonal random vectors: demand
    # non-trivial overlap with the exact result, not equality
    assert len(exact & ivf) >= 2


def test_ivf_results_are_valid_neighbors(spark, sf_dir):
    rows = ALL["ann_ivf"].fn(spark, sf_dir).collect()
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_centroids_shape(spark, sf_dir):
    from spark_lever_spark.catalog import load_table
    from spark_lever_spark.llm.embeddings import cell_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = cell_centroids(emb).collect()
    assert len(cents) == 10  # one per label cell
    assert all(len(r["centroid"]) == 64 for r in cents)
