"""Round-18 additions: Bloom-prefiltered n-gram decontamination audit
and an IVF probe-depth recall curve.

Both close quality-vs-cost measurement gaps in the 100 TB pipeline:

* **Bloom n-gram decontamination audit** — the production pattern for
  benchmark decontamination at corpus scale is a Bloom filter over the
  eval set's n-grams shipped into every corpus-scan task (an exact
  semi-join of ALL corpus n-grams against the eval set shuffles the
  whole exploded corpus; the Bloom prefilter reduces that to the
  flagged ~fp+true fraction). ``text_decontaminate`` implements the
  exact join; this operator implements the Bloom stage with an
  oracle-reproducible md5 double-hash family and AUDITS it: flagged vs
  exact-hit instance counts, the realized false-positive load, and the
  no-false-negative invariant. The reusable ``bloom.py`` runtime-filter
  module uses the same bitmap layout with xxhash64 (exactness by
  construction); here the hash family itself must be replayable in SQL.
* **IVF nprobe recall curve** — ``ann_ivf`` fixes nprobe = 2; the
  operational question for an IVF index is how recall@k buys into
  probe depth. Because in-cell search is exact, a brute-force top-10
  member is found at probe depth p iff its cell ranks <= p among the
  query's nearest centroids — so ONE brute pass + ONE centroid ranking
  yields the whole curve without re-running the index per depth.

Registered in a new module (VERDICT r17 task #3: additions capped and
isolated so the driver window's 45 vintage-rotation slots survive —
3 re-fronts + these 2 = exactly the 5 non-rotation slots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_lever_spark.catalog import load_table
from spark_lever_spark.registry import register

# ---------------------------------------------------------------------------
# Bloom-prefiltered n-gram decontamination audit
# ---------------------------------------------------------------------------

_NGRAM = 5  # word n-gram width (long enough that cross-doc hits mean
# contamination, short enough that the synthetic corpus has real hits)
_BITS_PER_GRAM = 16  # m = 16 x distinct eval grams -> fill ~0.12 at
# k = 2, theoretical fp ~1.4 % at ANY corpus scale (m tracks the eval
# set, which is what a production decontamination filter sizes against)


def _md5_pos(col: Column, tag: str, m: Column) -> Column:
    """Deterministic Bloom probe position: 48-bit integer from a tagged
    md5 prefix, modulo the filter size. Identical in DuckDB as
    ``('0x' || substr(md5('tag:' || g), 1, 12))::BIGINT % m``."""
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit(tag + ":"), col), "UTF-8")), 1, 12
        ),
        16,
        10,
    ).cast("long") % m


def _word_ngrams(toks: Column, n: int) -> Column:
    """All word ``n``-grams of a token array, in position order (empty
    when the document is shorter than ``n`` tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "decontaminate_bloom_ngram_audit",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks, doc_id % 10 = 7 AS is_eval
  FROM documents
),
grams AS (
  SELECT doc_id, is_eval,
         array_to_string(toks[CAST(i AS BIGINT):CAST(i + {_NGRAM} - 1 AS BIGINT)],
                         ' ') AS g
  FROM d, LATERAL unnest(range(1, len(toks) - {_NGRAM} + 2)) t(i)
),
ev AS (SELECT DISTINCT g FROM grams WHERE is_eval),
m AS (SELECT {_BITS_PER_GRAM} * count(*) AS m FROM ev),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT ('0x' || substr(md5('b1:' || g), 1, 12))::BIGINT % m.m AS pos
    FROM ev, m
    UNION ALL
    SELECT ('0x' || substr(md5('b2:' || g), 1, 12))::BIGINT % m.m
    FROM ev, m
  )
),
corp AS (
  SELECT doc_id, g,
         ('0x' || substr(md5('b1:' || g), 1, 12))::BIGINT % m.m AS p1,
         ('0x' || substr(md5('b2:' || g), 1, 12))::BIGINT % m.m AS p2
  FROM grams, m WHERE NOT is_eval
),
probed AS (
  SELECT doc_id, g,
         (p1 IN (SELECT pos FROM bits)
          AND p2 IN (SELECT pos FROM bits)) AS flagged,
         g IN (SELECT g FROM ev) AS hit
  FROM corp
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_eval_grams,
  (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
  CAST(count(*) AS BIGINT) AS n_corpus_grams,
  CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true_hits,
  CAST(sum(CASE WHEN flagged AND NOT hit THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_pos,
  CAST(sum(CASE WHEN hit AND NOT flagged THEN 1 ELSE 0 END) AS BIGINT)
    AS n_missed,
  CAST(count(DISTINCT CASE WHEN flagged THEN doc_id END) AS BIGINT)
    AS n_docs_flagged,
  CAST(count(DISTINCT CASE WHEN hit THEN doc_id END) AS BIGINT)
    AS n_docs_contaminated
FROM probed
""",
    category="llm_curation",
)
def decontaminate_bloom_ngram_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audit of a Bloom-prefiltered n-gram decontamination pass.

    Eval split = ``doc_id % 10 == 7``; its distinct word 5-grams seed a
    Bloom filter (k = 2 md5-derived probes into m = 16 x |eval grams|
    bits — the md5 family, unlike the xxhash64 runtime filters in
    operators/bloom.py, is replayable in the DuckDB oracle). Every
    corpus (non-eval) n-gram instance is probed against the filter and
    ALSO exactly verified, yielding one audit row: filter size and set
    bits, flagged vs true-hit instance counts, realized false-positive
    load, the structurally-impossible miss count (always 0 — Bloom
    filters have no false negatives), and contaminated-document counts.

    Scale shapes: the filter is built by aggregating the EVAL side only
    (broadcast both as the bit table and as the exact-verify set — the
    eval set is the small side by construction, and m tracks IT, not
    the corpus, so the ~1.4 % theoretical fp rate holds at any corpus
    size); the corpus side is scanned once, probed and verified via
    broadcast joins with zero corpus-grain shuffle — the single output
    row comes from one map-side-combinable aggregation. In production
    the exact verify runs on the flagged ~1.5 % only; the audit
    verifies everything to measure what that shortcut would miss (0).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks"),
        (F.col("doc_id") % 10 == 7).alias("is_eval"),
    )
    grams = docs.select(
        "doc_id",
        "is_eval",
        F.explode(_word_ngrams(F.col("toks"), _NGRAM)).alias("g"),
    )
    ev = grams.filter("is_eval").select("g").distinct()
    m = ev.agg(
        (F.lit(_BITS_PER_GRAM) * F.count("*")).cast("long").alias("m")
    )
    bits = (
        ev.crossJoin(F.broadcast(m))
        .select(
            F.explode(
                F.array(
                    _md5_pos(F.col("g"), "b1", F.col("m")),
                    _md5_pos(F.col("g"), "b2", F.col("m")),
                )
            ).alias("pos")
        )
        .distinct()
    )
    corp = (
        grams.filter(~F.col("is_eval"))
        .crossJoin(F.broadcast(m))
        .select(
            "doc_id",
            "g",
            _md5_pos(F.col("g"), "b1", F.col("m")).alias("p1"),
            _md5_pos(F.col("g"), "b2", F.col("m")).alias("p2"),
        )
    )
    b1 = F.broadcast(bits.select(F.col("pos").alias("p1")).withColumn(
        "f1", F.lit(True)
    ))
    b2 = F.broadcast(bits.select(F.col("pos").alias("p2")).withColumn(
        "f2", F.lit(True)
    ))
    hits = F.broadcast(ev.select(F.col("g")).withColumn("h", F.lit(True)))
    probed = (
        corp.join(b1, "p1", "left")
        .join(b2, "p2", "left")
        .join(hits, "g", "left")
        .select(
            "doc_id",
            (F.coalesce("f1", F.lit(False)) & F.coalesce("f2", F.lit(False)))
            .alias("flagged"),
            F.coalesce("h", F.lit(False)).alias("hit"),
        )
    )
    agg = probed.agg(
        F.count("*").alias("n_corpus_grams"),
        F.sum(F.col("flagged").cast("long")).alias("n_flagged"),
        F.sum(F.col("hit").cast("long")).alias("n_true_hits"),
        F.sum((F.col("flagged") & ~F.col("hit")).cast("long")).alias(
            "n_false_pos"
        ),
        F.sum((F.col("hit") & ~F.col("flagged")).cast("long")).alias(
            "n_missed"
        ),
        F.countDistinct(
            F.when(F.col("flagged"), F.col("doc_id"))
        ).alias("n_docs_flagged"),
        F.countDistinct(F.when(F.col("hit"), F.col("doc_id"))).alias(
            "n_docs_contaminated"
        ),
    )
    return (
        ev.agg(F.count("*").alias("n_eval_grams"))
        .crossJoin(bits.agg(F.count("*").alias("n_bits_set")))
        .crossJoin(agg)
        .select(
            "n_eval_grams",
            "n_bits_set",
            "n_corpus_grams",
            "n_flagged",
            "n_true_hits",
            "n_false_pos",
            "n_missed",
            "n_docs_flagged",
            "n_docs_contaminated",
        )
    )


# ---------------------------------------------------------------------------
# IVF probe-depth recall curve
# ---------------------------------------------------------------------------

_NPROBES = (1, 2, 4, 8)
_N_QUERIES = 20
_TOPK = 10


@register(
    "ann_ivf_nprobe_recall_curve",
    oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
cents AS (
  SELECT label AS cell, list(m ORDER BY i) AS centroid
  FROM (
    SELECT label, i, AVG(val) AS m
    FROM (SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS val FROM e)
    GROUP BY label, i
  )
  GROUP BY label
),
cell_rank AS (
  SELECT q.qid, c.cell,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY ROUND(list_cosine_similarity(c.centroid, q.qv), 9) DESC,
                    c.cell) AS rk
  FROM cents c, qs q
),
brute AS (
  SELECT qid, vec_id, label FROM (
    SELECT q.qid, e.vec_id, e.label,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY ROUND(list_cosine_similarity(e.v, q.qv), 9) DESC,
                      e.vec_id) AS rn
    FROM e, qs q WHERE e.vec_id <> q.qid
  ) WHERE rn <= {_TOPK}
),
joined AS (
  SELECT b.qid, b.vec_id, cr.rk AS cell_rk
  FROM brute b JOIN cell_rank cr ON cr.qid = b.qid AND cr.cell = b.label
)
SELECT CAST(p.p AS BIGINT) AS nprobe,
       CAST((SELECT count(*) FROM qs) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN j.cell_rk <= p.p THEN 1 ELSE 0 END) AS BIGINT)
         AS n_found,
       round(sum(CASE WHEN j.cell_rk <= p.p THEN 1 ELSE 0 END)
             / ({_TOPK}.0 * (SELECT count(*) FROM qs)), 4) AS recall_at_10
FROM joined j, (SELECT unnest([{", ".join(str(p) for p in _NPROBES)}]) AS p) p
GROUP BY p.p
ORDER BY nprobe
""",
    category="llm_similarity",
)
def ann_ivf_nprobe_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@10 of IVF search as a function of probe depth, over a
    fixed panel of 20 query vectors (vec_id < 20).

    In-cell search is exact, so a brute-force top-10 member is
    retrieved at probe depth p iff its cell ranks <= p among the
    query's nearest centroids — one brute pass plus one centroid
    ranking yields the whole (nprobe -> recall) curve with no
    per-depth re-execution. Both rankings use the round(sim, 9) +
    id/cell tiebreak discipline of ann_ivf so the selections are
    stable across engines.

    Scale shapes: the centroid table (cells x dim) and the query panel
    (fixed Q rows) are both broadcast; the brute ground-truth pass is
    the audit's cost — O(Q x N) map-side with a per-query top-k
    (WindowGroupLimit keeps the shuffle at k rows per query, never the
    full Q x N cross) — and Q is FIXED, so the audit stays linear in
    the corpus at any scale. The production index answers queries from
    the probed cells only; this operator measures exactly what that
    truncation costs."""
    from pyspark.sql.window import Window

    from spark_lever_spark.llm.embeddings import cell_centroids
    from spark_lever_spark.llm.similarity import as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    qs = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    cents = cell_centroids(emb)
    wq = Window.partitionBy("qid")
    cell_rank = (
        cents.crossJoin(F.broadcast(qs))
        .select(
            "qid",
            "cell",
            F.row_number()
            .over(
                wq.orderBy(
                    F.desc(F.round(cosine(F.col("centroid"), F.col("qv")), 9)),
                    "cell",
                )
            )
            .alias("rk"),
        )
    )
    brute = (
        e.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "label",
            F.row_number()
            .over(
                wq.orderBy(
                    F.desc(F.round(cosine(F.col("v"), F.col("qv")), 9)),
                    "vec_id",
                )
            )
            .alias("rn"),
        )
        .filter(F.col("rn") <= _TOPK)
    )
    joined = (
        brute.alias("b")
        .join(
            cell_rank.alias("cr"),
            (F.col("b.qid") == F.col("cr.qid"))
            & (F.col("b.label") == F.col("cr.cell")),
        )
        .select(
            F.col("b.qid").alias("qid"),
            "vec_id",
            F.col("cr.rk").alias("cell_rk"),
        )
    )
    nq = qs.agg(F.count("*").alias("n_queries"))
    probes = F.explode(
        F.array(*[F.lit(p) for p in _NPROBES])
    ).alias("nprobe")
    return (
        joined.select("qid", "cell_rk", probes)
        .groupBy("nprobe")
        .agg(
            F.sum((F.col("cell_rk") <= F.col("nprobe")).cast("long")).alias(
                "n_found"
            )
        )
        .crossJoin(F.broadcast(nq))
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            F.col("n_queries").cast("long").alias("n_queries"),
            "n_found",
            F.round(
                F.col("n_found") / (float(_TOPK) * F.col("n_queries")), 4
            ).alias("recall_at_10"),
        )
        .orderBy("nprobe")
    )
