"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; LSH-bucketed search is
the scale path (candidate set shrinks by ~bands/2^bits, verified for
recall in tests/test_llm_ann.py). Dot products run JVM-side via
higher-order array functions (zip_with + aggregate) in double
precision — no Python in the hot path; a vectorized pandas-UDF variant
exists in tests for comparison.

Scale notes (100 TB / billions of vectors):
- top-k against a single query broadcasts the query vector (literal) —
  the scan is embarrassingly parallel, the only shuffle is the final
  TakeOrdered over k rows per partition.
- similarity *join* prefilters by a blocking key (label here; LSH
  bucket in the hashed variant) so the pair count stays subquadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_lever_spark.catalog import load_table
from spark_lever_spark.registry import register


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def default_parallelism(df: DataFrame) -> int:
    """The session's target task parallelism (classic mode), falling
    back to the shuffle-partition conf under Spark Connect."""
    try:
        return df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext
        return int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin-repartition `df` up to the session's default
    parallelism when its scan is narrower — a thin alias for
    ``catalog.spread_scan`` (r19 consolidation: one helper, one cheap
    file-based width probe; VERDICT r18 task #6). At cluster scale a
    real corpus scans >= parallelism partitions and this is a no-op.
    Row-to-partition assignment is deterministic under retry
    (sort-before-repartition is on by default), and every caller's
    result is per-row deterministic regardless of partitioning."""
    from spark_lever_spark.catalog import spread_scan

    return spread_scan(df)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


@register(
    "knn_cosine_topk",
    oracle="""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS cos_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
""",
    category="llm_similarity",
    bench=True,
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vector 0 (exact ANN baseline).

    The 1-row query side is broadcast; ordering is a TakeOrdered top-k,
    not a full sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        as_double(F.col("embedding")).alias("qv")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(as_double(F.col("embedding")), F.col("qv")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


@register(
    "similarity_join_blocked",
    oracle="""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           WHERE vec_id < 150)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.8
ORDER BY id_a, id_b
""",
    category="llm_similarity",
)
def similarity_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine similarity join with label blocking (the exact
    form of an embedding near-dup stage; LSH bucketing replaces the
    label key at scale)."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 150)
        .select("vec_id", "label", as_double(F.col("embedding")).alias("v"))
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cs = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cs >= 0.8)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.label").alias("label"),
            F.round(cs, 6).alias("cos_sim"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "embedding_norm_stats",
    oracle="""
SELECT label, count(*) AS n,
       round(avg(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))), 6)
           AS avg_norm,
       round(avg(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')
                 / len(embedding)), 6) AS avg_mean_component
FROM embeddings
GROUP BY label
ORDER BY label
""",
    category="llm_similarity",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column statistics (norms, component means) per label —
    the sanity profile every embedding pipeline runs before indexing."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    return (
        emb.select(
            "label",
            l2_norm(v).alias("norm"),
            (
                F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
                / F.size("embedding")
            ).alias("mean_comp"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.avg("mean_comp"), 6).alias("avg_mean_component"),
        )
        .orderBy("label")
    )


def hyperplane_signs(nbits: int, dim: int) -> list[list[float]]:
    """The deterministic +-1 hyperplane family: component i of plane j
    is +1 iff the first hex digit of md5("{j}_{i}") is even — the same
    function the DuckDB oracle evaluates in SQL.  Computed ONCE on the
    driver (nbits x dim tiny table) instead of per row: the executors
    then do pure dot products against literal arrays, which removes
    nbits x dim md5/conv/substring evaluations from every row (the
    dominant cost at any scale) without changing a single output bit.
    """
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(nbits)
    ]



@register(
    "ann_lsh_hyperplane",
    bench=True,
    # The hyperplane family is md5-parity-derived, so the bucket
    # assignment is fully deterministic and DuckDB can recompute the
    # identical histogram (instr over the hex alphabet = the parity of
    # Spark's conv(substring(md5..)) % 2).
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
comps AS (
  SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS val FROM e
),
proj AS (
  SELECT c.vec_id, p.j,
         SUM(CASE WHEN (instr('0123456789abcdef',
                              substr(md5(concat(CAST(p.j AS VARCHAR), '_',
                                                CAST(c.i AS VARCHAR))), 1, 1))
                        - 1) % 2 = 0
                  THEN c.val ELSE -c.val END) AS s
  FROM comps c, (SELECT unnest(range(16)) AS j) p
  GROUP BY c.vec_id, p.j
),
sig AS (
  SELECT vec_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j)
           AS bucket
  FROM proj GROUP BY vec_id
)
SELECT bucket, COUNT(*) AS n_vectors
FROM sig GROUP BY bucket
ORDER BY n_vectors DESC, bucket
""",
    category="llm_similarity",
)
def ann_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH (16-bit signatures) bucket histogram.

    Hyperplane h_j component i = deterministic pseudo-random +-1 from
    md5(j,i) parity — reproducible across runs with no stored model.
    Query-side use: hash the query with the same planes, probe its
    bucket (plus neighbors at hamming<=1) instead of scanning all rows.

    Sign application is a conditional negate (not a multiply) and the
    fold order is element order, so the per-plane sums are bit-identical
    to evaluating the md5 inline — the form the oracle uses and the one
    this query shipped with through round 5.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    nbits = 16
    v = as_double(F.col("embedding"))

    # Fixed-dim contract (TESTDATA.md: embeddings are constant-length);
    # a LIMIT-1 probe reads one row, which stays O(1) at any scale.
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = first["d"] if first else 0
    planes = hyperplane_signs(nbits, dim)

    def plane_sign(j: int) -> Column:
        signs = F.array(*[F.lit(s) for s in planes[j]])
        return F.aggregate(
            F.zip_with(v, signs, lambda x, s: F.when(s > 0, x).otherwise(-x)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig = emb.select(
        "vec_id",
        "label",
        F.concat(
            *[
                F.when(plane_sign(j) > 0, F.lit("1")).otherwise(F.lit("0"))
                for j in range(nbits)
            ]
        ).alias("bucket"),
    )
    return (
        sig.groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy(F.desc("n_vectors"), "bucket")
    )


@register(
    "embedding_dominant_dims",
    oracle="""
WITH comps AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings WHERE vec_id < 50
),
ranked AS (
  SELECT vec_id, label, CAST(dim AS INT) AS dim,
         round(x * 1000000) / 1000000 AS x,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY abs(x) DESC, dim) AS rk
  FROM comps
)
SELECT vec_id, label, CAST(rk AS INT) AS rk, dim, x
FROM ranked WHERE rk <= 3
ORDER BY vec_id, rk
""",
    category="llm_similarity",
)
def embedding_dominant_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant dimensions per embedding: the 3 largest-|x| components
    of each vector — the interpretability probe for which axes carry a
    vector's signal (and the primitive behind sparse top-k projection
    compression). posexplode keeps the dim index; the per-vector rank
    is a WindowGroupLimit top-k, so the shuffle carries 3 rows per
    vector, not 64."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    comps = emb.select(
        "vec_id",
        "label",
        F.posexplode(as_double(F.col("embedding"))).alias("dim", "x"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc(F.abs("x")), "dim")
    return (
        comps.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "vec_id",
            "label",
            "rk",
            "dim",
            (F.round(F.col("x") * 1000000) / 1000000).alias("x"),
        )
        .orderBy("vec_id", "rk")
    )
