"""Composed training-data pipeline (SURVEY.md §7 P5 `quality_filter`
composition): the capstone query chaining the standalone LLM stages —

  documents -> quality gate (length/avg-token-len) -> exact dedup
  (normalized fingerprint, keep lowest doc_id) -> corpus stats per
  (lang, source)

Every stage is the same code path a 100 TB corpus build would run:
built-in expressions only, one shuffle for the dedup (on the 128-bit
fingerprint, never the text), one for the final rollup. Document counts
and token totals survive as exact integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_lever_spark.catalog import load_table
from spark_lever_spark.llm.dedup import content_fingerprint, normalized_text
from spark_lever_spark.llm.textstats import token_count
from spark_lever_spark.registry import register


def quality_gate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The boolean quality filter from text_quality_scores as a
    standalone stage: >=10 tokens and mean token length < 12 chars."""
    n_tok = token_count(F.col(text_col))
    n_ch = F.length(text_col)
    return docs.filter(
        n_tok.between(10, 100000) & (n_ch.cast("double") / n_tok < 12)
    )


def dedup_keep_first(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest-doc_id representative of each normalized
    fingerprint (the exact-dedup stage as a row filter, not a rollup)."""
    fp = content_fingerprint(normalized_text(F.col(text_col)))
    ranked = docs.withColumn("__fp__", fp).withColumn(
        "__keep__", F.min("doc_id").over(Window.partitionBy("__fp__"))
    )
    return ranked.filter(F.col("doc_id") == F.col("__keep__")).drop(
        "__fp__", "__keep__"
    )


@register(
    "pipeline_quality_dedup_stats",
    oracle="""
WITH gated AS (
  SELECT *, len(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))
            AS n_tok
  FROM documents
  WHERE len(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))
          BETWEEN 10 AND 100000
    AND CAST(length(text) AS DOUBLE)
        / len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) < 12
),
kept AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (
        PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      ) AS keep_id
    FROM gated
  ) WHERE doc_id = keep_id
)
SELECT lang, source,
       COUNT(*) AS docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM kept
GROUP BY lang, source
ORDER BY lang, source
""",
    category="llm_pipeline",
    bench=True,
)
def pipeline_quality_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality gate -> dedup-keep-first -> per-(lang, source) corpus
    stats. The end-to-end composition every stage was built for.

    Shuffle-payload discipline: the fingerprint and token count are
    computed ONCE in the map stage and `text` is projected away BEFORE
    the dedup window — the fp-partitioned shuffle then carries ~50
    bytes/row (ids + fp + small dims) instead of the document body.
    (The earlier form kept `text` through the window: the shuffle key
    was the digest but the payload was the corpus — exactly the
    mistake the dedup modules' "shuffle digests, not text" rule
    exists to prevent. At 100 TB that is the whole job's bytes.)"""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = token_count(F.col("text"))
    n_ch = F.length("text")
    slim = docs.select(
        "doc_id",
        "lang",
        "source",
        n_tok.alias("n_tok"),
        (n_tok.between(10, 100000) & (n_ch.cast("double") / n_tok < 12)).alias(
            "passes"
        ),
        content_fingerprint(normalized_text(F.col("text"))).alias("fp"),
    ).filter(F.col("passes"))
    kept = (
        slim.withColumn(
            "keep_id", F.min("doc_id").over(Window.partitionBy("fp"))
        )
        .filter(F.col("doc_id") == F.col("keep_id"))
    )
    return (
        kept.groupBy("lang", "source")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.col("n_tok").cast("long")).alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang", "source")
    )
