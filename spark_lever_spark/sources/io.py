"""Batch IO wrappers with scale-oriented defaults.

Parity map (reference file -> here):
- parquet read/write + pushdown + partition discovery
  (sql/core/.../parquet/newParquet.scala, ParquetFilters.scala)
  -> `read_parquet` / `write_partitioned` (pushdown automatic;
  asserted in tests/test_plans.py)
- JSON with schema inference by sampling (json/JsonRDD.scala)
  -> `read_json(sampling_ratio=...)`
- CSV/text via RDD textFile (§2.E I/O) -> `read_csv` / `read_text`
  (modern CSV source: header, inference, malformed-row modes)
- JDBC partitioned reads with predicate pushdown (jdbc/JDBCRDD.scala)
  -> `read_jdbc` (requires a driver jar at deploy time; import-gated)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan; pass `columns` to make pruning explicit at the API
    surface (Catalyst prunes through projections anyway)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sampling_ratio: float | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON source. Without `schema`, infers by sampling — the modern
    version of the reference's JsonRDD.inferSchema; ALWAYS pass an
    explicit schema at scale (inference is a full extra pass over
    100 TB)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = False,
    sep: str = ",",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV source; `mode` is the malformed-row policy
    (PERMISSIVE | DROPMALFORMED | FAILFAST)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_text(spark: SparkSession, path: str, whole_text: bool = False) -> DataFrame:
    return spark.read.option("wholetext", str(whole_text).lower()).text(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
    infer_schema: bool = True,
) -> DataFrame:
    """Native XML read (built into Spark 4's sql module; the reference
    predates any XML source — superset per SURVEY.md §2.G). Each
    element matching ``row_tag`` becomes one row; nested elements
    surface as structs. Supply ``schema`` in production — inference
    costs a full extra pass over the data, which at 100 TB is the
    difference between one scan and two."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", str(infer_schema).lower())
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Native XML write (Spark 4). One file per partition, each a
    well-formed document rooted at ``root_tag``."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC partitioned read (reference JDBCRDD.scala:
    stride-partitioned by `partition_column`, WHERE-clause pushdown).
    Exercised end-to-end in tests/test_jdbc.py against the embedded
    Derby engine in Spark's own jars — pushdown (`PushedFilters`),
    stride partitioning, and explicit per-partition predicates all
    verified in-container."""
    props = properties or {}
    if predicates:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    if partition_column is not None:
        if None in (lower_bound, upper_bound, num_partitions):
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    """Partitioned write (hive-style key=value dirs -> partition
    discovery + pruning on read). `max_records_per_file` bounds output
    file size at scale; on a real pipeline pair it with a pre-write
    repartition on the partition keys so each task writes few files
    (small-files problem)."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.save(path)
