"""Batch sources/sinks (SURVEY.md §2.G).

The reference's data-source layer (ParquetRelation/newParquet.scala,
JSONRelation + JsonRDD schema inference, JDBCRDD partitioned reads,
sources/interfaces.scala pushdown traits) maps 1:1 onto modern
`spark.read`/`spark.write` — the engineering left to us is the wrapper
surface, sane defaults, and tests proving pushdown/pruning/partition
discovery actually engage (tests/test_sources.py, tests/test_plans.py).
"""

from spark_lever_spark.sources.io import (
    read_csv,
    read_jdbc,
    read_json,
    read_parquet,
    read_text,
    read_xml,
    write_partitioned,
    write_xml,
)

__all__ = [
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_parquet",
    "read_text",
    "read_xml",
    "write_partitioned",
    "write_xml",
]
