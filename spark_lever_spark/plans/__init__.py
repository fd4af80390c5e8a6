"""Physical-plan inspection (SURVEY.md §4).

The reference hand-built its physical layer (Exchange.scala,
SparkStrategies.scala, ParquetFilters.scala); this engine delegates all
of it to Catalyst — so our obligation shifts from *implementing* those
mechanics to *asserting they engaged*: filters pushed to the scan,
columns pruned, small dims broadcast, no redundant shuffles, operators
inside whole-stage codegen. These helpers parse `explain("formatted")`
output so tests (tests/test_plans.py) can pin the plan shape that must
survive a 100 TB scale-up.
"""

from spark_lever_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    formatted_plan,
    nested_loop_join_count,
    pushed_filters,
    scan_read_schema,
    shuffle_join_count,
    wholestage_codegen_count,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "formatted_plan",
    "nested_loop_join_count",
    "pushed_filters",
    "scan_read_schema",
    "shuffle_join_count",
    "wholestage_codegen_count",
]
