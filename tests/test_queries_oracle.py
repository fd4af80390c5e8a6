"""t2-style correctness: every registered query with an oracle must
hash-match DuckDB at sf0.001 (fast) — the driver re-runs the same
contract at sf0.01. Rows-only queries are smoke-checked for schema
stability and >=0 rows.
"""

from __future__ import annotations

import pytest

from spark_lever_spark import registry

ALL = registry.all_queries()
WITH_ORACLE = sorted(n for n, q in ALL.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in ALL.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    from tests.oracle import check_query

    check_query(spark, sf_dir, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = ALL[name].fn(spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
