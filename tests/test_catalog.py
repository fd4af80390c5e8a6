"""Catalog surface: saveAsTable / INSERT INTO / catalog listing —
the reference's registerTempTable + saveAsTable + INSERT INTO|OVERWRITE
dialect (DataFrame.scala:910-1034, SqlParser INSERT) maps to the
modern catalog + spark.sql."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def managed_table(spark):
    name = "t_catalog_check"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_save_as_table_insert_overwrite_roundtrip(spark, managed_table):
    name = managed_table
    spark.range(0, 5).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.saveAsTable(name)
    assert spark.table(name).count() == 5

    # INSERT INTO appends through the SQL dialect
    spark.sql(f"INSERT INTO {name} SELECT 100 AS id, 200 AS v")
    assert spark.table(name).count() == 6
    assert spark.sql(
        f"SELECT v FROM {name} WHERE id = 100"
    ).collect()[0][0] == 200

    # INSERT OVERWRITE replaces contents
    spark.sql(f"INSERT OVERWRITE TABLE {name} SELECT 1 AS id, 1 AS v")
    assert spark.table(name).count() == 1

    # catalog sees the managed table
    assert name in [t.name for t in spark.catalog.listTables()]


def test_temp_view_shadows_and_drops(spark):
    spark.range(0, 3).createOrReplaceTempView("t_view_check")
    assert spark.sql("SELECT COUNT(*) FROM t_view_check").collect()[0][0] == 3
    spark.catalog.dropTempView("t_view_check")
    assert "t_view_check" not in [t.name for t in spark.catalog.listTables()]
