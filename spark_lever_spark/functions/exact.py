"""Exact / cross-engine-deterministic numeric helpers.

Motivation (learned the hard way, kept as doctrine):

1. Two-argument ``round(x, n)`` is NOT portable across engines. Spark
   rounds the decimal representation of the double (BigDecimal
   HALF_UP); DuckDB computes ``floor(x*10^n + 0.5)/10^n`` in floating
   point. On ``.xx5`` boundaries (which monetary grids hit
   constantly) they disagree.
2. Floating-point SUM is order-dependent; Spark's partial aggregation
   and DuckDB's sequential sum differ in the last ulps. If the exact
   result lies ON a rounding boundary (sums of price*discount products
   always can), the ulp decides the rounded digit.

Therefore:
- ``round_to(col, n)``: the explicit ``round(x*10^n)/10^n`` form.
  Single-arg round is half-away-from-zero in BOTH engines, so two
  engines agree whenever they hold bit-identical doubles — which they
  do for any expression built from identical scalar IEEE ops.
  Safe for: per-row arithmetic, divisions of exact integers, and sums
  whose exact value sits on a coarser grid than the rounding target.
- ``cents(col)``: lift a 2-decimal column to exact BIGINT cents
  (single-arg round of a per-row double — identical in both engines).
  Sums/products of cents are exact 64-bit integer arithmetic: no
  order-dependence at all. This is also the right 100 TB design: money
  as integers (or DECIMAL), never as accumulated doubles.

Every oracle SQL mirrors these with the same textual pattern
(``CAST(round(x*100) AS BIGINT)``, ``round(x*10000)/10000``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_to(col: Column, n: int) -> Column:
    """Cross-engine-safe fixed-point rounding: round(x*10^n)/10^n."""
    s = float(10**n)
    return F.round(col * s) / s


def cents(col: Column) -> Column:
    """Exact integer cents of a 2-decimal double column."""
    return F.round(col * 100).cast("long")


def sql_cents(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def sql_round_to(expr: str, n: int) -> str:
    s = 10**n
    return f"round(({expr}) * {s}) / {s}"
