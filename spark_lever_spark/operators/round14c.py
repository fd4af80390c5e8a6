"""Round-14 second-wave operator additions (session 2).

Families this module adds (SURVEY.md §2 growth areas):

- the portfolio-risk ratio family on the daily revenue series
  (Sortino, historical VaR/CVaR, Omega, Calmar, Kelly fraction),
- two-series risk diagnostics of the orders series against the
  shipped-lineitem "market" series (beta + information ratio,
  up/down capture ratios).

Every query follows the exact-arithmetic oracle doctrine
(spark_lever_spark/functions/exact.py): int64 cents, HUGEINT ⟷
decimal(38,0) moments, SIGN-SPLIT scaled floor-divisions (Spark div
truncates, DuckDB // floors — magnitudes divided, sign reapplied,
identical in both engines), doubles only as one conversion of an
exact integer + one correctly-rounded sqrt/division + one floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_lever_spark.catalog import load_table
from spark_lever_spark.operators.round14 import (
    _DAILY_ORDERS_CTE,
    _daily_orders,
)
from spark_lever_spark.registry import register

_DEC = "decimal(38,0)"

# Daily returns of the orders series: first differences on the
# calendar-day grid (same base as rolling_sharpe_14d_daily).
_DAILY_RET_CTE = _DAILY_ORDERS_CTE + """,
ret AS (
  SELECT x, v, v - LAG(v) OVER (ORDER BY x) AS r FROM daily
)
"""


def _daily_ret(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_orders(spark, sf_dir)
    return daily.withColumn(
        "r", F.col("v") - F.lag("v").over(Window.orderBy("x"))
    )


def _ss_div(num: str, den: str, scale: int) -> str:
    """SIGN-SPLIT scaled integer division, one SQL text valid in BOTH
    dialects via the {I} placeholder (HUGEINT / decimal(38,0)) and the
    {D} placeholder (// / div): magnitude is floor-divided, the sign
    reapplied — Spark div truncates while DuckDB // floors, so the two
    only agree on non-negative numerators (the CCI doctrine)."""
    return (
        f"CASE WHEN ({num}) >= 0"
        f" THEN CAST(CAST(({num}) AS {{I}}) * {scale} {{D}} ({den})"
        f" AS BIGINT)"
        f" ELSE -CAST(CAST(-({num}) AS {{I}}) * {scale} {{D}} ({den})"
        f" AS BIGINT) END"
    )


def _duck(expr: str) -> str:
    return expr.format(I="HUGEINT", D="//")


def _spark(expr: str) -> str:
    return expr.format(I="DECIMAL(38,0)", D="div")


# ---------------------------------------------------------------------------
# Single-series risk ratios
# ---------------------------------------------------------------------------

_SORTINO_SEL = (
    "CASE WHEN dq > 0 THEN CAST(floor(CAST(s AS DOUBLE) * 1000"
    " / sqrt(CAST(CAST(n AS {I}) * dq AS DOUBLE))) AS BIGINT) END"
)


@register(
    "sortino_ratio_daily",
    oracle="""
WITH
""" + _DAILY_RET_CTE + """,
m AS (
  SELECT CAST(count(r) AS BIGINT) AS n,
         CAST(SUM(r) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down,
         CAST(SUM(CASE WHEN r < 0 THEN CAST(r AS HUGEINT) * r
                       ELSE 0 END) AS HUGEINT) AS dq
  FROM ret WHERE r IS NOT NULL
)
SELECT n, s AS sum_ret_cents, n_down,
       """ + _duck(_SORTINO_SEL) + """ AS sortino_milli
FROM m
""",
    category="temporal",
    tags=("defer-window2",),
)
def sortino_ratio_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORTINO RATIO (zero MAR) of daily revenue changes — the
    downside-only complement to rolling_sharpe_14d_daily: penalize
    only harmful volatility (downside deviation √(Σ min(r,0)²/n)),
    so a series that only ever jumps UP is not punished for it. The
    same algebraic collapse as Sharpe applies: mean/ddev =
    (S/n)/√(D/n) = S/√(n·D) — the n cancels, leaving ONE
    int→double conversion of each exact integer, one correctly-
    rounded sqrt, one division, one floor onto the milli grid.
    Downside second moment D is exact HUGEINT ⟷ decimal(38,0);
    an all-up series (D = 0) yields NULL via the same CASE. Scale:
    one daily rollup, one lag window, one 1-row moment reduce."""
    ret = _daily_ret(spark, sf_dir).filter(F.col("r").isNotNull())
    m = ret.agg(
        F.count("r").alias("n"),
        F.sum("r").alias("s"),
        F.sum(F.when(F.col("r") < 0, 1).otherwise(0)).alias("n_down"),
        F.sum(
            F.when(
                F.col("r") < 0, F.col("r").cast(_DEC) * F.col("r")
            ).otherwise(F.lit(0).cast(_DEC))
        ).alias("dq"),
    )
    return m.selectExpr(
        "n",
        "s AS sum_ret_cents",
        "n_down",
        _spark(_SORTINO_SEL) + " AS sortino_milli",
    )


_CVAR_SEL = _ss_div("ts", "tn", 1000)


@register(
    "var_cvar_daily",
    oracle="""
WITH
""" + _DAILY_RET_CTE + """,
rk AS (
  SELECT x, r, row_number() OVER (ORDER BY r, x) AS rn
  FROM ret WHERE r IS NOT NULL
),
k AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST((count(*) + 19) // 20 AS BIGINT) AS k
  FROM rk
),
t AS (
  SELECT k.n, k.k,
         CAST(max(CASE WHEN rk.rn = k.k THEN rk.r END) AS BIGINT)
             AS var95,
         CAST(SUM(CASE WHEN rk.rn <= k.k THEN rk.r ELSE 0 END)
              AS BIGINT) AS ts,
         CAST(SUM(CASE WHEN rk.rn <= k.k THEN 1 ELSE 0 END)
              AS BIGINT) AS tn
  FROM rk, k GROUP BY k.n, k.k
)
SELECT n, k, var95 AS var95_cents, ts AS tail_sum_cents, tn AS n_tail,
       """ + _duck(_CVAR_SEL) + """ AS cvar_milli
FROM t
""",
    category="temporal",
    tags=("defer-window2",),
)
def var_cvar_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTORICAL VaR(95) / CVaR(95) of daily revenue changes — the
    tail-risk pair every risk desk reads first: VaR is the k-th
    smallest return with k = ⌈n/20⌉ (the exact empirical 5th
    percentile, integer ceiling (n+19)//20 — no interpolation, so
    the published number IS an observed return), CVaR (expected
    shortfall) the mean of the k tail returns. Order statistics come
    from one deterministic rank window (return, day tie-break); the
    tail mean is published on the milli grid via the SIGN-SPLIT
    floor (tail sums are negative in any real series). Scale:
    calendar-bounded day domain — one rollup, one rank window, one
    1-row reduce."""
    ret = _daily_ret(spark, sf_dir).filter(F.col("r").isNotNull())
    rk = ret.select(
        "x", "r", F.row_number().over(Window.orderBy("r", "x")).alias("rn")
    )
    t = rk.agg(
        F.count("*").alias("n"),
        F.expr("CAST((count(*) + 19) div 20 AS BIGINT)").alias("k"),
    ).crossJoin(rk.select("rn", "r")).groupBy("n", "k").agg(
        F.max(F.when(F.col("rn") == F.col("k"), F.col("r"))).alias(
            "var95"
        ),
        F.sum(
            F.when(F.col("rn") <= F.col("k"), F.col("r")).otherwise(0)
        ).alias("ts"),
        F.sum(
            F.when(F.col("rn") <= F.col("k"), 1).otherwise(0)
        ).alias("tn"),
    )
    return t.selectExpr(
        "n",
        "k",
        "var95 AS var95_cents",
        "ts AS tail_sum_cents",
        "tn AS n_tail",
        _spark(_CVAR_SEL) + " AS cvar_milli",
    )


@register(
    "omega_ratio_daily",
    oracle="""
WITH
""" + _DAILY_RET_CTE + """,
m AS (
  SELECT CAST(count(r) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN r > 0 THEN r ELSE 0 END) AS BIGINT)
             AS gains,
         CAST(SUM(CASE WHEN r < 0 THEN -r ELSE 0 END) AS BIGINT)
             AS losses
  FROM ret WHERE r IS NOT NULL
)
SELECT n, gains AS gains_cents, losses AS losses_cents,
       CASE WHEN losses > 0
            THEN CAST(CAST(gains AS HUGEINT) * 1000000 // losses
                      AS BIGINT) END AS omega_ppm
FROM m
""",
    category="temporal",
    tags=("defer-window2",),
)
def omega_ratio_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OMEGA RATIO (threshold 0) of daily revenue changes — the
    distribution-free gain/loss ratio Ω = Σ max(r,0) / Σ max(−r,0):
    unlike Sharpe/Sortino it uses the WHOLE distribution with no
    moment assumption (Keating & Shadwick's "universal performance
    measure"). Both partial sums are exact int64 cents; the ratio is
    ONE non-negative ppm floor-division (both sums ≥ 0 by
    construction, so Spark div and DuckDB // agree without the
    sign split); an all-up series (losses = 0) yields NULL via the
    same CASE. Scale: one rollup, one lag window, one 1-row
    reduce."""
    ret = _daily_ret(spark, sf_dir).filter(F.col("r").isNotNull())
    m = ret.agg(
        F.count("r").alias("n"),
        F.sum(F.when(F.col("r") > 0, F.col("r")).otherwise(0)).alias(
            "gains"
        ),
        F.sum(F.when(F.col("r") < 0, -F.col("r")).otherwise(0)).alias(
            "losses"
        ),
    )
    return m.selectExpr(
        "n",
        "gains AS gains_cents",
        "losses AS losses_cents",
        "CASE WHEN losses > 0 THEN"
        " CAST(CAST(gains AS DECIMAL(38,0)) * 1000000 div losses"
        " AS BIGINT) END AS omega_ppm",
    )


_CALMAR_SEL = _ss_div("vn - v1", "mdd", 1000000)


@register(
    "calmar_ratio_daily",
    oracle="""
WITH
""" + _DAILY_ORDERS_CTE + """,
pm AS (
  SELECT x, v,
         MAX(v) OVER (ORDER BY x) AS peak,
         row_number() OVER (ORDER BY x) AS ra,
         row_number() OVER (ORDER BY x DESC) AS rd
  FROM daily
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(MAX(peak - v) AS BIGINT) AS mdd,
         CAST(max(CASE WHEN ra = 1 THEN v END) AS BIGINT) AS v1,
         CAST(max(CASE WHEN rd = 1 THEN v END) AS BIGINT) AS vn
  FROM pm
)
SELECT n, vn - v1 AS total_gain_cents, mdd AS max_drawdown_cents,
       CASE WHEN mdd > 0 THEN """ + _duck(_CALMAR_SEL) + """
       END AS calmar_ppm
FROM m
""",
    category="temporal",
    tags=("defer-window2",),
)
def calmar_ratio_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALMAR RATIO of the daily revenue level series — total gain
    over maximum drawdown, the "return per unit of worst pain"
    companion to max_drawdown_daily_value (which publishes the
    drawdown alone): the running peak is one prefix-max window, the
    drawdown its gap to the current level, first/last levels come
    from two deterministic rank windows. All integers are exact
    cents; the published ratio is the SIGN-SPLIT ppm floor-division
    (total gain may be negative); a series that never draws down
    (mdd = 0) yields NULL via the same CASE. Scale: one daily
    rollup + three windows over the calendar-bounded day domain."""
    daily = _daily_orders(spark, sf_dir)
    wl = Window.orderBy("x")
    pm = daily.select(
        "v",
        F.max("v").over(wl).alias("peak"),
        F.row_number().over(wl).alias("ra"),
        F.row_number().over(Window.orderBy(F.desc("x"))).alias("rd"),
    )
    m = pm.agg(
        F.count("*").alias("n"),
        F.max(F.col("peak") - F.col("v")).alias("mdd"),
        F.max(F.when(F.col("ra") == 1, F.col("v"))).alias("v1"),
        F.max(F.when(F.col("rd") == 1, F.col("v"))).alias("vn"),
    )
    return m.selectExpr(
        "n",
        "vn - v1 AS total_gain_cents",
        "mdd AS max_drawdown_cents",
        "CASE WHEN mdd > 0 THEN " + _spark(_CALMAR_SEL)
        + " END AS calmar_ppm",
    )


_KELLY_SEL = _ss_div(
    "CAST(w AS {I}) * (sw - sl)", "CAST(w + l AS {I}) * sw", 1000000
)


@register(
    "kelly_criterion_daily",
    oracle="""
WITH
""" + _DAILY_RET_CTE + """,
m AS (
  SELECT CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS w,
         CAST(SUM(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT) AS l,
         CAST(SUM(CASE WHEN r > 0 THEN r ELSE 0 END) AS BIGINT) AS sw,
         CAST(SUM(CASE WHEN r < 0 THEN -r ELSE 0 END) AS BIGINT) AS sl
  FROM ret WHERE r IS NOT NULL
)
SELECT w AS n_wins, l AS n_losses,
       sw AS sum_win_cents, sl AS sum_loss_cents,
       CASE WHEN w > 0 AND l > 0 AND sw > 0
            THEN """ + _duck(_KELLY_SEL) + """
       END AS kelly_ppm
FROM m
""",
    category="temporal",
    tags=("defer-window2",),
)
def kelly_criterion_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KELLY FRACTION of daily revenue changes — the optimal bet
    size f* = p − q/b with win probability p = W/(W+L), loss
    probability q, and payoff odds b = mean win / mean loss. The
    whole expression collapses to ONE exact rational: f* =
    W·(SW − SL) / ((W+L)·SW) (zero-change days are neither wins nor
    losses — the discrete-outcome Kelly convention, documented).
    Both products are HUGEINT ⟷ decimal(38,0); the published ppm is
    the SIGN-SPLIT floor (negative edge ⇒ negative Kelly). Degenerate
    series (no wins, no losses) yield NULL via the same CASE. Scale:
    one rollup, one lag window, one 1-row reduce."""
    ret = _daily_ret(spark, sf_dir).filter(F.col("r").isNotNull())
    m = ret.agg(
        F.sum(F.when(F.col("r") > 0, 1).otherwise(0)).alias("w"),
        F.sum(F.when(F.col("r") < 0, 1).otherwise(0)).alias("l"),
        F.sum(F.when(F.col("r") > 0, F.col("r")).otherwise(0)).alias(
            "sw"
        ),
        F.sum(F.when(F.col("r") < 0, -F.col("r")).otherwise(0)).alias(
            "sl"
        ),
    )
    return m.selectExpr(
        "w AS n_wins",
        "l AS n_losses",
        "sw AS sum_win_cents",
        "sl AS sum_loss_cents",
        "CASE WHEN w > 0 AND l > 0 AND sw > 0 THEN "
        + _spark(_KELLY_SEL) + " END AS kelly_ppm",
    )


# ---------------------------------------------------------------------------
# Two-series diagnostics: orders (portfolio) vs shipped lineitem (market)
# ---------------------------------------------------------------------------

# Joined daily grid of the two revenue series; returns are first
# differences along the JOINED grid (shared-day calendar, documented).
_TWO_SERIES_CTE = """
port AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS x,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS v
  FROM orders GROUP BY 1
),
mkt AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
             AS x,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS v
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT p.x, p.v AS pv, m.v AS mv
  FROM port p JOIN mkt m ON m.x = p.x
),
ret AS (
  SELECT x,
         pv - LAG(pv) OVER (ORDER BY x) AS rp,
         mv - LAG(mv) OVER (ORDER BY x) AS rm
  FROM j
)
"""


def _two_series_ret(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    port = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("x")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "pv"
        )
    )
    mkt = li.groupBy(
        F.datediff(
            F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("x")
    ).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * 100
            ).cast("long")
        ).alias("mv")
    )
    j = port.join(mkt, "x")
    wl = Window.orderBy("x")
    return j.select(
        "x",
        (F.col("pv") - F.lag("pv").over(wl)).alias("rp"),
        (F.col("mv") - F.lag("mv").over(wl)).alias("rm"),
    )


_BETA_SEL = (
    "CASE WHEN CAST(n AS {I}) * smm - CAST(sm AS {I}) * sm > 0"
    " THEN CAST(floor("
    "CAST(CAST(n AS {I}) * spm - CAST(sp AS {I}) * sm AS DOUBLE)"
    " * 1000000"
    " / CAST(CAST(n AS {I}) * smm - CAST(sm AS {I}) * sm AS DOUBLE)"
    ") AS BIGINT) END"
)
_IR_SEL = (
    "CASE WHEN CAST(n AS {I}) * qd - CAST(sd AS {I}) * sd > 0"
    " THEN CAST(floor(CAST(sd AS DOUBLE) * 1000"
    " / sqrt(CAST(CAST(n AS {I}) * qd - CAST(sd AS {I}) * sd"
    " AS DOUBLE))) AS BIGINT) END"
)


@register(
    "beta_information_ratio_daily",
    oracle="""
WITH
""" + _TWO_SERIES_CTE + """,
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(rp) AS BIGINT) AS sp,
         CAST(SUM(rm) AS BIGINT) AS sm,
         CAST(SUM(CAST(rm AS HUGEINT) * rm) AS HUGEINT) AS smm,
         CAST(SUM(CAST(rp AS HUGEINT) * rm) AS HUGEINT) AS spm,
         CAST(SUM(rp - rm) AS BIGINT) AS sd,
         CAST(SUM(CAST(rp - rm AS HUGEINT) * (rp - rm)) AS HUGEINT)
             AS qd
  FROM ret WHERE rp IS NOT NULL AND rm IS NOT NULL
)
SELECT n, sp AS sum_port_cents, sm AS sum_mkt_cents,
       """ + _duck(_BETA_SEL) + """ AS beta_ppm,
       """ + _duck(_IR_SEL) + """ AS info_ratio_milli
FROM m
""",
    category="temporal",
    tags=("defer-window2",),
)
def beta_information_ratio_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BETA + INFORMATION RATIO of the orders series against the
    shipped-lineitem "market" series on their shared daily grid —
    the two-series regression diagnostics that complete the
    risk-ratio family: β = cov(rp,rm)/var(rm) via the standard
    moment collapse n·Σxy − ΣxΣy over n·Σx² − (Σx)² (both exact
    HUGEINT ⟷ decimal(38,0); ONE double division of the two exact
    integers, floored to ppm), and IR = mean(d)/sd(d) on the active
    difference d = rp − rm, which collapses to Σd/√(n·Σd² − (Σd)²)
    exactly like rolling_sharpe (the n cancels). Zero market
    variance / zero tracking error degrade to NULL via the same
    CASE in both engines. Scale: two map-side daily rollups, one
    day-grain equi-join, one lag window, one 1-row reduce."""
    ret = _two_series_ret(spark, sf_dir).filter(
        F.col("rp").isNotNull() & F.col("rm").isNotNull()
    )
    d = F.col("rp") - F.col("rm")
    m = ret.agg(
        F.count("*").alias("n"),
        F.sum("rp").alias("sp"),
        F.sum("rm").alias("sm"),
        F.sum(F.col("rm").cast(_DEC) * F.col("rm")).alias("smm"),
        F.sum(F.col("rp").cast(_DEC) * F.col("rm")).alias("spm"),
        F.sum(d).alias("sd"),
        F.sum(d.cast(_DEC) * d).alias("qd"),
    )
    return m.selectExpr(
        "n",
        "sp AS sum_port_cents",
        "sm AS sum_mkt_cents",
        _spark(_BETA_SEL) + " AS beta_ppm",
        _spark(_IR_SEL) + " AS info_ratio_milli",
    )


_UPCAP_SEL = _ss_div("pu", "mu", 1000000)
_DOWNCAP_SEL = _ss_div("-pd", "-md", 1000000)


@register(
    "capture_ratios_daily",
    oracle="""
WITH
""" + _TWO_SERIES_CTE + """,
m AS (
  SELECT CAST(SUM(CASE WHEN rm > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_up,
         CAST(SUM(CASE WHEN rm < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down,
         CAST(SUM(CASE WHEN rm > 0 THEN rp ELSE 0 END) AS BIGINT)
             AS pu,
         CAST(SUM(CASE WHEN rm > 0 THEN rm ELSE 0 END) AS BIGINT)
             AS mu,
         CAST(SUM(CASE WHEN rm < 0 THEN rp ELSE 0 END) AS BIGINT)
             AS pd,
         CAST(SUM(CASE WHEN rm < 0 THEN rm ELSE 0 END) AS BIGINT)
             AS md
  FROM ret WHERE rp IS NOT NULL AND rm IS NOT NULL
)
SELECT n_up, n_down,
       pu AS port_up_cents, mu AS mkt_up_cents,
       pd AS port_down_cents, md AS mkt_down_cents,
       CASE WHEN mu > 0 THEN """ + _duck(_UPCAP_SEL) + """
       END AS up_capture_ppm,
       CASE WHEN md < 0 THEN """ + _duck(_DOWNCAP_SEL) + """
       END AS down_capture_ppm
FROM m
""",
    category="temporal",
    tags=("defer-window2",),
)
def capture_ratios_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UP/DOWN CAPTURE RATIOS of the orders series against the
    shipped-lineitem market on their shared daily grid — how much of
    the market's up-moves (and down-moves) the portfolio
    participates in: conditional sums of portfolio returns on
    market-up / market-down days over the matching market sums (the
    simple-sum discrete variant of the compounded textbook form,
    documented). All conditional sums are exact int64 cents; each
    ratio is one SIGN-SPLIT ppm floor-division (the down ratio is
    taken on negated magnitudes so the denominator is positive —
    down/down ⇒ positive capture, outperforming a falling market ⇒
    capture < 1). Degenerate one-sided series degrade to NULL via
    the same CASE. Scale: two daily rollups, one day-grain join,
    one lag window, one 1-row reduce."""
    ret = _two_series_ret(spark, sf_dir).filter(
        F.col("rp").isNotNull() & F.col("rm").isNotNull()
    )
    m = ret.agg(
        F.sum(F.when(F.col("rm") > 0, 1).otherwise(0)).alias("n_up"),
        F.sum(F.when(F.col("rm") < 0, 1).otherwise(0)).alias("n_down"),
        F.sum(F.when(F.col("rm") > 0, F.col("rp")).otherwise(0)).alias(
            "pu"
        ),
        F.sum(F.when(F.col("rm") > 0, F.col("rm")).otherwise(0)).alias(
            "mu"
        ),
        F.sum(F.when(F.col("rm") < 0, F.col("rp")).otherwise(0)).alias(
            "pd"
        ),
        F.sum(F.when(F.col("rm") < 0, F.col("rm")).otherwise(0)).alias(
            "md"
        ),
    )
    return m.selectExpr(
        "n_up",
        "n_down",
        "pu AS port_up_cents",
        "mu AS mkt_up_cents",
        "pd AS port_down_cents",
        "md AS mkt_down_cents",
        "CASE WHEN mu > 0 THEN " + _spark(_UPCAP_SEL)
        + " END AS up_capture_ppm",
        "CASE WHEN md < 0 THEN " + _spark(_DOWNCAP_SEL)
        + " END AS down_capture_ppm",
    )
