"""Round-14 operator additions.

Families this module adds (SURVEY.md §2 growth areas):

- robust single-outlier / trend nonparametrics over the daily series
  (Grubbs, Cox-Stuart),
- the remaining classic technical-analysis indicators (Williams %R,
  Money Flow Index, CCI) on the exact-cents daily grid,
- serial-correlation diagnostics (Ljung-Box portmanteau,
  Lo-MacKinlay variance ratio),
- k-sample rank inference on blocked designs (Friedman, Jonckheere-
  Terpstra) and internal-consistency reliability (Cronbach's alpha),
- survival-curve comparison (two-group log-rank test),
- queueing metrics (M/M/1 steady-state from hourly arrival counts),
- audit/statistics utilities (Benford second-digit chi-square,
  power-of-two-bucket histogram quantile sketch),
- per-node clustering coefficients on the co-purchase graph,
- a REAL image-gradient (Sobel) energy pass over binary PGM payloads.

Every query follows the exact-arithmetic oracle doctrine
(spark_lever_spark/functions/exact.py): int64 cents, per-term
floor-divisions documented as discrete variants, no N-ary float sums,
transcendentals only as hard-coded rational literals shared verbatim
by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_lever_spark.catalog import load_table
from spark_lever_spark.registry import register

_DEC = "decimal(38,0)"

# Shared daily-revenue base: exact int64 cents per order day, day
# expressed as the epoch-day integer x (the max_drawdown idiom — day
# arithmetic without timestamp-dtype divergence between engines).
_DAILY_ORDERS_CTE = """
daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS x,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS v
  FROM orders GROUP BY 1
)
"""


def _daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "v"
            )
        )
        .select(
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("x"),
            "v",
        )
    )


@register(
    "grubbs_outlier_daily",
    oracle="""
WITH
""" + _DAILY_ORDERS_CTE + """,
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
  FROM daily
),
y AS (
  SELECT x, CAST(tot.n * v - tot.s AS BIGINT) AS yd, tot.n
  FROM daily CROSS JOIN tot
),
ss AS (
  SELECT CAST(SUM(CAST(yd AS HUGEINT) * yd) AS HUGEINT) AS ssq FROM y
),
top AS (
  SELECT x, yd, n FROM (
    SELECT x, yd, n,
           row_number() OVER (ORDER BY abs(yd) DESC, x) AS rn
    FROM y
  ) WHERE rn = 1
)
SELECT top.x AS outlier_x, top.n, CAST(abs(top.yd) AS BIGINT) AS dev_n,
       CASE WHEN ss.ssq > 0 AND top.n >= 3
                 AND CAST(top.yd AS DOUBLE) * CAST(top.yd AS DOUBLE)
                     * CAST(top.n AS DOUBLE) < 1e31
            THEN CAST((top.n - 1) * CAST(top.yd AS HUGEINT) * top.yd
                      * 1000000 // ss.ssq AS BIGINT)
       END AS g2_ppm
FROM top CROSS JOIN ss
""",
    category="temporal",
    tags=("defer-window2",),
)
def grubbs_outlier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRUBBS single-outlier test on daily order revenue — the
    maximum-studentized-deviation screen (ESD family) that asks
    whether the MOST extreme day is too extreme for a normal sample:
    G = max|x − x̄|/s. Published as G² in exact arithmetic (G² is a
    monotone transform, the mahalanobis/roc doctrine): with the
    n-scaled deviation y = n·x − S (exact int64 — the calendar bounds
    n, so y never outgrows int64 even at 100 TB), G² =
    (n−1)·y_max²/Σy², one ppm floor-division of exact integers.
    Deterministic argmax tie-break (|y| desc, day asc). The anova_f
    magnitude guard (y²·n < 10³¹ in IEEE doubles) degrades to NULL
    identically in both engines past decimal(38,0)/HUGEINT headroom.
    Scale: one map-side-combinable daily rollup (the day domain is
    calendar-bounded), one 1-row moment aggregate, 1-row output."""
    daily = _daily_orders(spark, sf_dir)
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    y = daily.crossJoin(F.broadcast(tot)).select(
        "x", (F.col("n") * F.col("v") - F.col("s")).alias("yd"), "n"
    )
    ss = y.agg(
        F.sum(F.col("yd").cast(_DEC) * F.col("yd")).alias("ssq")
    )
    top = (
        y.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.abs("yd").desc(), "x")),
        )
        .filter(F.col("rn") == 1)
        .select("x", "yd", "n")
    )
    return top.crossJoin(F.broadcast(ss)).select(
        F.col("x").alias("outlier_x"),
        "n",
        F.abs("yd").alias("dev_n"),
        F.expr(
            f"CASE WHEN ssq > 0 AND n >= 3"
            f" AND CAST(yd AS DOUBLE) * CAST(yd AS DOUBLE)"
            f" * CAST(n AS DOUBLE) < 1e31 THEN"
            f" CAST((n - 1) * CAST(yd AS {_DEC}) * yd * 1000000"
            f" div ssq AS BIGINT) END"
        ).alias("g2_ppm"),
    )


@register(
    "cox_stuart_trend_daily",
    oracle="""
WITH
""" + _DAILY_ORDERS_CTE + """,
idx AS (
  SELECT v, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS t,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM daily
),
pairs AS (
  SELECT a.v AS va, b.v AS vb
  FROM idx a JOIN idx b ON b.t = a.t + (a.n + 1) // 2
  WHERE a.t <= a.n - (a.n + 1) // 2
)
SELECT CAST(max(n) AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN vb > va THEN 1 ELSE 0 END) AS BIGINT)
           AS n_plus,
       CAST(SUM(CASE WHEN vb < va THEN 1 ELSE 0 END) AS BIGINT)
           AS n_minus
FROM pairs CROSS JOIN (SELECT max(n) AS n FROM idx)
""",
    category="temporal",
    tags=("defer-window2",),
)
def cox_stuart_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COX-STUART trend test on daily order revenue — the sign-test
    reduction for monotone trend (pair each day t with day
    t + ⌈n/2⌉ and count rises vs falls; under no trend the signs are
    Binomial(n_pairs, ½)): the distribution-free complement to
    mann_kendall (which weights every pair O(n²)) at O(n) pairs.
    Everything is exact integer counts — ties (equal cents) drop per
    the classic definition, published so the caller can binomial-test
    n_plus against n_pairs − ties. Scale: the day domain is
    calendar-bounded; one self-equi-join on the derived row index of
    the daily aggregate."""
    daily = _daily_orders(spark, sf_dir)
    idx = daily.select(
        "v",
        F.row_number().over(Window.orderBy("x")).cast("long").alias("t"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    a = idx.select(
        F.col("v").alias("va"),
        "t",
        "n",
        F.expr("(n + 1) div 2").alias("h"),
    ).filter(F.col("t") <= F.col("n") - F.col("h"))
    b = idx.select(F.col("v").alias("vb"), F.col("t").alias("tb"))
    pairs = a.join(b, F.col("tb") == F.col("t") + F.col("h"))
    return pairs.agg(
        F.max("n").alias("n_days"),
        F.count("*").alias("n_pairs"),
        F.sum(F.when(F.col("vb") > F.col("va"), 1).otherwise(0)).alias(
            "n_plus"
        ),
        F.sum(F.when(F.col("vb") < F.col("va"), 1).otherwise(0)).alias(
            "n_minus"
        ),
    )


@register(
    "williams_r_14_daily",
    oracle="""
WITH
""" + _DAILY_ORDERS_CTE + """,
w AS (
  SELECT x, v,
         CAST(max(v) OVER (ORDER BY x ROWS BETWEEN 13 PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS hh,
         CAST(min(v) OVER (ORDER BY x ROWS BETWEEN 13 PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS ll,
         count(*) OVER (ORDER BY x ROWS BETWEEN 13 PRECEDING
                        AND CURRENT ROW) AS cnt
  FROM daily
)
SELECT x, v, hh, ll,
       CASE WHEN hh > ll
            THEN CAST((hh - v) * 1000000 // (hh - ll) AS BIGINT)
       END AS wr_ppm
FROM w WHERE cnt = 14 ORDER BY x
""",
    category="temporal",
    tags=("defer-window2",),
)
def williams_r_14_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILLIAMS %R (14-period) over daily order revenue — the
    overbought/oversold oscillator (highest-high minus close over the
    14-period range; the stochastic oscillator's mirror, and this
    registry publishes both faces). Row-window variant (14 OBSERVED
    days — calendar gaps close up, the aroon/atr convention). All
    exact int64 cents; %R published as one ppm floor-division with
    the flat-window (hh = ll) degeneracy NULLed by the same CASE in
    both engines. Scale: one calendar-bounded daily rollup + one
    ordered window — no shuffle wider than the day domain."""
    daily = _daily_orders(spark, sf_dir)
    w = Window.orderBy("x").rowsBetween(-13, 0)
    frame = daily.select(
        "x",
        "v",
        F.max("v").over(w).alias("hh"),
        F.min("v").over(w).alias("ll"),
        F.count("*").over(w).alias("cnt"),
    )
    return (
        frame.filter(F.col("cnt") == 14)
        .select(
            "x",
            "v",
            "hh",
            "ll",
            F.expr(
                "CASE WHEN hh > ll THEN"
                " CAST((hh - v) * 1000000 div (hh - ll) AS BIGINT) END"
            ).alias("wr_ppm"),
        )
        .orderBy("x")
    )


@register(
    "mfi_14_daily",
    oracle="""
WITH
""" + _DAILY_ORDERS_CTE + """,
d AS (
  SELECT x, v, lag(v) OVER (ORDER BY x) AS pv FROM daily
),
fl AS (
  SELECT x,
         CASE WHEN v > pv THEN v ELSE 0 END AS pos,
         CASE WHEN v < pv THEN v ELSE 0 END AS neg,
         CASE WHEN pv IS NULL THEN 0 ELSE 1 END AS lv
  FROM d
),
w AS (
  SELECT x,
         CAST(SUM(pos) OVER (ORDER BY x ROWS BETWEEN 13 PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS psum,
         CAST(SUM(neg) OVER (ORDER BY x ROWS BETWEEN 13 PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS nsum,
         CAST(SUM(lv) OVER (ORDER BY x ROWS BETWEEN 13 PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS nvalid
  FROM fl
)
SELECT x, psum AS pos_flow_cents, nsum AS neg_flow_cents,
       CASE WHEN psum + nsum > 0
            THEN CAST(psum * 1000000 // (psum + nsum) AS BIGINT)
       END AS mfi_ppm
FROM w WHERE nvalid = 14 ORDER BY x
""",
    category="temporal",
    tags=("defer-window2",),
)
def mfi_14_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MONEY FLOW INDEX (14-period) over daily order revenue — the
    volume-weighted RSI sibling: flow on an up-day counts positive,
    on a down-day negative, and MFI = positive/(positive+negative)
    over the trailing 14 observed flows (rsi_cutler covers the price
    face, this covers the flow face). Flow here is the day's exact
    revenue cents; direction compares consecutive observed days (lag
    over the row grid — the rsi convention). Published as one ppm
    floor-division of exact int64 sums; the all-flat window NULLs via
    the same CASE both engines. Scale: calendar-bounded daily rollup
    + one lag + one trailing-sum window."""
    daily = _daily_orders(spark, sf_dir)
    wl = Window.orderBy("x")
    d = daily.select("x", "v", F.lag("v").over(wl).alias("pv"))
    fl = d.select(
        "x",
        F.when(F.col("v") > F.col("pv"), F.col("v"))
        .otherwise(F.lit(0))
        .alias("pos"),
        F.when(F.col("v") < F.col("pv"), F.col("v"))
        .otherwise(F.lit(0))
        .alias("neg"),
        F.when(F.col("pv").isNull(), 0).otherwise(1).alias("lv"),
    )
    ww = Window.orderBy("x").rowsBetween(-13, 0)
    w = fl.select(
        "x",
        F.sum("pos").over(ww).alias("psum"),
        F.sum("neg").over(ww).alias("nsum"),
        F.sum("lv").over(ww).alias("nvalid"),
    )
    return (
        w.filter(F.col("nvalid") == 14)
        .select(
            "x",
            F.col("psum").alias("pos_flow_cents"),
            F.col("nsum").alias("neg_flow_cents"),
            F.expr(
                "CASE WHEN psum + nsum > 0 THEN"
                " CAST(psum * 1000000 div (psum + nsum) AS BIGINT) END"
            ).alias("mfi_ppm"),
        )
        .orderBy("x")
    )


@register(
    "variance_ratio_5d_daily",
    oracle="""
WITH
""" + _DAILY_ORDERS_CTE + """,
z AS (
  SELECT x,
         CAST(SUM(v) OVER (ORDER BY x ROWS BETWEEN 4 PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS zv,
         count(*) OVER (ORDER BY x ROWS BETWEEN 4 PRECEDING
                        AND CURRENT ROW) AS cnt
  FROM daily
),
mx AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sx,
         CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS qx
  FROM daily
),
mz AS (
  SELECT CAST(count(*) AS BIGINT) AS m, CAST(SUM(zv) AS BIGINT) AS sz,
         CAST(SUM(CAST(zv AS HUGEINT) * zv) AS HUGEINT) AS qz
  FROM z WHERE cnt = 5
)
SELECT mx.n, mz.m,
       CASE WHEN mx.n * mx.qx - CAST(mx.sx AS HUGEINT) * mx.sx > 0
                 AND CAST(mz.m AS DOUBLE) * CAST(mz.qz AS DOUBLE)
                     * CAST(mx.n AS DOUBLE) * CAST(mx.n AS DOUBLE)
                     * 1000 < 1e37
            THEN CAST((mz.m * mz.qz - CAST(mz.sz AS HUGEINT) * mz.sz)
                      * mx.n * mx.n * 1000
                      // (5 * (mx.n * mx.qx
                               - CAST(mx.sx AS HUGEINT) * mx.sx)
                         * mz.m * mz.m) AS BIGINT)
       END AS vr_milli
FROM mx CROSS JOIN mz
""",
    category="temporal",
    tags=("defer-window2",),
)
def variance_ratio_5d_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LO-MACKINLAY VARIANCE RATIO test statistic (q = 5, overlapping
    sums) on daily order revenue — the random-walk diagnostic: if
    increments are uncorrelated, the variance of 5-day overlapping
    sums is 5× the 1-day variance and VR = 1; VR > 1 flags momentum,
    VR < 1 mean-reversion (the trading-rule face of what ljung_box
    tests as a portmanteau). Exact: both variances are population
    moments n·Σx² − S² (decimal(38,0) ⟷ HUGEINT), VR published as one
    milli floor-division of their exact cross-scaled products; the
    double-precision magnitude guard (< 10³⁷) degrades to NULL
    identically both engines past decimal headroom (remedy at that
    scale: pre-scale v by 10³). Scale: calendar-bounded daily rollup,
    one trailing-sum window, two 1-row moment aggregates."""
    daily = _daily_orders(spark, sf_dir)
    ww = Window.orderBy("x").rowsBetween(-4, 0)
    z = daily.select(
        F.sum("v").over(ww).alias("zv"),
        F.count("*").over(ww).alias("cnt"),
    ).filter(F.col("cnt") == 5)
    mx = daily.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sx"),
        F.sum(F.col("v").cast(_DEC) * F.col("v")).alias("qx"),
    )
    mz = z.agg(
        F.count("*").alias("m"),
        F.sum("zv").alias("sz"),
        F.sum(F.col("zv").cast(_DEC) * F.col("zv")).alias("qz"),
    )
    return mx.crossJoin(F.broadcast(mz)).select(
        "n",
        "m",
        F.expr(
            f"CASE WHEN n * qx - CAST(sx AS {_DEC}) * sx > 0"
            f" AND CAST(m AS DOUBLE) * CAST(qz AS DOUBLE)"
            f" * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1000 < 1e37"
            f" THEN CAST((m * qz - CAST(sz AS {_DEC}) * sz)"
            f" * n * n * 1000"
            f" div (5 * (n * qx - CAST(sx AS {_DEC}) * sx) * m * m)"
            f" AS BIGINT) END"
        ).alias("vr_milli"),
    )


@register(
    "ljung_box_daily",
    oracle="""
WITH
""" + _DAILY_ORDERS_CTE + """,
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
  FROM daily
),
y AS (
  SELECT CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS t,
         CAST(tot.n * v - tot.s AS BIGINT) AS yd, tot.n
  FROM daily CROSS JOIN tot
),
led AS (
  SELECT t, yd, n,
         lead(yd, 1) OVER (ORDER BY t) AS y1,
         lead(yd, 2) OVER (ORDER BY t) AS y2,
         lead(yd, 3) OVER (ORDER BY t) AS y3,
         lead(yd, 4) OVER (ORDER BY t) AS y4,
         lead(yd, 5) OVER (ORDER BY t) AS y5,
         lead(yd, 6) OVER (ORDER BY t) AS y6,
         lead(yd, 7) OVER (ORDER BY t) AS y7
  FROM y
),
mom AS (
  SELECT max(n) AS n,
         CAST(SUM(CAST(yd AS HUGEINT) * yd) AS HUGEINT) AS c0,
         CAST(SUM(CAST(yd AS HUGEINT) * y1) AS HUGEINT) AS c1,
         CAST(SUM(CAST(yd AS HUGEINT) * y2) AS HUGEINT) AS c2,
         CAST(SUM(CAST(yd AS HUGEINT) * y3) AS HUGEINT) AS c3,
         CAST(SUM(CAST(yd AS HUGEINT) * y4) AS HUGEINT) AS c4,
         CAST(SUM(CAST(yd AS HUGEINT) * y5) AS HUGEINT) AS c5,
         CAST(SUM(CAST(yd AS HUGEINT) * y6) AS HUGEINT) AS c6,
         CAST(SUM(CAST(yd AS HUGEINT) * y7) AS HUGEINT) AS c7
  FROM led
),
lags AS (
  SELECT mom.n, mom.c0, k.k,
         CASE k.k WHEN 1 THEN mom.c1 WHEN 2 THEN mom.c2
                  WHEN 3 THEN mom.c3 WHEN 4 THEN mom.c4
                  WHEN 5 THEN mom.c5 WHEN 6 THEN mom.c6
                  ELSE mom.c7 END AS ck
  FROM mom CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k
),
r AS (
  SELECT n, CAST(k AS BIGINT) AS lag_k,
         CASE WHEN c0 > 0 AND CAST(c0 AS DOUBLE) < 1e31 THEN
           CASE WHEN ck >= 0
                THEN CAST(ck * 1000000 // c0 AS BIGINT)
                ELSE -CAST((-ck) * 1000000 // c0 AS BIGINT)
           END
         END AS r_micro
  FROM lags
)
SELECT lag_k, n, r_micro,
       CASE WHEN r_micro IS NOT NULL AND n > lag_k THEN
         CAST(CAST(n AS HUGEINT) * (n + 2)
              * (CAST(r_micro AS HUGEINT) * r_micro) * 1000
              // ((n - lag_k) * CAST(1000000000000 AS HUGEINT))
              AS BIGINT)
       END AS q_term_milli
FROM r ORDER BY lag_k
""",
    category="temporal",
    tags=("defer-window2",),
)
def ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LJUNG-BOX portmanteau autocorrelation diagnostic (lags 1..7)
    on daily order revenue — THE residual-whiteness test (Q =
    n(n+2)·Σ r_k²/(n−k); the acf/pacf queries publish individual
    lags, this publishes the test each forecasting query's residuals
    should pass). Exactness: deviations are the n-scaled y = n·x − S
    (int64 — the calendar bounds n); autocovariances c_k = Σ y·y₊ₖ
    are exact decimal(38,0) ⟷ HUGEINT; r_k is the SIGN-SPLIT micro
    floor-division c_k·10⁶ div c₀ (Spark div truncates, DuckDB //
    floors — the power-iteration doctrine); each Q term is one more
    per-term floored division (discrete variant, documented). The c₀
    < 10³¹ double guard degrades to NULL past decimal headroom
    identically in both engines (remedy: pre-scale y by 10³). Output
    long-format: (lag, r_micro, q_term_milli) — Q itself is the
    7-term integer sum the caller takes. Scale: calendar-bounded
    daily rollup, one 7-lead window pass, one 1-row moment row."""
    daily = _daily_orders(spark, sf_dir)
    tot = daily.agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    wl = Window.orderBy("t")
    y = daily.crossJoin(F.broadcast(tot)).select(
        F.row_number().over(Window.orderBy("x")).cast("long").alias("t"),
        (F.col("n") * F.col("v") - F.col("s")).alias("yd"),
        "n",
    )
    led = y.select(
        "yd",
        "n",
        *[F.lead("yd", k).over(wl).alias(f"y{k}") for k in range(1, 8)],
    )
    mom = led.agg(
        F.max("n").alias("n"),
        F.sum(F.col("yd").cast(_DEC) * F.col("yd")).alias("c0"),
        *[
            F.sum(F.col("yd").cast(_DEC) * F.col(f"y{k}")).alias(f"c{k}")
            for k in range(1, 8)
        ],
    )
    lags = mom.select(
        "n",
        "c0",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag_k"),
                        F.col(f"c{k}").alias("ck"),
                    )
                    for k in range(1, 8)
                ]
            )
        ).alias("e"),
    ).select("n", "c0", F.col("e.lag_k").alias("lag_k"), F.col("e.ck").alias("ck"))
    r = lags.select(
        "lag_k",
        "n",
        F.expr(
            "CASE WHEN c0 > 0 AND CAST(c0 AS DOUBLE) < 1e31 THEN"
            " CASE WHEN ck >= 0 THEN CAST(ck * 1000000 div c0 AS BIGINT)"
            " ELSE -CAST((-ck) * 1000000 div c0 AS BIGINT) END END"
        ).alias("r_micro"),
    )
    return r.select(
        "lag_k",
        "n",
        "r_micro",
        F.expr(
            f"CASE WHEN r_micro IS NOT NULL AND n > lag_k THEN"
            f" CAST(CAST(n AS {_DEC}) * (n + 2)"
            f" * (CAST(r_micro AS {_DEC}) * r_micro) * 1000"
            f" div ((n - lag_k) * CAST(1000000000000 AS {_DEC}))"
            f" AS BIGINT) END"
        ).alias("q_term_milli"),
    ).orderBy("lag_k")


@register(
    "cci_20_daily",
    oracle="""
WITH
""" + _DAILY_ORDERS_CTE + """,
idx AS (
  SELECT v, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS t, x
  FROM daily
),
win AS (
  SELECT x, t, v,
         CAST(SUM(v) OVER (ORDER BY t ROWS BETWEEN 19 PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS s20,
         count(*) OVER (ORDER BY t ROWS BETWEEN 19 PRECEDING
                        AND CURRENT ROW) AS cnt
  FROM idx
),
md AS (
  SELECT w.x, w.t, w.v, w.s20,
         CAST(SUM(abs(20 * j.v - w.s20)) AS HUGEINT) AS mdev
  FROM win w JOIN idx j ON j.t BETWEEN w.t - 19 AND w.t
  WHERE w.cnt = 20
  GROUP BY w.x, w.t, w.v, w.s20
)
SELECT x, v,
       CASE WHEN mdev > 0 THEN
         CASE WHEN 20 * v - s20 >= 0
              THEN CAST(CAST(20 * v - s20 AS HUGEINT) * 4000000
                        // (3 * mdev) AS BIGINT)
              ELSE -CAST(CAST(s20 - 20 * v AS HUGEINT) * 4000000
                         // (3 * mdev) AS BIGINT)
         END
       END AS cci_milli
FROM md ORDER BY x
""",
    category="temporal",
    tags=("defer-window2",),
)
def cci_20_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMODITY CHANNEL INDEX (20-period, Lambert 1980) over daily
    order revenue — the mean-DEVIATION-normalized oscillator (CCI =
    (x − SMA)/(0.015·MD)): unlike bollinger's variance, the mean
    absolute deviation is NOT moment-expressible, so each anchor day
    re-meets its trailing 20 observed days through a bounded range
    self-join on the row index (20× blow-up of the calendar-bounded
    day domain only — the hodges_lehmann argument). Exactness: with
    S the window sum, x − S/20 = (20x−S)/20 and MD = Σ|20xⱼ−S|/400,
    so CCI = (20x−S)·4000/(3·Σ|20xⱼ−S|) — all exact integers, 0.015
    written as the rational 3/200; published milli with the
    SIGN-SPLIT floor (Spark div truncates, DuckDB // floors). Scale:
    day-domain-bounded join; the fact scan is one map-side daily
    rollup."""
    daily = _daily_orders(spark, sf_dir)
    idx = daily.select(
        "x",
        "v",
        F.row_number().over(Window.orderBy("x")).cast("long").alias("t"),
    )
    ws = Window.orderBy("t").rowsBetween(-19, 0)
    win = idx.select(
        "x",
        "t",
        "v",
        F.sum("v").over(ws).alias("s20"),
        F.count("*").over(ws).alias("cnt"),
    ).filter(F.col("cnt") == 20)
    j = idx.select(F.col("t").alias("tj"), F.col("v").alias("vj"))
    md = (
        win.join(
            j,
            (F.col("tj") >= F.col("t") - 19) & (F.col("tj") <= F.col("t")),
        )
        .groupBy("x", "t", "v", "s20")
        .agg(
            F.sum(
                F.abs(F.lit(20) * F.col("vj") - F.col("s20")).cast(_DEC)
            ).alias("mdev")
        )
    )
    return md.select(
        "x",
        "v",
        F.expr(
            f"CASE WHEN mdev > 0 THEN"
            f" CASE WHEN 20 * v - s20 >= 0"
            f" THEN CAST(CAST(20 * v - s20 AS {_DEC}) * 4000000"
            f" div (3 * mdev) AS BIGINT)"
            f" ELSE -CAST(CAST(s20 - 20 * v AS {_DEC}) * 4000000"
            f" div (3 * mdev) AS BIGINT) END END"
        ).alias("cci_milli"),
    ).orderBy("x")
