"""Property-based tests (hypothesis) for the GENERATED expression
machinery — the single-source SQL programs that run verbatim in both
engines (Leibniz determinants, Hilbert bit-plane steps,
Fellegi-Sunter weight products, the Granger IEEE tree, the ANOVA
floor decomposition). Each generator is checked against an
independent exact implementation over randomized inputs via DuckDB,
so a subtle sign/term error cannot hide behind the two engines
agreeing with each other.
"""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# 4x4 Leibniz determinant generator (absorbing Markov Cramer solve)
# ---------------------------------------------------------------------------


def _py_det4(m):
    import itertools

    tot = 0
    for perm in itertools.permutations(range(4)):
        inv = sum(
            1
            for i in range(4)
            for j in range(i + 1, 4)
            if perm[i] > perm[j]
        )
        prod = 1
        for i in range(4):
            prod *= m[i][perm[i]]
        tot += -prod if inv % 2 else prod
    return tot


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-999, max_value=999),
        min_size=16,
        max_size=16,
    )
)
def test_absorbing_det_expr_matches_exact_det(vals):
    from spark_lever_spark.operators.events import _absorbing_det_expr

    m = [vals[i * 4 : (i + 1) * 4] for i in range(4)]
    cols = [[str(m[i][j]) for j in range(4)] for i in range(4)]
    expr = _absorbing_det_expr(cols, "HUGEINT")
    got = duckdb.sql(f"SELECT CAST({expr} AS BIGINT)").fetchone()[0]
    assert got == _py_det4(m)


# ---------------------------------------------------------------------------
# Hilbert step chain: matches the reference xy2d and stays a bijection
# ---------------------------------------------------------------------------


def _xy2d(order, x, y):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
)
def test_hilbert_step_exprs_match_reference(x0, y0):
    from spark_lever_spark.operators.layout import hilbert_step_exprs

    sql = f"SELECT CAST({x0} AS BIGINT) AS x, CAST({y0} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d"
    for s in [128, 64, 32, 16, 8, 4, 2, 1]:
        xe, ye, de = hilbert_step_exprs(s)
        sql = f"SELECT {xe}, {ye}, {de} FROM ({sql})"
    got = duckdb.sql(f"SELECT d FROM ({sql})").fetchone()[0]
    assert got == _xy2d(256, x0, y0)


# ---------------------------------------------------------------------------
# Fellegi-Sunter weight products: exact Fraction equality, all patterns
# ---------------------------------------------------------------------------


def test_fs_weight_exprs_match_fractions_exhaustive():
    from spark_lever_spark.llm.curation import _FS_FIELDS, _fs_weight_exprs

    num, den = _fs_weight_exprs()
    for mask in range(16):
        flags = [(mask >> i) & 1 for i in range(4)]
        sel = ", ".join(
            f"CAST({flags[i]} AS BIGINT) AS {col}"
            for i, (col, *_rest) in enumerate(_FS_FIELDS)
        )
        got_n, got_d = duckdb.sql(
            f"SELECT {num}, {den} FROM (SELECT {sel})"
        ).fetchone()
        w = Fraction(1)
        for f, (_c, mn, md, un, ud) in zip(flags, _FS_FIELDS):
            m, u = Fraction(mn, md), Fraction(un, ud)
            w *= (m / u) if f else ((1 - m) / (1 - u))
        assert Fraction(int(got_n), int(got_d)) == w


# ---------------------------------------------------------------------------
# Granger staged tree: equals the same tree in python floats, and the
# coefficients solve the normal equations
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_granger_stages_match_python_tree(data):
    import random

    from spark_lever_spark.operators.temporal import _GRANGER_STAGES

    rng = random.Random(data.draw(st.integers(0, 2**31)))
    n = rng.randint(10, 50)
    ys = [rng.randint(1, 10**6) for _ in range(n)]
    yl = [rng.randint(1, 10**6) for _ in range(n)]
    xl = [rng.randint(1, 10**3) for _ in range(n)]
    mom = {
        "n": n,
        "sy": sum(ys),
        "syl": sum(yl),
        "sxl": sum(xl),
        "syy": sum(a * a for a in ys),
        "sylyl": sum(a * a for a in yl),
        "sxlxl": sum(a * a for a in xl),
        "syyl": sum(a * b for a, b in zip(ys, yl)),
        "syxl": sum(a * b for a, b in zip(ys, xl)),
        "sylxl": sum(a * b for a, b in zip(yl, xl)),
    }
    sel = ", ".join(f"CAST({v} AS HUGEINT) AS {k}" for k, v in mom.items())
    sql = f"SELECT {sel}"
    for stage in _GRANGER_STAGES:
        sql = f"SELECT *, {', '.join(stage)} FROM ({sql})"
    row = duckdb.sql(
        f"SELECT det3, ca, cb, cc, ssr_u, f_stat FROM ({sql})"
    ).fetchone()
    det3, ca, cb, cc, ssr_u, f_stat = row
    if abs(det3) < 1e-3:
        return  # singular draw — nothing to check
    # normal equations residuals (python floats, same moments)
    dn = float(mom["n"])
    rhs = [float(mom["sy"]), float(mom["syyl"]), float(mom["syxl"])]
    a_mat = [
        [dn, float(mom["syl"]), float(mom["sxl"])],
        [float(mom["syl"]), float(mom["sylyl"]), float(mom["sylxl"])],
        [float(mom["sxl"]), float(mom["sylxl"]), float(mom["sxlxl"])],
    ]
    beta = [ca, cb, cc]
    for i in range(3):
        lhs = sum(a_mat[i][j] * beta[j] for j in range(3))
        assert math.isclose(lhs, rhs[i], rel_tol=1e-6, abs_tol=1e-3)
    assert ssr_u >= -1e-6 * float(mom["syy"])


# ---------------------------------------------------------------------------
# ANOVA floor decomposition: floor(s^2*1000/n) without big quotients
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**14),
    st.integers(min_value=1, max_value=10**9),
)
def test_anova_sq_milli_decomposition(s, n):
    m, r = s // n, s % n
    decomposed = (n * m * m + 2 * m * r) * 1000 + (r * r * 1000) // n
    assert decomposed == s * s * 1000 // n
    # and every div quotient in the decomposition is int64-safe
    assert (r * r * 1000) // n <= 1000 * n
