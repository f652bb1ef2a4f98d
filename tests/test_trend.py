"""Exact OLS slope semantics (operators/trend.py): the micros floor
matches a Fraction-exact brute force, falling trends keep the
sign×abs-floor contract, and zero-variance groups yield NULL.  The
composed orders query is hash-oracled (`revenue_trend_slopes`)."""

from __future__ import annotations

from fractions import Fraction

from hainan_big_data_recommend_system_spark.operators.trend import (
    ols_slopes,
)


def _brute(points, scale=1_000_000):
    n = len(points)
    sx = sum(x for x, _ in points)
    sy = sum(y for _, y in points)
    sxy = sum(x * y for x, y in points)
    sxx = sum(x * x for x, _ in points)
    den = n * sxx - sx * sx
    if den <= 0:
        return None
    num = n * sxy - sx * sy
    q = Fraction(abs(num) * scale, den)
    return (-1 if num < 0 else 1) * (q.numerator // q.denominator)


def _run(spark, groups):
    rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    return {
        r["g"]: (r["n"], r["slope_scaled"])
        for r in ols_slopes(df, ["g"], "x", "y").collect()
    }


def test_slopes_match_fraction_brute_force(spark):
    groups = {
        "rising": [(1, 10), (2, 30), (3, 31), (4, 70)],
        "falling": [(1, 100), (2, 80), (5, 10)],
        "flatish": [(1, 7), (2, 7), (3, 8)],
        "two": [(10, 5), (20, 6)],
    }
    got = _run(spark, groups)
    for g, pts in groups.items():
        assert got[g] == (len(pts), _brute(pts)), g
    assert got["falling"][1] < 0 < got["rising"][1]


def test_zero_x_variance_yields_null(spark):
    got = _run(spark, {"const": [(3, 1), (3, 99), (3, 5)]})
    assert got["const"] == (3, None)


def test_truncation_toward_zero_on_negative(spark):
    # slope -1/3: micros floor-toward-zero is -333333 (NOT -333334)
    got = _run(spark, {"g": [(0, 1), (3, 0)]})
    assert got["g"] == (2, -333_333)
