"""One-pass exact linear regression: moment exactness, the rational
solve, ridge shrinkage, scan-local scoring, and rounding semantics."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.regression import (
    _round_half_away,
    _solve_exact,
    fit_linear,
    moment_sums,
    predict_expr,
    round_frac,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "x1 BIGINT, x2 BIGINT, y BIGINT")


def test_moment_sums_exact(spark):
    df = _df(spark, [(1, 2, 3), (4, 5, 6), (7, 8, 9)])
    ms = moment_sums(df, ["x1", "x2"], "y")
    assert ms[("1", "1")] == 3
    assert ms[("x1", "x1")] == 1 + 16 + 49
    assert ms[("x1", "x2")] == 2 + 20 + 56
    assert ms[("x2", "y")] == 6 + 30 + 72
    # partitioning cannot move an exact integer sum
    assert moment_sums(df.repartition(7), ["x1", "x2"], "y") == ms


def test_fit_recovers_exact_relation(spark):
    # y = 3 + 2*x1 - x2 exactly: OLS must recover it with r2 = 1
    rows = [(x1, x2, 3 + 2 * x1 - x2) for x1 in range(6) for x2 in range(4)]
    fit = fit_linear(_df(spark, rows), ["x1", "x2"], "y")
    assert fit["weights"]["intercept"] == Fraction(3)
    assert fit["weights"]["x1"] == Fraction(2)
    assert fit["weights"]["x2"] == Fraction(-1)
    assert fit["r2"] == Fraction(1)
    assert fit["n"] == 24


def test_ridge_shrinks_toward_zero(spark):
    rows = [(x1, x2, 10 * x1 + x2) for x1 in range(8) for x2 in range(3)]
    ols = fit_linear(_df(spark, rows), ["x1", "x2"], "y", l2=0)
    ridge = fit_linear(_df(spark, rows), ["x1", "x2"], "y", l2=50)
    assert abs(ridge["weights"]["x1"]) < abs(ols["weights"]["x1"])
    # the intercept is NOT penalized: it absorbs the shrunk slope
    assert ridge["weights"]["intercept"] > ols["weights"]["intercept"]


def test_singular_features_raise(spark):
    rows = [(x, 2 * x, x + 1) for x in range(10)]  # x2 = 2*x1 exactly
    with pytest.raises(ValueError, match="singular"):
        fit_linear(_df(spark, rows), ["x1", "x2"], "y")


def test_solve_exact_vs_fractions_cramer():
    # 2x2 cross-check against hand Cramer
    a = [[Fraction(4), Fraction(2)], [Fraction(2), Fraction(3)]]
    b = [Fraction(10), Fraction(8)]
    w = _solve_exact([r[:] for r in a], b[:])
    det = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    assert w[0] == (b[0] * a[1][1] - a[0][1] * b[1]) / det
    assert w[1] == (a[0][0] * b[1] - b[0] * a[1][0]) / det


def test_round_half_away_semantics():
    assert _round_half_away(3, 2) == 2  # 1.5 -> 2
    assert _round_half_away(-3, 2) == -2  # -1.5 -> -2 (away from zero)
    assert _round_half_away(1, 3) == 0
    assert round_frac(Fraction(1, 3)) == 0.333333
    # negative tie at the 6th decimal rounds away from zero
    assert round_frac(Fraction(-1, 2000000)) == -1e-06


def test_predict_expr_matches_driver_arithmetic(spark):
    rows = [(x1, x2, 3 + 2 * x1 - x2) for x1 in range(5) for x2 in range(3)]
    df = _df(spark, rows)
    fit = fit_linear(df, ["x1", "x2"], "y")
    scored = df.select(
        "x1", "x2", "y", predict_expr(fit["weights"], ["x1", "x2"])
    ).collect()
    for r in scored:
        # exact relation + exact weights => prediction equals y exactly
        assert r["prediction"] == pytest.approx(r["y"], abs=1e-9)
    # scoring is scan-local: no exchange in the plan
    plan = df.select(
        predict_expr(fit["weights"], ["x1", "x2"])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
