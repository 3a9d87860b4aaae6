"""One-pass distributed linear regression (OLS/ridge) on integer features.

The 100 TB shape of model fitting: the corpus-sized work is ONE
aggregation computing the normal-equation moments — sum(x_i * x_j) for
every feature pair and sum(x_i * y) — with map-side combine, so the
shuffle carries one (p+1)x(p+1) moment set per task. The solve runs on
the driver over that model-sized moment matrix; scoring is a scan-local
projection (pure codegen arithmetic, no shuffle, no UDF).

Determinism contract: features and the label must be INTEGER-valued
(stage rationals onto an integer grid first — the label_outliers
pattern). Moments are then exact (DECIMAL(38,0) sums — no float fold
order anywhere), and the driver solves the normal equations in EXACT
RATIONAL arithmetic (fractions.Fraction Gaussian elimination), so the
fitted weights are a pure function of the data: partition-invariant,
retry-invariant, and reproducible by any engine that can sum integers
— which is what lets the DuckDB/pure-python oracles replay the fit
bit-for-bit (tools/independent_oracle.py solves the same system by
Cramer determinants instead of elimination).

Semantics: minimize ||y - Xw||^2 + l2 * ||w_noint||^2 where X carries a
leading intercept column of ones; l2 (an integer, same grid as the
features) is NOT applied to the intercept. Outputs round half-up to 6
decimals (Spark ROUND semantics) only at the reporting edge — the solve
itself is exact.

No reference analog; extends the training-data-pipeline surface (quality
calibration / heuristic-weight fitting over document statistics).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def moment_sums(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> dict[tuple[str, str], int]:
    """Exact normal-equation moments in one aggregation: keys are
    (a, b) over columns ['1'] + features + [label], upper triangle only.
    DECIMAL(38,0) sums of BIGINT products — exact, map-side combined."""
    names = ["1"] + list(feature_cols) + [label_col]

    def col_of(n: str) -> Column:
        if n == "1":
            return F.lit(1).cast("decimal(38,0)")
        return F.col(n).cast("decimal(38,0)")

    aggs = []
    keys: list[tuple[str, str]] = []
    for i, a in enumerate(names):
        for b in names[i:]:
            keys.append((a, b))
            aggs.append(
                F.sum(col_of(a) * col_of(b)).alias(f"m_{len(keys) - 1}")
            )
    row = df.agg(*aggs).collect()[0]
    return {k: int(row[f"m_{i}"]) for i, k in enumerate(keys)}


def _solve_exact(
    a: list[list[Fraction]], b: list[Fraction]
) -> list[Fraction]:
    """Gaussian elimination with partial (max-|pivot|) pivoting in exact
    rationals — pivot choice cannot change the exact solution, only
    guard against a zero pivot."""
    n = len(b)
    m = [row[:] + [b[i]] for i, row in enumerate(a)]
    for c in range(n):
        piv = max(range(c, n), key=lambda r: abs(m[r][c]))
        if m[piv][c] == 0:
            raise ValueError("singular normal equations (collinear features)")
        m[c], m[piv] = m[piv], m[c]
        inv = Fraction(1, 1) / m[c][c]
        m[c] = [v * inv for v in m[c]]
        for r in range(n):
            if r != c and m[r][c] != 0:
                f = m[r][c]
                m[r] = [rv - f * cv for rv, cv in zip(m[r], m[c])]
    return [m[i][n] for i in range(n)]


def fit_linear(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    l2: int = 0,
) -> dict:
    """Fit OLS/ridge over integer columns. Returns {"weights":
    {"intercept": Fraction, feat: Fraction...}, "r2": Fraction, "n": int}
    — exact rationals; round at the edge you report from."""
    names = ["1"] + list(feature_cols)
    ms = moment_sums(df, feature_cols, label_col)

    def m(a: str, b: str) -> int:
        return ms[(a, b)] if (a, b) in ms else ms[(b, a)]

    p = len(names)
    gram = [
        [
            Fraction(m(names[i], names[j]))
            + (Fraction(l2) if (i == j and i > 0) else Fraction(0))
            for j in range(p)
        ]
        for i in range(p)
    ]
    rhs = [Fraction(m(names[i], label_col)) for i in range(p)]
    w = _solve_exact(gram, rhs)

    n = m("1", "1")
    # SSE = y'y - 2 w'X'y + w'Gw  (G here WITHOUT the ridge term);
    # SST = y'y - (sum y)^2 / n — both exact.
    yy = Fraction(m(label_col, label_col))
    wxy = sum(wi * Fraction(m(names[i], label_col)) for i, wi in enumerate(w))
    wgw = sum(
        w[i] * w[j] * Fraction(m(names[i], names[j]))
        for i in range(p)
        for j in range(p)
    )
    sse = yy - 2 * wxy + wgw
    sy = Fraction(m("1", label_col))
    sst = yy - sy * sy / Fraction(n)
    r2 = Fraction(0) if sst == 0 else 1 - sse / sst
    weights = {"intercept": w[0]}
    for i, f in enumerate(feature_cols):
        weights[f] = w[i + 1]
    return {"weights": weights, "r2": r2, "n": n}


def _round_half_away(num: int, den: int) -> int:
    """Round num/den (den > 0) to the nearest integer, ties away from
    zero — java BigDecimal HALF_UP, the rounding Spark's ROUND uses."""
    sign = -1 if num < 0 else 1
    num = abs(num)
    q, r = divmod(num, den)
    if 2 * r >= den:
        q += 1
    return sign * q


def round_frac(v: Fraction, digits: int = 6) -> float:
    """Exact-rational HALF_UP rounding to `digits` decimals, as a float.
    This is the reporting edge — everything upstream stays exact."""
    scale = 10**digits
    sv = v * scale
    return _round_half_away(sv.numerator, sv.denominator) / scale


def predict_expr(
    weights: dict, feature_cols: list[str], scale: int = 10**6
) -> Column:
    """Scan-local prediction as pure codegen arithmetic. Weights enter as
    integer-scaled rationals (round half-up at `scale`) so Spark and any
    replaying engine compute the identical double: prediction =
    (w_int[0] + sum(w_int[i] * x_i)) / scale — one integer dot product,
    one exact power-of-ten division at the edge."""

    def w_int(v: Fraction) -> int:
        sv = v * scale
        return _round_half_away(sv.numerator, sv.denominator)

    acc: Column = F.lit(w_int(weights["intercept"])).cast("decimal(38,0)")
    for f in feature_cols:
        acc = acc + F.lit(w_int(weights[f])).cast("decimal(38,0)") * F.col(
            f
        ).cast("decimal(38,0)")
    return (acc.cast("double") / F.lit(float(scale))).alias("prediction")
