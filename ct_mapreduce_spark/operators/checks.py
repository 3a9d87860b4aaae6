"""Data-quality checks — the validation gate a production pipeline runs
before trusting a table (the reference implicitly trusts its inputs; an
engine serving arbitrary corpora cannot).

Each check returns rows of (check, metric, passed) so a suite is one
unioned DataFrame — inspectable, joinable, and cheap: every check is a
single aggregate (count/sum), no row-level materialization. At scale
each check is one pass over the column set it touches; the union of
1-row aggregates costs nothing extra.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row(name: str, metric, passed) -> list:
    return [
        F.lit(name).alias("check"),
        metric.cast("double").alias("metric"),
        passed.cast("boolean").alias("passed"),
    ]


def check_unique(df: DataFrame, keys: list[str], name: str) -> DataFrame:
    """metric = duplicate-key rows; passes when every key is unique."""
    dup = F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys])
    return df.agg(*_row(name, dup, dup == 0))


def check_no_orphans(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Referential integrity: metric = fact rows whose key misses the
    dimension; anti-join then count (dim side broadcast when small)."""
    orphans = fact.select(F.col(fact_key)).join(
        dim.select(F.col(dim_key)),
        fact[fact_key] == dim[dim_key],
        "left_anti",
    )
    n = F.count(F.lit(1))
    return orphans.agg(*_row(name, n, n == 0))


def check_null_ratio(
    df: DataFrame, col: str, max_ratio: float, name: str
) -> DataFrame:
    """metric = null fraction of `col`; passes when <= max_ratio."""
    ratio = F.sum(
        F.when(F.col(col).isNull(), 1).otherwise(0)
    ) / F.greatest(F.count(F.lit(1)), F.lit(1))
    return df.agg(*_row(name, F.round(ratio, 6), ratio <= max_ratio))


def check_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str
) -> DataFrame:
    """metric = rows outside [lo, hi]; passes when none."""
    out = F.sum(
        F.when((F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
    )
    return df.agg(*_row(name, out, out == 0))


def run_suite(checks: list[DataFrame]) -> DataFrame:
    """Union a list of single-row check frames into one report."""
    return reduce(lambda a, b: a.unionByName(b), checks)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format table profile — the first look a pipeline takes at an
    unfamiliar corpus drop: per column (n_rows, n_nulls, null_frac,
    n_distinct, min/max rendered as strings).

    One aggregate job over the column set. exact_distinct=True uses
    count_distinct (the oracle-comparable default; Spark plans the
    multi-distinct agg via a single expand — one shuffle). At 100 TB flip
    exact_distinct=False for approx_count_distinct(2% HLL) — profile
    numbers are advisory there and the 1-pass-no-expand plan matters more
    than exactness (this tier is rows-only, engines' HLLs differ).
    """
    cols = columns or df.columns
    distinct = (
        F.count_distinct if exact_distinct else F.approx_count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nn_{c}"),
            distinct(F.col(c)).cast("long").alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_str"),
                F.col(f"_mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(
        F.col("_rows").alias("n_rows"), F.explode(per_col).alias("p")
    ).select(
        "p.col_name",
        "n_rows",
        "p.n_nulls",
        F.round(F.col("p.n_nulls") / F.greatest("n_rows", F.lit(1)), 6).alias(
            "null_frac"
        ),
        "p.n_distinct",
        "p.min_str",
        "p.max_str",
    )
