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
