"""Skew-aware aggregation (SURVEY §7 watch-list: per-issuer cardinality is
heavy-tailed — Let's Encrypt-scale issuers dominate the dedup/count state).

AQE's skew-join splitting handles joins; for *aggregations* with a hot
group key, pre-splitting by a salt gives two short shuffles instead of one
shuffle with a straggler partition:

  phase 1: groupBy(key, salt) partial — the hot key fans out over
           `buckets` reducers; salt = hash(value-col) so identical values
           land in the same bucket, keeping bucket-distinct counts exact.
  phase 2: groupBy(key) sum of bucket counts — tiny input (keys x salt).

Exactness: salt partitions the *value* space, so per-bucket distinct sets
are disjoint and their counts are additive.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Exact count_distinct(value_col) per keys, skew-resistant.

    Output column: `n_distinct`.
    """
    keys = list(keys)
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)).alias("_salt")
    phase1 = (
        df.select(*keys, value_col)
        .groupBy(*keys, salt)
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias("n_distinct"))


def salted_first_seen(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    buckets: int = 32,
) -> DataFrame:
    """First-seen row per key under heavy key skew: two-phase min_by.
    Equivalent to operators/dedup.first_seen when keys include the full
    dedup identity; use this variant when one key value dominates."""
    keys = list(keys)
    payload = [c for c in df.columns if c not in keys]
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(buckets)).alias("_salt")
    phase1 = (
        df.groupBy(*keys, salt)
        .agg(F.min_by(F.struct(*payload), F.col(order_col)).alias("_row"),
             F.min(order_col).alias("_o"))
    )
    phase2 = phase1.groupBy(*keys).agg(
        F.min_by(F.col("_row"), F.col("_o")).alias("_row")
    )
    return phase2.select(*keys, *[F.col(f"_row.{c}").alias(c) for c in payload])
