"""Mergeable distinct-count sketches (HyperLogLog, Datasketches-backed).

The reference answers "how many distinct serials per (issuer, expDate)"
with exact Redis SCARD (knowncertificates.go:57-63) and sums those leaf
counts upward (storage-statistics.go:44-53) — correct only because each
serial lives in exactly one leaf set. For overlapping rollups (distinct
users per day -> per month; distinct serials per issuer across buckets)
exact counts don't add. The 100 TB pattern is: sketch ONCE per leaf
group over the raw data, then every higher rollup level is a cheap
register-wise union of sketches — no second scan, no exact-distinct
shuffle of raw keys, and partial aggregation keeps the shuffle payload
at sketch size (2^lg_k bytes) instead of key-set size.

All sketch math is Spark-native (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate — JVM Datasketches, codegen-friendly); estimates are
deterministic for a given input set (register max is order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_sketches(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch per key group over value_col, plus its estimate.

    One shuffle keyed by `keys`; map-side partial sketches merge before
    the exchange, so shuffle bytes are O(groups x 2^lg_k), independent of
    row count."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lg_k))
        ).cast("long").alias("est_distinct"),
    )


def hll_rollup(
    sketches: DataFrame, rollup_keys: list[str], sketch_col: str = "hll"
) -> DataFrame:
    """Union leaf sketches up to `rollup_keys` WITHOUT touching raw data
    — the sketch-algebra restatement of storage-statistics' per-issuer
    sums, correct even when leaf member sets overlap."""
    return sketches.groupBy(*rollup_keys).agg(
        F.hll_union_agg(sketch_col).alias("hll"),
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col))
        .cast("long")
        .alias("est_distinct"),
    )


def hll_estimate(sketches: DataFrame, sketch_col: str = "hll") -> DataFrame:
    """Project estimates from a sketch column (register-deterministic)."""
    return sketches.withColumn(
        "est_distinct",
        F.hll_sketch_estimate(F.col(sketch_col)).cast("long"),
    )
