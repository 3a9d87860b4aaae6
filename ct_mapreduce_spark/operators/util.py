"""Shared physical-layout helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure CPU-dense per-row work is spread across the cluster.

    Parquet inputs are partitioned by bytes (maxPartitionBytes); a small
    file of wide text rows lands in ONE partition and a heavy per-row
    operator (regex battery, minhash, cosine) then runs on one core. Only
    repartitions when the input is under-parallelized — on real multi-file
    inputs at scale this is a no-op, so no gratuitous shuffle.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
