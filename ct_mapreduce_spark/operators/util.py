"""Shared physical-layout helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Attribute set by sources.tables.load_table: a filesystem-derived estimate
# of the scan's partition count. Lets fan_out make its repartition decision
# without touching df.rdd (which forces an extra physical-planning pass).
SCAN_PARTS_ATTR = "_ctmr_scan_parts"


_UNITS = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}


def _conf_bytes(spark, key: str, default: int) -> int:
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    for suf, mult in _UNITS.items():
        if raw.endswith(suf + "b") or raw.endswith(suf):
            return int(float(raw.rstrip("b").rstrip(suf))) * mult
    return int(float(raw.rstrip("b") or default))


def estimate_scan_partitions(spark, total_bytes: int, n_files: int) -> int:
    """Mirror of Spark's FilePartition packing math, close enough to decide
    "is this scan under-parallelized?": splits are at most maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, bytes/defaultParallelism)),
    each file is padded by openCostInBytes, and splits are bin-packed into
    partitions of maxSplitBytes.
    """
    max_part = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    par = max(spark.sparkContext.defaultParallelism, 1)
    max_split = max(1, min(max_part, max(open_cost, total_bytes // par)))
    # First file's open cost doesn't force a new bin — a lone small file is
    # always one partition, however small max_split is.
    padded = total_bytes + max(0, n_files - 1) * open_cost
    return max(1, -(-padded // max_split))


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure CPU-dense per-row work is spread across the cluster.

    Parquet inputs are partitioned by bytes (maxPartitionBytes); a small
    file of wide text rows lands in ONE partition and a heavy per-row
    operator (regex battery, minhash, cosine) then runs on one core. Only
    repartitions when the input is under-parallelized — on real multi-file
    inputs at scale this is a no-op, so no gratuitous shuffle.

    The under-parallelized check prefers the filesystem-derived estimate
    that load_table attaches (SCAN_PARTS_ATTR) — pure os.stat arithmetic,
    no plan analysis. Frames without the annotation (already transformed,
    or from another source) fall back to probing df.rdd, which costs one
    extra physical-planning pass on the driver but never a job.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    est = getattr(df, SCAN_PARTS_ATTR, None)
    n = est if est is not None else df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df
