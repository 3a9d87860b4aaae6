"""Readers for the driver-generated parquet tables (TESTDATA.md).

Thin on purpose: `spark.read.parquet` already gives columnar scans,
predicate pushdown, and partition pruning; wrapping it further would only
hide the plan from Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ct_mapreduce_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (session tz is pinned UTC
    in session.py, so the instant is unchanged).

    The driver's generator has emitted `ts` as TIMESTAMP(NANOS) in some
    rounds and as timestamp[us] with no isAdjustedToUTC flag in others;
    Spark >= 3.4 infers the latter as TIMESTAMP_NTZ, which every
    event-time consumer (withWatermark, window(), unix_millis, interval
    arithmetic) rejects. One tolerant normalization point here — the
    analog of the reference's single timestamp parse/format path
    (types.go:21-23,339-365) — keeps the rest of the engine on plain
    TIMESTAMP semantics regardless of which encoding the files carry.
    """
    ntz_cols = [c for c, t in df.dtypes if t.startswith("timestamp_ntz")]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one testdata table.

    events.parquet has stored its `ts` as TIMESTAMP(NANOS), which the
    Spark parquet reader rejects. Read it as long (legacy conf) and
    truncate to microseconds with *integer* division — DuckDB truncates
    nanos->micros the same way, so oracle comparisons agree. (Float
    division here would round, not truncate, and drift by 1us on ~half
    the rows.) Un-adjusted-to-UTC micros (TIMESTAMP_NTZ) are normalized
    by _normalize_timestamps. Both confs are runtime-settable, so this
    works on a caller-provided SparkSession too (the driver passes its
    own session into queries()).
    """
    path = f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet"
    # Prefer reading NTZ-annotated micros directly as TIMESTAMP; the cast
    # below is the fallback for sessions where this conf is unsupported.
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _annotate_scan_parts(spark, _normalize_timestamps(df), path)
    return _annotate_scan_parts(spark, _normalize_timestamps(spark.read.parquet(path)), path)


def _annotate_scan_parts(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Attach a filesystem-derived scan-partition estimate so fan_out can
    decide "under-parallelized?" from os.stat arithmetic instead of a
    df.rdd probe (which costs an extra physical-planning pass)."""
    from ct_mapreduce_spark.operators.util import SCAN_PARTS_ATTR, estimate_scan_partitions

    try:
        if os.path.isdir(path):
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet") or not f.startswith(("_", "."))
            ]
            sizes = [os.stat(f).st_size for f in files if os.path.isfile(f)]
        else:
            sizes = [os.stat(path).st_size]
        setattr(df, SCAN_PARTS_ATTR, estimate_scan_partitions(spark, sum(sizes), len(sizes)))
    except OSError:
        pass  # non-local path (hdfs/s3): leave unannotated, fan_out probes
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
