"""SparkSession factory.

Single place where engine-wide physical-execution posture is set: AQE on
(runtime re-plan, skew-join splitting, partition coalescing), Arrow on (the
pandas-UDF surface is Arrow-vectorized), UTC session timezone (so results are
comparable against UTC-naive oracles), shuffle partitions sized to cores
rather than the 200 default.

The reference's equivalents of these knobs are hand-coded constants
(worker parallelism `config/config.go:187`, channel capacity
`cmd/ct-fetch/ct-fetch.go:132`); here they are Spark confs that scale with
the cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test harness; on a real cluster the
# caller overrides master/memory via spark-submit and these become no-ops.
_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "ct_mapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Safe to call repeatedly — Spark returns the existing session; confs
    passed here only apply on first creation.
    """
    cpus = int(_DEF_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Parquet scans: larger row groups per task at 100 TB; harmless locally.
        .config("spark.sql.files.maxPartitionBytes", "256m")
        # zstd store bytes (r15, guide §6.3): smaller than snappy at
        # similar read speed — every persisted store (mh_index posting
        # lists, ingest cert store, IVF/PQ codes, manifests) shrinks,
        # which at 100 TB is scan bytes and file-open time. Values are
        # codec-independent (pins/oracles unaffected); size ESTIMATES on
        # parquet scans shrink with the bytes, which only biases
        # dispatches toward broadcast/explicit-repartition — both
        # directions already guarded (write_store requires a 2x margin;
        # broadcasts are size-capped).
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # testdata parquet carries un-adjusted-to-UTC micros; read them as
        # TIMESTAMP (session tz is UTC) rather than TIMESTAMP_NTZ, which
        # event-time operators reject. load_table also sets this at read
        # time for caller-provided sessions.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Commit algorithm v2 (r14, guide §6): task outputs rename straight
        # into the destination at task commit instead of a single-threaded
        # driver merge at job commit — the merge cost is O(files) on the
        # driver under v1, which the partitioned stores (256 pfx dirs,
        # ingest's (exp_date, issuer) tree) pay on every write. Measured
        # 2x on the flat sigs write locally; on HDFS-scale stores the
        # driver merge is the well-known job-commit bottleneck. Trade
        # (documented): a failed job can leave committed task files
        # behind. That is acceptable ONLY for overwrite/swap sinks, whose
        # gates check a fresh _SUCCESS or swap whole directories aside
        # (fsutil); a bare APPEND's destination already carries the
        # previous write's _SUCCESS, so append-mode writes override this
        # back to v1 per write (operators/util.py:APPEND_COMMITTER_V1 —
        # r15, closing the r14 ADVICE exposure).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_EXTERNAL_MASTER"):
        builder = builder.master(f"local[{cpus}]")
        builder = builder.config("spark.driver.memory", "48g")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
