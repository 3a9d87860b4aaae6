"""Structured-Streaming ingest — the `ct-fetch` daemon as a streaming job.

Reference mapping (SURVEY §2.8):
  T1 bounded channel + workers  -> micro-batches + maxFilesPerTrigger
  T2 cursor save/resume         -> checkpointLocation (exactly-once with
                                   idempotent sink; the reference's
                                   dedup-makes-at-least-once-safe design,
                                   ct-fetch.go:371-392)
  T3 stateful dedup w/ TTL      -> dropDuplicatesWithinWatermark keyed on
                                   (exp_date, issuer_id, serial)
  T6 periodic telemetry         -> StreamingQueryListener / lastProgress

The stream source in tests is a file source replaying cert batches; in
production it would be Kafka/file landing zone — the plan is identical.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ct_mapreduce_spark.operators.metadata import issuer_metadata
from ct_mapreduce_spark.plans.ingest import ingest_filter
from ct_mapreduce_spark.functions.dates import exp_date_hour
from ct_mapreduce_spark.functions.codecs import spki_or_fallback
from ct_mapreduce_spark.schemas import CERTIFICATES


def read_cert_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source replay of certificate batches. maxFilesPerTrigger is the
    backpressure bound — the analog of the reference's 16Ki entry channel
    (ct-fetch.go:132)."""
    return (
        spark.readStream.schema(CERTIFICATES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_ingest(
    stream: DataFrame,
    now: dt.datetime | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """filter -> key-derive -> watermark -> stateful first-seen dedup.

    Watermark rides on entry_ts (arrival/log time — monotone-ish), NOT
    not_after (far-future data time; a watermark there would never advance
    past still-valid certs and state would never evict). State TTL ~
    watermark_delay after the key's last arrival — operationally equivalent
    to the reference's EXPIREAT-at-bucket-expiry (knowncertificates.go:
    98-104) because re-arrivals of a cert cluster in log time.
    """
    prepared = (
        stream.where(ingest_filter(now=now))
        .withColumn("exp_date", exp_date_hour("not_after"))
        .withColumn("authority_key", spki_or_fallback("skid", "issuer_spki"))
    )
    return prepared.withWatermark("entry_ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["exp_date", "issuer_id", "serial"]
    )


def start_ingest_query(
    deduped: DataFrame,
    store_path: str,
    checkpoint_path: str,
    metadata_path: str | None = None,
) -> StreamingQuery:
    """foreachBatch sink: append partitioned parquet + (optionally) refresh
    the issuer-metadata aggregate. Batch-id-keyed output dirs make the
    metadata upsert idempotent under replays (T2)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ct_mapreduce_spark.operators.util import append_v1

        (
            append_v1(
                batch_df.write.partitionBy("exp_date", "issuer_id").mode(
                    "append"
                )
            ).parquet(store_path)
        )
        if metadata_path is not None:
            meta = issuer_metadata(batch_df)
            append_v1(
                meta.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                )
            ).parquet(metadata_path)

    return (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(write_batch)
        .start()
    )


def streaming_event_windows(
    events_stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """T4: watermarked tumbling/sliding aggregation over the events stream
    — the streaming twin of corpus t4_tumbling_window (same plan shape, so
    batch results validate the streaming ones)."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with an event-time range: right-side rows
    match left-side rows of the same key within [left.ts, left.ts +
    horizon]. Both sides carry watermarks, so each side's join state is
    evicted once the other side's watermark passes the time bound —
    bounded state, the Structured Streaming analog of an interval join.

    Used as view->conversion attribution over the events stream; the
    batch equivalent is a plain conditional self-join, which is what the
    oracle runs (results are arrival-order independent)."""
    l = left.withWatermark(time_col, watermark).alias("l")
    r = right.withWatermark(time_col, watermark).alias("r")
    lt, rt = F.col(f"l.{time_col}"), F.col(f"r.{time_col}")
    return l.join(
        r,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {horizon}")),
        "inner",
    )


def streaming_sessionize(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """T4: native session windows in streaming (session_window). Batch twin
    is corpus t4c_sessionize (lag+cumsum composition)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )
