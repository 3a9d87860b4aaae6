"""Structured-Streaming tests: stateful dedup, checkpoint resume, windowed
aggregation parity with batch (SURVEY §5 test plan item e)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.dedup import first_seen
from ct_mapreduce_spark.plans.ingest import prepare
from ct_mapreduce_spark.sources.certificates import synthetic_certificates
from ct_mapreduce_spark.sources.tables import load_table
from ct_mapreduce_spark.streaming.ingest_stream import (
    read_cert_stream,
    start_ingest_query,
    streaming_event_windows,
    streaming_ingest,
    streaming_sessionize,
)

NOW = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cert_batches(spark, tmp_path_factory):
    """Synthetic certs written as multiple parquet files (replay source)."""
    path = str(tmp_path_factory.mktemp("cert_src"))
    certs = synthetic_certificates(spark, n=1500, seed=7)
    certs.repartition(6).write.mode("overwrite").parquet(path)
    return path, certs


def test_streaming_dedup_matches_batch(spark, cert_batches, tmp_path):
    src_path, certs = cert_batches
    stream = read_cert_stream(spark, src_path, max_files_per_trigger=2)
    deduped = streaming_ingest(stream, now=NOW)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = start_ingest_query(deduped, store, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(store)
    batch_keys = (
        first_seen(prepare(certs, now=NOW))
        .select("exp_date", "issuer_id", "serial")
        .distinct()
    )
    # streaming winner is arrival-order (like the reference), so compare
    # key sets, not winning rows
    assert got.select("exp_date", "issuer_id", "serial").distinct().count() == (
        batch_keys.count()
    )
    assert got.count() == batch_keys.count()  # no duplicate keys written


def test_streaming_resume_idempotent(spark, cert_batches, tmp_path):
    """Kill after first batch, restart with same checkpoint: no duplicate
    keys in the store (T2 resume semantics, ct-fetch.go:371-392)."""
    src_path, certs = cert_batches
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    stream = read_cert_stream(spark, src_path, max_files_per_trigger=3)
    q = start_ingest_query(streaming_ingest(stream, now=NOW), store, ckpt)
    # let at least one micro-batch commit, then stop mid-stream
    while not q.recentProgress:
        pass
    q.stop()

    q2 = start_ingest_query(
        streaming_ingest(read_cert_stream(spark, src_path, 3), now=NOW), store, ckpt
    )
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(store)
    expected = (
        first_seen(prepare(certs, now=NOW))
        .select("exp_date", "issuer_id", "serial")
        .distinct()
        .count()
    )
    assert got.count() == expected


def test_streaming_windows_match_batch(spark, tmp_path):
    """Tumbling-window stream over the events table == batch groupBy."""
    ev = load_table(spark, "events", SF)
    src = str(tmp_path / "events_src")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = streaming_event_windows(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 4))
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 4))
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
        ).collect()
    }
    assert got == want


def test_streaming_session_window(spark, tmp_path):
    ev = load_table(spark, "events", SF).limit(500)
    src = str(tmp_path / "events_src2")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_sessionize(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert rows and all(r.n_events >= 1 for r in rows)
    assert sum(r.n_events for r in rows) == 500


def test_telemetry_listener(spark, tmp_path):
    """T6: StreamingQueryListener collects batch/row counters and the
    staleness health rule works (telemetry.go analog)."""
    import time

    from ct_mapreduce_spark.streaming.telemetry import IngestTelemetryListener

    ev = load_table(spark, "events", SF).limit(200)
    src = str(tmp_path / "tele_src")
    ev.write.mode("overwrite").parquet(src)
    listener = IngestTelemetryListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            stream.groupBy("event_type").count()
            .writeStream.outputMode("complete")
            .format("memory").queryName("tele_out").start()
        )
        q.processAllAvailable()
        q.stop()
        time.sleep(1)  # listener events are delivered async
        m = listener.metrics()
        assert any(s["n_rows"] >= 200 for s in m.values()), m
        assert listener.is_healthy(max_staleness_seconds=60)
        assert not listener.is_healthy(max_staleness_seconds=0.0001)
    finally:
        spark.streams.removeListener(listener)
