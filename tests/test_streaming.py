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


def test_streaming_late_duplicate_dropped_state_bounded(spark, tmp_path):
    """D2/T5: a duplicate arriving beyond the watermark is dropped, and the
    dedup state stays bounded (evicted keys don't accumulate) — the analog
    of the reference's EXPIREAT-at-bucket-expiry TTL
    (storage/knowncertificates.go:98-104, knowncertificates_test.go:85-110).

    Three waves replayed in order via file mtime + maxFilesPerTrigger=1:
      wave 1: fresh certs at T0
      wave 2: different certs at T0+12h  (watermark advances to ~T0+11h,
              evicting wave-1 state under the 1h delay)
      wave 3: an exact duplicate of a wave-1 cert, stamped with its original
              old entry_ts — now far below the watermark
    The wave-3 row must NOT produce a second store row for its key, and the
    final state row count must be < total distinct keys (wave-1 evicted).
    """
    import time

    src = str(tmp_path / "late_src")
    store = str(tmp_path / "late_store")
    ckpt = str(tmp_path / "late_ckpt")

    pdf = synthetic_certificates(spark, n=80, seed=3).toPandas()
    # Make all certs pass the ingest filter deterministically.
    pdf["is_ca"] = False
    pdf["chain_len"] = 2
    pdf["not_after"] = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    wave1 = pdf.iloc[:40].copy()
    wave1["entry_ts"] = t0
    wave2 = pdf.iloc[40:].copy()
    wave2["entry_ts"] = t0 + dt.timedelta(hours=12)
    dup = wave1.iloc[[0]].copy()  # same (exp bucket, issuer, serial) key
    dup["entry_id"] = 10_000
    dup["entry_ts"] = t0  # far below the advanced watermark

    from ct_mapreduce_spark.schemas import CERTIFICATES

    def _append(wave_pdf):
        spark.createDataFrame(wave_pdf, schema=CERTIFICATES).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct file mtimes => deterministic batch order

    _append(wave1)
    _append(wave2)
    _append(dup)

    stream = read_cert_stream(spark, src, max_files_per_trigger=1)
    deduped = streaming_ingest(stream, now=NOW, watermark_delay="1 hour")
    q = start_ingest_query(deduped, store, ckpt)
    q.processAllAvailable()
    progresses = [p for p in q.recentProgress if p and p["numInputRows"] > 0]
    q.stop()

    got = spark.read.parquet(store)
    keys = ["exp_date", "issuer_id", "serial"]
    # The late duplicate added no row: every key appears exactly once.
    assert got.count() == got.select(*keys).distinct().count()
    dup_key_rows = got.where(
        (F.col("serial") == bytes(dup["serial"].iloc[0]))
        & (F.col("issuer_id") == dup["issuer_id"].iloc[0])
    )
    assert dup_key_rows.count() == 1

    # State is bounded: after the watermark passed wave 1, its keys were
    # evicted, so the final batch's state rows < total distinct keys.
    total_keys = got.count()
    final_state = progresses[-1]["stateOperators"][0]
    assert final_state["numRowsTotal"] < total_keys, (
        final_state,
        total_keys,
    )
    # And eviction actually happened at some point (rows removed from state).
    assert any(
        so["numRowsRemoved"] > 0
        for p in progresses
        for so in p["stateOperators"]
    ), [p["stateOperators"] for p in progresses]


def test_ttl_first_seen_evicts_at_bucket_expiry(spark, tmp_path):
    """Custom stateful dedup (applyInPandasWithState): state for a bucket
    is dropped when the watermark passes the BUCKET EXPIRY (data-derived,
    the reference's EXPIREAT contract) — not a fixed delay after last
    arrival. After eviction a re-arrival is 'unknown' again and re-emits,
    exactly like a fresh SADD once the Redis set evaporated
    (knowncertificates_test.go:85-110)."""
    import time

    import pandas as pd
    from pyspark.sql import types as T

    from ct_mapreduce_spark.streaming.stateful import (
        cert_bucket_expiry,
        ttl_first_seen,
    )

    schema = T.StructType(
        [
            T.StructField("exp_date", T.StringType()),
            T.StructField("issuer_id", T.StringType()),
            T.StructField("serial", T.BinaryType()),
            T.StructField("entry_id", T.LongType()),
            T.StructField("entry_ts", T.TimestampType()),
        ]
    )
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m, tzinfo=dt.timezone.utc)
    # Bucket A expires at 07:00. Wave 2 advances the watermark past it;
    # wave 3 gives bucket A an input-free batch so its event-time timeout
    # fires (timeouts only trigger for groups without data in the batch);
    # wave 4 then replays a bucket-A serial with a fresh (non-late)
    # entry_ts.
    waves = [
        [("2024-01-01-06", "iss1", b"\x01", 1, t(5)),
         ("2024-01-01-06", "iss1", b"\x02", 2, t(5, 1)),
         ("2024-01-01-06", "iss1", b"\x01", 3, t(5, 2))],  # in-stream dup
        [("2024-01-20-00", "iss2", b"\x03", 4, t(10))],     # watermark -> 09:00
        [("2024-01-20-00", "iss2", b"\x04", 6, t(10, 5))],  # A times out here
        [("2024-01-01-06", "iss1", b"\x01", 5, t(10, 30))], # post-eviction replay
    ]
    src = str(tmp_path / "ttl_src")
    for w in waves:
        pdf = pd.DataFrame(
            w, columns=["exp_date", "issuer_id", "serial", "entry_id", "entry_ts"]
        )
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = ttl_first_seen(
        stream,
        keys=["exp_date", "issuer_id"],
        member_col="serial",
        expiry_fn=cert_bucket_expiry,
        watermark_col="entry_ts",
        watermark_delay="1 hour",
        carry_cols=["entry_id"],
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_out")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .start()
    )
    q.processAllAvailable()
    progresses = [p for p in q.recentProgress if p and p["numInputRows"] > 0]
    q.stop()

    rows = spark.sql("SELECT * FROM ttl_out ORDER BY entry_id").collect()
    got = [(r.exp_date, bytes(r.serial).hex(), r.entry_id) for r in rows]
    # Wave 1: 01 and 02 emitted once (entry 3 deduped). Wave 4: 01
    # re-emitted because bucket A's state was evicted at expiry.
    assert got == [
        ("2024-01-01-06", "01", 1),
        ("2024-01-01-06", "02", 2),
        ("2024-01-20-00", "03", 4),
        ("2024-01-01-06", "01", 5),
        ("2024-01-20-00", "04", 6),
    ], got
    assert any(
        so["numRowsRemoved"] > 0
        for p in progresses
        for so in p["stateOperators"]
    ), [p["stateOperators"] for p in progresses]


def test_ttl_first_seen_rocksdb_provider_parity(spark, tmp_path):
    """r13 (r12 verdict task 3): the RocksDB state store is the
    documented 100x lever for stateful-dedup state (DESIGN_NOTES — the
    HDFS default keeps every live seen-set on the JVM heap; RocksDB
    spills to executor-local disk). EXECUTE it: the same wave sequence
    as the eviction test must produce BIT-IDENTICAL emissions under
    both providers, with eviction still firing, and the rocksdb*
    custom metrics present (proving the provider served the state, not
    a silent fallback). Skips with the environment reason if this
    Spark build lacks the provider class."""
    import time

    import pandas as pd
    from pyspark.sql import types as T

    from ct_mapreduce_spark.streaming.stateful import (
        cert_bucket_expiry,
        ttl_first_seen,
    )

    schema = T.StructType(
        [
            T.StructField("exp_date", T.StringType()),
            T.StructField("issuer_id", T.StringType()),
            T.StructField("serial", T.BinaryType()),
            T.StructField("entry_id", T.LongType()),
            T.StructField("entry_ts", T.TimestampType()),
        ]
    )
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m, tzinfo=dt.timezone.utc)
    waves = [
        [("2024-01-01-06", "iss1", b"\x01", 1, t(5)),
         ("2024-01-01-06", "iss1", b"\x02", 2, t(5, 1)),
         ("2024-01-01-06", "iss1", b"\x01", 3, t(5, 2))],
        [("2024-01-20-00", "iss2", b"\x03", 4, t(10))],
        [("2024-01-20-00", "iss2", b"\x04", 6, t(10, 5))],
        [("2024-01-01-06", "iss1", b"\x01", 5, t(10, 30))],
    ]
    src = str(tmp_path / "ttl_rocks_src")
    for w in waves:
        pdf = pd.DataFrame(
            w,
            columns=["exp_date", "issuer_id", "serial", "entry_id", "entry_ts"],
        )
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    def run(provider_class: str | None, name: str):
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        if provider_class:
            spark.conf.set(key, provider_class)
        try:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = ttl_first_seen(
                stream,
                keys=["exp_date", "issuer_id"],
                member_col="serial",
                expiry_fn=cert_bucket_expiry,
                watermark_col="entry_ts",
                watermark_delay="1 hour",
                carry_cols=["entry_id"],
            )
            q = (
                out.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option(
                    "checkpointLocation", str(tmp_path / f"{name}_ckpt")
                )
                .start()
            )
            q.processAllAvailable()
            progs = [p for p in q.recentProgress if p and p["numInputRows"] > 0]
            q.stop()
        finally:
            if provider_class:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
        rows = spark.sql(f"SELECT * FROM {name} ORDER BY entry_id").collect()
        return (
            [(r.exp_date, bytes(r.serial).hex(), r.entry_id) for r in rows],
            progs,
        )

    rocksdb_class = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    default_got, _ = run(None, "ttl_default_out")
    try:
        rocks_got, rocks_progs = run(rocksdb_class, "ttl_rocks_out")
    except Exception as e:  # noqa: BLE001
        if "RocksDB" in str(e) or "ClassNotFound" in str(e):
            pytest.skip(f"RocksDB state store unavailable here: {e}")
        raise
    assert rocks_got == default_got, (rocks_got, default_got)
    assert any(
        so["numRowsRemoved"] > 0
        for p in rocks_progs
        for so in p["stateOperators"]
    ), [p["stateOperators"] for p in rocks_progs]
    last_so = rocks_progs[-1]["stateOperators"][0]
    assert any(
        k.startswith("rocksdb") for k in last_so.get("customMetrics", {})
    ), last_so


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
