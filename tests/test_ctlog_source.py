"""Custom "ctlog" data source: ranged batch scan (S1), resumable
streaming cursor following a growing tree head (S1+S2+T2)."""

from __future__ import annotations

import json

import pytest

from ct_mapreduce_spark.sources.ctlog_source import CTLogDataSource


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(CTLogDataSource)


def test_batch_ranged_scan_partitions(spark):
    df = (
        spark.read.format("ctlog")
        .option("tree_size", 2500)
        .option("batch_size", 1000)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # ceil(2500/1000) ranged fetches
    rows = df.collect()
    assert len(rows) == 2500
    assert sorted(r.entry_id for r in rows) == list(range(2500))
    # deterministic payloads: re-read equals first read
    again = spark.read.format("ctlog").option("tree_size", 2500).load().collect()
    assert {(r.entry_id, bytes(r.serial)) for r in rows} == {
        (r.entry_id, bytes(r.serial)) for r in again
    }


def test_batch_offset_limit(spark):
    """--offset/--limit bound the scan range source-side
    (ct-fetch.go:288-305)."""
    df = (
        spark.read.format("ctlog")
        .option("tree_size", 5000)
        .option("offset", 1200)
        .option("limit", 2200)
        .load()
    )
    ids = sorted(r.entry_id for r in df.select("entry_id").collect())
    # limit is a count from offset (ct-fetch.go:303-305): [1200, 3400)
    assert ids == list(range(1200, 3400))


def test_stream_reader_rows_are_picklable_for_recovery():
    """Both the prefetch path (read) and the crash-recovery replay path
    (readBetweenOffsets) hand rows to a pickling wrapper; generators
    would fail there, and the recovery path only executes after a crash
    — assert picklability directly so the failure can't hide."""
    import pickle

    from ct_mapreduce_spark.sources.ctlog_source import CTLogStreamReader

    r = CTLogStreamReader({"log_url": "ct.example/log0", "tree_size": "30"})
    it, end = r.read({"index": 0})
    assert end == {"index": 30}
    rows_a = list(pickle.loads(pickle.dumps(it)))
    replay = r.readBetweenOffsets({"index": 0}, {"index": 30})
    rows_b = list(pickle.loads(pickle.dumps(replay)))
    assert rows_a == rows_b and len(rows_a) == 30


def test_end_to_end_daemon_from_ctlog_source(spark, tmp_path):
    """The full ct-fetch daemon off the custom connector: ctlog stream
    (emit=certs) -> filters -> watermarked stateful dedup -> partitioned
    store, then tree growth + restart-from-checkpoint. The store must
    hold exactly the distinct non-filtered keys of the final range —
    dedup, growth, and resume all exercised through one pipeline."""
    import datetime as dt
    import json as _json

    from ct_mapreduce_spark.plans.ingest import ingest_batch
    from ct_mapreduce_spark.streaming.ingest_stream import (
        start_ingest_query,
        streaming_ingest,
    )

    now = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)
    sth = tmp_path / "sth.json"
    sth.write_text(_json.dumps({"tree_size": 300}))
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.format("ctlog")
            .option("sth_path", str(sth))
            .option("emit", "certs")
            .option("max_entries_per_trigger", 100)
            .load()
        )
        return start_ingest_query(
            streaming_ingest(stream, now=now, watermark_delay="3650 days"),
            store,
            ckpt,
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    # the log grows; a NEW query resumes from the checkpoint
    sth.write_text(_json.dumps({"tree_size": 450}))
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(store)
    # batch replay of the same final range is the ground truth
    batch = (
        spark.read.format("ctlog")
        .option("tree_size", 450)
        .option("emit", "certs")
        .load()
    )
    want = ingest_batch(batch, now=now).select(
        "exp_date", "issuer_id", "serial"
    )
    assert got.count() == want.distinct().count()
    assert (
        got.select("exp_date", "issuer_id", "serial").distinct().count()
        == got.count()
    )


def test_multi_log_union_stream(spark, tmp_path):
    """S3: one stream per log URL, unioned with the log_url column as the
    discriminator (ct-fetch.go:521-565's goroutine-per-log restated).
    Entries from both logs arrive; per-log payloads stay distinct."""
    def side(url):
        return (
            spark.readStream.format("ctlog")
            .option("log_url", url)
            .option("tree_size", 40)
            .load()
        )

    union = side("ct.example/log0").unionByName(side("ct.example/log1"))
    q = (
        union.writeStream.format("memory")
        .queryName("ctlog_union")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "u_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("ctlog_union").collect()
    by_log = {}
    for r in rows:
        by_log.setdefault(r.log_url, set()).add((r.entry_id, bytes(r.serial)))
    assert set(by_log) == {"ct.example/log0", "ct.example/log1"}
    assert all(len(v) == 40 for v in by_log.values())
    # same index, different log => different payload (log_url is salted in)
    s0 = dict(by_log["ct.example/log0"])
    s1 = dict(by_log["ct.example/log1"])
    assert all(s0[i] != s1[i] for i in range(40))


def test_stream_follows_growing_log_and_resumes(spark, tmp_path):
    """The streaming cursor advances to the tree head each trigger,
    observes growth (polling), and resumes from the checkpoint after a
    restart without duplicating entries (MaxEntry resume, T2)."""
    sth = tmp_path / "sth.json"
    sth.write_text(json.dumps({"tree_size": 50}))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start_query():
        # parquet sink: fault-tolerant, supports checkpoint recovery
        # (memory sink does not)
        return (
            spark.readStream.format("ctlog")
            .option("sth_path", str(sth))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    def ids_written():
        return sorted(
            r.entry_id for r in spark.read.parquet(out).select("entry_id").collect()
        )

    def wait_for(q, n, deadline=60.0):
        """processAllAvailable can race the tree-head growth under load:
        the trigger that observed the old head may still be committing.
        Poll until the sink holds [0, n)."""
        import time

        end = time.monotonic() + deadline
        while time.monotonic() < end:
            q.processAllAvailable()
            got = ids_written()
            if got == list(range(n)):
                return got
            time.sleep(0.5)
        return ids_written()

    q = start_query()
    assert wait_for(q, 50) == list(range(50))
    # the log grows; the same query observes the new entries
    sth.write_text(json.dumps({"tree_size": 80}))
    assert wait_for(q, 80) == list(range(80))
    q.stop()
    # restart against the same checkpoint: resumes at 80, no duplicates
    sth.write_text(json.dumps({"tree_size": 100}))
    q2 = start_query()
    got = wait_for(q2, 100)
    q2.stop()
    assert got == list(range(100)), (len(got), got[:5], got[-5:])
