"""/health endpoint for the streaming ingest daemon: the reference's
three-way contract (ct-fetch.go:567-608) — 503 + Retry-After before any
update, 200 while fresh, 500 once the most recent batch progress is older
than the staleness bound — served over real HTTP from live
StreamingQueryListener telemetry, and reachable through the CLI's
`fetch --follow --health-addr`."""

import datetime as dt
import sys
import time
import urllib.error
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ct_mapreduce_spark.sources.certificates import synthetic_certificates
from ct_mapreduce_spark.streaming.health import HealthServer
from ct_mapreduce_spark.streaming.telemetry import IngestTelemetryListener

NOW = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)


def _get(port: int, path: str = "/health") -> tuple[int, str]:
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10
        ) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_health_transitions_with_live_stream(spark, tmp_path):
    """503 (never updated) -> 200 (fresh) -> 500 (stale past the bound),
    against a real streaming query."""
    from ct_mapreduce_spark.sources.tables import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001").limit(100)
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)

    listener = IngestTelemetryListener()
    spark.streams.addListener(listener)
    health = HealthServer(listener, max_staleness_seconds=3600).start()
    tight = HealthServer(listener, max_staleness_seconds=0.05).start()
    try:
        code, body = _get(health.port)
        assert code == 503 and "no health updates yet" in body

        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            stream.groupBy("event_type").count()
            .writeStream.outputMode("complete")
            .format("memory").queryName("health_out").start()
        )
        q.processAllAvailable()
        q.stop()
        time.sleep(1)  # listener delivery is async

        code, body = _get(health.port)
        assert code == 200 and body.startswith("ok:")

        time.sleep(0.3)  # let the tight bound lapse
        code, body = _get(tight.port)
        assert code == 500 and "longer than the staleness bound" in body

        code, body = _get(health.port, "/metrics")
        assert code == 200 and "health_out" in body
        assert _get(health.port, "/nope")[0] == 404
    finally:
        health.stop()
        tight.stop()
        spark.streams.removeListener(listener)


def test_cli_follow_serves_health_and_ingests(spark, tmp_path):
    """End-to-end daemon: `fetch --follow --once --health-addr` ingests
    the landing zone through the streaming dedup pipeline, writes the
    partitioned store, and the health port answers while it runs."""
    import contextlib
    import io
    import re

    from ct_mapreduce_spark import cli

    src = str(tmp_path / "landing")
    synthetic_certificates(spark, n=800, seed=3).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    store = str(tmp_path / "store")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(
            [
                "fetch",
                "--source", src,
                "--store", store,
                "--follow", "--once",
                "--health-addr", "127.0.0.1:0",
                "--now", "2024-01-02T00:00:00",
            ],
            spark=spark,
        )
    assert rc == 0
    out = buf.getvalue()
    m = re.search(r"health endpoint: http://127\.0\.0\.1:(\d+)/health", out)
    assert m, out
    # the server was stopped with the daemon; the store must exist with
    # deduped rows partitioned by (exp_date, issuer_id)
    stored = spark.read.parquet(store)
    assert stored.count() > 0
    assert {"exp_date", "issuer_id"} <= set(stored.columns)


def test_parse_hostport_variants():
    """--health-addr accepts IPv4, hostname, bare-port, and bracketed
    IPv6 forms; brackets are stripped so getaddrinfo gets a bare
    address (a '[::1]' host aborts ThreadingHTTPServer at startup)."""
    from ct_mapreduce_spark.cli import parse_hostport

    assert parse_hostport("127.0.0.1:8080") == ("127.0.0.1", 8080)
    assert parse_hostport("myhost:9") == ("myhost", 9)
    assert parse_hostport(":8080") == ("127.0.0.1", 8080)
    assert parse_hostport("[::1]:8080") == ("::1", 8080)
    assert parse_hostport("[fe80::1%eth0]:443") == ("fe80::1%eth0", 443)


def test_statsd_emitter_wire_format(spark, tmp_path):
    """`fetch --follow --statsd-addr` pushes statsd datagrams whose wire
    format a real statsd server accepts: `key:value|c` / `key:value|g`
    lines, keys sanitized (no spaces/colons/pipes), counters as per-batch
    increments. Captured with a plain stdlib UDP socket — the same
    transport the reference's NewStatsdSink uses (engine/engine.go:55)."""
    import re
    import socket
    import threading

    from ct_mapreduce_spark import cli

    cap = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cap.bind(("127.0.0.1", 0))
    cap.settimeout(15)
    port = cap.getsockname()[1]
    grams: list[bytes] = []

    def drain():
        while True:
            try:
                grams.append(cap.recvfrom(65536)[0])
            except (socket.timeout, OSError):
                return

    t = threading.Thread(target=drain, daemon=True)
    t.start()

    src = str(tmp_path / "landing")
    synthetic_certificates(spark, n=400, seed=5).repartition(2).write.mode(
        "overwrite"
    ).parquet(src)
    store = str(tmp_path / "store")
    rc = cli.main(
        [
            "fetch",
            "--source", src,
            "--store", store,
            "--follow", "--once",
            "--statsd-addr", f"127.0.0.1:{port}",
            "--now", "2024-01-02T00:00:00",
        ],
        spark=spark,
    )
    assert rc == 0
    # wait for the async listener to flush at least one datagram (the
    # cli already blocks until sent() > 0 when a batch ran, so this is
    # belt-and-suspenders for the UDP hop itself)
    deadline = time.time() + 15
    while not grams and time.time() < deadline:
        time.sleep(0.1)
    cap.close()
    assert grams, "no statsd datagrams captured"

    lines = b"\n".join(grams).decode().splitlines()
    metric = re.compile(r"^ct-fetch\.[^ :|]+\.[a-z_]+:\d+(\.\d+)?\|[cg]$")
    assert all(metric.match(ln) for ln in lines), lines
    assert any(ln.endswith("|c") and ".batches:" in ln for ln in lines)
    assert any(".input_rows:" in ln for ln in lines)
    rows = sum(
        int(ln.split(":")[1].split("|")[0])
        for ln in lines
        if ".input_rows:" in ln
    )
    assert rows > 0  # counters carried the ingested volume


class _FakeProgressEvent:
    def __init__(self, qid, name, n):
        class _P:
            pass

        self.progress = _P()
        self.progress.id = qid
        self.progress.name = name
        self.progress.numInputRows = n


def test_rate_anomaly_tracker_matches_zscore_counts(spark):
    """The driver-side tracker must score the SAME z as the engine's
    zscore_counts over an identical single-key count sequence (same
    trailing window, warmup, (c-1) variance, 1.0 floor, rounding) —
    the pipeline monitor and the data-table monitor share one rule."""
    import datetime as _dt

    from ct_mapreduce_spark.operators.statistics import zscore_counts
    from ct_mapreduce_spark.streaming.telemetry import RateAnomalyTracker

    counts = [100, 104, 98, 101, 99, 103, 100, 97, 500, 101, 102, 12]
    t0 = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)
    frame = spark.createDataFrame(
        [
            ("q", t0 + _dt.timedelta(hours=i), n)
            for i, n in enumerate(counts)
        ],
        "key string, bucket_ts timestamp, n long",
    )
    want = {
        r["bucket_ts"]: (r["z_score"], r["is_anomaly"])
        for r in zscore_counts(
            frame, trailing=5, warmup=3, z_threshold=2.0
        ).collect()
    }
    tracker = RateAnomalyTracker(trailing=5, warmup=3, z_threshold=2.0)
    got = []
    for n in counts:
        tracker.onQueryProgress(_FakeProgressEvent("qid", "q", n))
        s = tracker.snapshot()["qid"]
        got.append((s["z_score"], s["is_anomaly"]))
    want_seq = [
        want[(t0 + _dt.timedelta(hours=i)).strftime("%Y-%m-%d %H:%M:%S")]
        for i in range(len(counts))
    ]
    assert got == want_seq
    # the spike (500 after a stable window) flagged, cold start not
    assert got[8][1] is True
    assert not any(f for _, f in got[:3])
    assert tracker.any_anomalous() in (True, False)  # live state probe


def test_rate_anomaly_tracker_evicts_on_terminate():
    """onQueryTerminated drops the query's history AND snapshot entry:
    a long-lived driver restarting streams (the daemons' compaction
    swaps do) must not accumulate per-query state forever, and /metrics
    must stop reporting rates for dead streams. A restarted stream gets
    a fresh id, so warmup re-arms (cold-start-is-healthy)."""
    from ct_mapreduce_spark.streaming.telemetry import RateAnomalyTracker

    class _Term:
        id = "qid"

    tracker = RateAnomalyTracker(trailing=5, warmup=3)
    for n in (100, 101, 99, 100):
        tracker.onQueryProgress(_FakeProgressEvent("qid", "q", n))
        tracker.onQueryProgress(_FakeProgressEvent("other", "q2", n))
    assert set(tracker.snapshot()) == {"qid", "other"}
    tracker.onQueryTerminated(_Term())
    assert set(tracker.snapshot()) == {"other"}  # only the dead one gone
    assert "qid" not in tracker._history and "other" in tracker._history
    # idempotent on a second terminate for the same id
    tracker.onQueryTerminated(_Term())
    assert set(tracker.snapshot()) == {"other"}


def test_metrics_exposes_rate_anomaly(spark, tmp_path):
    """/metrics with a RateAnomalyTracker attached: each query's entry
    gains the rate_anomaly object (the composed fetch+monitor loop)."""
    import json as _json

    from ct_mapreduce_spark.sources.tables import load_table
    from ct_mapreduce_spark.streaming.telemetry import RateAnomalyTracker

    ev = load_table(spark, "events", "/root/testdata/sf0.001").limit(50)
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)

    listener = IngestTelemetryListener()
    tracker = RateAnomalyTracker()
    spark.streams.addListener(listener)
    spark.streams.addListener(tracker)
    health = HealthServer(
        listener, max_staleness_seconds=3600, anomaly=tracker
    ).start()
    try:
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            stream.groupBy("event_type").count()
            .writeStream.outputMode("complete")
            .format("memory").queryName("anomaly_out").start()
        )
        q.processAllAvailable()
        # scrape while the query is LIVE: the r9 tracker evicts state on
        # onQueryTerminated (dead streams must not report rates), so the
        # stop goes after the /metrics read. Listener delivery is async
        # and can lag under load: poll until the tracker observed the
        # query (bounded wait).
        deadline = time.monotonic() + 30
        while not tracker.snapshot() and time.monotonic() < deadline:
            time.sleep(0.2)

        code, body = _get(health.port, "/metrics")
        assert code == 200
        snap = _json.loads(body)
        ours = [
            v for v in snap.values() if v.get("name") == "anomaly_out"
        ]
        assert ours and "rate_anomaly" in ours[0], snap
        ra = ours[0]["rate_anomaly"]
        assert set(ra) >= {"n", "z_score", "is_anomaly", "n_observed"}
        assert ra["is_anomaly"] is False  # cold start: never anomalous

        q.stop()
        # eviction end-to-end: once the query terminates, /metrics stops
        # reporting a rate for it (poll: termination event is async too)
        deadline = time.monotonic() + 30
        while tracker.snapshot() and time.monotonic() < deadline:
            time.sleep(0.2)
        assert not tracker.snapshot(), tracker.snapshot()
    finally:
        health.stop()
        spark.streams.removeListener(tracker)
        spark.streams.removeListener(listener)
