"""HTTP transport for the ctlog source: ranged get-entries over a real
(stdlib) HTTP server, with the reference's jittered-exponential 429 retry
policy (ct-fetch.go:409-437) — 429s are retried under backoff until the
server relents, other statuses fail the fetch."""

import hashlib
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ct_mapreduce_spark.sources.ctlog_source import (
    Backoff,
    CTLogDataSource,
    _http_fetch_range,
)


def _entry(i: int) -> dict:
    d = hashlib.sha256(f"http-log:{i}".encode()).digest()
    return {
        "index": i,
        "ts_ms": 1_700_000_000_000 + i * 1000,
        "serial": d[:8].hex(),
        "issuer_id": f"issuer-{d[16] % 8}",
    }


class _CTHandler(BaseHTTPRequestHandler):
    """get-entries endpoint that 429s the first `reject_first` hits of
    each distinct range (per-server counters) before serving it."""

    def do_GET(self):  # noqa: N802 - stdlib naming
        u = urlparse(self.path)
        if u.path != "/ct/v1/get-entries":
            self.send_error(404)
            return
        q = parse_qs(u.query)
        start, end = int(q["start"][0]), int(q["end"][0])
        key = (start, end)
        srv = self.server
        with srv.lock:
            srv.hits[key] = srv.hits.get(key, 0) + 1
            n_hit = srv.hits[key]
        if n_hit <= srv.reject_first:
            self.send_response(429)
            self.end_headers()
            return
        body = json.dumps(
            {"entries": [_entry(i) for i in range(start, end + 1)]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture
def ct_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CTHandler)
    srv.lock = threading.Lock()
    srv.hits = {}
    srv.reject_first = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_backoff_policy_shape():
    """min 500 ms, factor 2, cap 5 min, jitter in [min, min*2^n), reset
    on success — the jpillora/backoff semantics the reference uses."""
    import random

    b = Backoff(rng=random.Random(0))
    d0, d1, d2 = (b.next_duration() for _ in range(3))
    assert 0.5 <= d0 <= 0.5  # attempt 0: cap == min, jitter adds nothing
    assert 0.5 <= d1 <= 1.0
    assert 0.5 <= d2 <= 2.0
    for _ in range(20):
        assert b.next_duration() <= 300.0  # the 5-minute cap
    b.reset()
    assert b.next_duration() == 0.5


def test_http_fetch_retries_429_until_success(ct_server):
    ct_server.reject_first = 3
    slept = []
    b = Backoff(min_s=0.01, max_s=0.05)
    rows = _http_fetch_range(
        f"http://127.0.0.1:{ct_server.server_address[1]}",
        "http-log",
        10,
        15,
        backoff=b,
        sleep=slept.append,
    )
    assert len(slept) == 3  # one backoff sleep per 429
    assert all(0.01 <= s <= 0.05 for s in slept)
    assert b.attempt == 0  # reset on success
    assert [r[0] for r in rows] == list(range(10, 15))
    assert all(r[1] == "http-log" for r in rows)


def test_http_fetch_non_429_raises(ct_server):
    with pytest.raises(RuntimeError, match="HTTP 404"):
        _http_fetch_range(
            f"http://127.0.0.1:{ct_server.server_address[1]}/nope",
            "http-log",
            0,
            5,
        )


def test_spark_batch_read_over_http(spark, ct_server):
    """End-to-end: executors fetch ranges over the wire; 429 injection on
    every range exercises the backoff inside worker processes."""
    ct_server.reject_first = 1
    spark.dataSource.register(CTLogDataSource)
    df = (
        spark.read.format("ctlog")
        .option("transport", "http")
        .option(
            "base_url", f"http://127.0.0.1:{ct_server.server_address[1]}"
        )
        .option("backoff_min_ms", 10)
        .option("backoff_max_ms", 50)
        .option("log_url", "http-log")
        .option("tree_size", 2500)
        .option("offset", 100)
        .option("batch_size", 1000)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 2400
    assert {r.entry_id for r in rows} == set(range(100, 2500))
    # every ranged RPC got 429'd once and succeeded on retry
    assert all(n >= 2 for n in ct_server.hits.values())
    d = hashlib.sha256(b"http-log:100").digest()
    first = next(r for r in rows if r.entry_id == 100)
    assert bytes(first.serial) == d[:8]
    assert first.issuer_id == f"issuer-{d[16] % 8}"


def test_spark_streaming_read_over_http(spark, ct_server, tmp_path):
    """The streaming reader shares the HTTP fetcher seam: micro-batches
    fetch ranged get-entries over the wire (429s retried) and the
    tree-head growth loop still applies."""
    import json as _json

    sth = tmp_path / "sth.json"
    sth.write_text(_json.dumps({"tree_size": 1500}))
    ct_server.reject_first = 1
    spark.dataSource.register(CTLogDataSource)
    stream = (
        spark.readStream.format("ctlog")
        .option("transport", "http")
        .option("base_url", f"http://127.0.0.1:{ct_server.server_address[1]}")
        .option("backoff_min_ms", 10)
        .option("backoff_max_ms", 50)
        .option("log_url", "http-log")
        .option("sth_path", str(sth))
        .option("max_entries_per_trigger", 600)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("http_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    # the log grows; the next trigger must observe the new tree head
    sth.write_text(_json.dumps({"tree_size": 2000}))
    q.processAllAvailable()
    q.stop()
    rows = spark.table("http_stream").collect()
    assert {r.entry_id for r in rows} == set(range(0, 2000))
