"""HTTP /health endpoint for the streaming ingest daemon.

The reference's ct-fetch serves /health from a goroutine next to the sync
engine (cmd/ct-fetch/ct-fetch.go:567-608): 503 + Retry-After while no
update has ever been observed, 500 once the most recent update is older
than the staleness bound (2 x pollingDelayMean there), 200 otherwise.
This restates that contract over the engine's StreamingQueryListener
telemetry: the "update timestamp" is the most recent batch progress
across tracked queries, and the bound is the caller's
max_staleness_seconds (daemon callers pass 2 x their trigger interval).

Stdlib-only (ThreadingHTTPServer in a daemon thread); /metrics serves the
listener's full JSON snapshot as a bonus probe surface.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ct_mapreduce_spark.streaming.telemetry import IngestTelemetryListener


class HealthServer:
    """Serve /health (reference status contract) and /metrics for a
    telemetry listener. start() binds and serves on a daemon thread;
    stop() shuts the socket down. `port` after start() reports the bound
    port (pass port=0 to let the OS pick — the test-friendly default)."""

    def __init__(
        self,
        listener: IngestTelemetryListener,
        max_staleness_seconds: float,
        host: str = "127.0.0.1",
        port: int = 0,
        anomaly=None,
    ) -> None:
        """`anomaly`: optional telemetry.RateAnomalyTracker — when given,
        each query's /metrics entry gains a `rate_anomaly` object
        (n, z_score, is_anomaly, n_observed) so the scrape that watches
        staleness also sees per-trigger rate anomalies (the composed
        fetch+monitor loop of `cli fetch --follow`)."""
        self.listener = listener
        self.max_staleness_seconds = max_staleness_seconds
        self.anomaly = anomaly
        self._host, self._port = host, port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- status logic (pure, independently testable) --------------------

    def status(self) -> tuple[int, str]:
        """(http_code, body) per the reference's three-way rule."""
        last = None
        for s in self.listener.metrics().values():
            t = s.get("last_progress_at")
            if t is not None and (last is None or t > last):
                last = t
        if last is None:
            return 503, "error: no health updates yet, Retry-After 30 seconds"
        age = (dt.datetime.now(dt.timezone.utc) - last).total_seconds()
        bound = self.max_staleness_seconds
        if age > bound:
            return 500, (
                f"error: {age:.1f}s since last update, which is longer "
                f"than the staleness bound ({bound:.1f}s)"
            )
        return 200, (
            f"ok: {age:.1f}s since last update, which is shorter than "
            f"the staleness bound ({bound:.1f}s)"
        )

    # -- server plumbing -------------------------------------------------

    def start(self) -> "HealthServer":
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - stdlib naming
                if self.path.split("?")[0] == "/health":
                    code, body = outer.status()
                    payload = body.encode()
                    self.send_response(code)
                    if code == 503:
                        self.send_header("Retry-After", "30")
                    self.send_header("Content-Type", "text/plain")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                elif self.path.split("?")[0] == "/metrics":
                    snap = {
                        str(k): {  # query ids may be UUID objects
                            **v,
                            "last_progress_at": (
                                v["last_progress_at"].isoformat()
                                if v.get("last_progress_at")
                                else None
                            ),
                        }
                        for k, v in outer.listener.metrics().items()
                    }
                    if outer.anomaly is not None:
                        rates = outer.anomaly.snapshot()
                        for k in snap:
                            if k in rates:
                                snap[k]["rate_anomaly"] = rates[k]
                    payload = json.dumps(snap).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                else:
                    self.send_error(404)

            def log_message(self, *args):  # keep daemon logs clean
                pass

        self._server = ThreadingHTTPServer((self._host, self._port), _Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        if self._server is None:
            raise RuntimeError("not started")
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
