"""Streaming telemetry (SURVEY §2.8 T6): the reference dumps counters every
statsRefreshPeriod and serves a health endpoint whose staleness bound is
2 x pollingDelayMean (telemetry/telemetry.go:37-87, ct-fetch.go:567-608).
When statsdHost/statsdPort are configured it instead pushes metrics to a
statsd server over UDP (engine/engine.go:50-68, config/config.go:200-201).

Spark equivalents: a StreamingQueryListener collecting per-batch progress,
plus a staleness predicate over the last progress timestamp; and
StatsdEmitter, a second listener that fires statsd counter/gauge datagrams
per batch (stdlib socket only — the wire format is plain text).
"""

from __future__ import annotations

import datetime as dt
import json
import socket
import threading

from pyspark.sql.streaming import StreamingQueryListener


class IngestTelemetryListener(StreamingQueryListener):
    """Collects rows/sec and batch counts per query; thread-safe snapshot
    via metrics(). The analog of the reference's in-memory metrics dumper
    (engine/engine.go:71-85)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._stats: dict[str, dict] = {}

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._stats[event.id] = {
                "name": event.name,
                "n_batches": 0,
                "n_rows": 0,
                "last_progress_at": None,
            }

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            s = self._stats.setdefault(
                p.id, {"name": p.name, "n_batches": 0, "n_rows": 0, "last_progress_at": None}
            )
            s["n_batches"] += 1
            s["n_rows"] += p.numInputRows or 0
            s["last_progress_at"] = dt.datetime.now(dt.timezone.utc)

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def metrics(self) -> dict[str, dict]:
        with self._lock:
            return {k: dict(v) for k, v in self._stats.items()}

    def is_healthy(self, max_staleness_seconds: float) -> bool:
        """Health = every tracked query progressed within the bound — the
        reference's `2 x pollingDelayMean` staleness rule
        (ct-fetch.go:582-583)."""
        now = dt.datetime.now(dt.timezone.utc)
        with self._lock:
            for s in self._stats.values():
                t = s["last_progress_at"]
                if t is None or (now - t).total_seconds() > max_staleness_seconds:
                    return False
            return bool(self._stats)


class RateAnomalyTracker(StreamingQueryListener):
    """Per-trigger rate-anomaly detection over the ingest stream's OWN
    input rates — the operational loop the reference runs as fetch +
    health (ct-fetch.go:567-597), composed with the engine's anomaly
    rule: the z-score semantics of operators/statistics.py:zscore_counts
    (trailing-window mean/std, warmup, never-anomalous cold start,
    variance floored at 1.0) applied driver-side to the listener's
    per-batch numInputRows history, which is model-sized by construction
    (bounded deque per query). The batch-table twin (ev_rate_anomaly /
    streaming/rate_stream.py) guards DATA tables; this guards the
    pipeline itself, surfaced through the /metrics endpoint so the
    pager that polls /health sees rate anomalies in the same scrape."""

    def __init__(
        self,
        trailing: int = 24,
        warmup: int = 12,
        z_threshold: float = 3.0,
    ) -> None:
        self._lock = threading.Lock()
        self._trailing = int(trailing)
        self._warmup = int(warmup)
        self._z = float(z_threshold)
        self._history: dict[str, list[int]] = {}
        self._state: dict[str, dict] = {}

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        p = event.progress
        n = int(p.numInputRows or 0)
        with self._lock:
            hist = self._history.setdefault(p.id, [])
            trail = hist[-self._trailing :]
            c = len(trail)
            # same gates as zscore_counts: warmup AND c >= 2 (the
            # (c-1) variance divisor), cold start scores 0.0 / healthy
            if c >= max(self._warmup, 2):
                s1 = float(sum(trail))
                s2 = float(sum(x * x for x in trail))
                mean = s1 / c
                var = (s2 - s1 * s1 / c) / (c - 1)
                raw = (n - mean) / math.sqrt(max(var, 1.0))
                # Spark F.round is HALF_UP over the shortest decimal
                # repr; Python round() is half-even — mirror the engine
                z = float(
                    Decimal(repr(raw)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                )
            else:
                z = 0.0
            hist.append(n)
            del hist[: -self._trailing - 1]  # bound driver memory
            self._state[p.id] = {
                "name": p.name,
                "n": n,
                "z_score": z,
                "is_anomaly": abs(z) >= self._z,
                "n_observed": c,
            }

    def onQueryTerminated(self, event) -> None:
        # Evict the terminated query's history/state: a long-lived driver
        # restarting streams (the daemons do, per compaction swap) would
        # otherwise accumulate one history list per distinct query id
        # forever, and /metrics would keep reporting rates for dead
        # streams. Warmup re-arms on restart BECAUSE the history was
        # evicted here — not because the id changes: a stream resumed
        # from the same checkpoint keeps its query id (only runId is
        # fresh). Same cold-start-is-healthy posture as zscore_counts.
        with self._lock:
            qid = str(event.id)
            for d in (self._history, self._state):
                for k in [k for k in d if str(k) == qid]:
                    d.pop(k, None)

    def onQueryIdle(self, event) -> None:
        pass

    def snapshot(self) -> dict[str, dict]:
        with self._lock:
            return {str(k): dict(v) for k, v in self._state.items()}

    def any_anomalous(self) -> bool:
        with self._lock:
            return any(s["is_anomaly"] for s in self._state.values())


def _statsd_key(part: str) -> str:
    """Key sanitization per the reference's flattenLabels
    (telemetry/telemetry.go:90-100): spaces and colons become
    underscores; '|' and newlines too, since they delimit the statsd
    wire format itself."""
    for bad in (" ", ":", "|", "\n"):
        part = part.replace(bad, "_")
    return part


class StatsdEmitter(StreamingQueryListener):
    """Optional statsd sink for the ingest daemon, mirroring the
    reference's statsdHost/statsdPort mode (engine/engine.go:50-68): when
    configured, metrics go to a statsd server instead of the periodic
    stderr dump. Per query progress it emits one UDP datagram carrying

        <prefix>.<query>.batches:1|c
        <prefix>.<query>.input_rows:<n>|c
        <prefix>.<query>.rows_per_sec:<r>|g

    — counters as per-batch increments (statsd aggregates), throughput as
    a gauge. Fire-and-forget: UDP send errors are swallowed, exactly the
    posture a metrics sidecar needs (metrics must never take down
    ingest). Stdlib socket only."""

    def __init__(self, host: str, port: int, prefix: str = "ctspark") -> None:
        self._addr = (host, port)
        self._prefix = _statsd_key(prefix)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sent = 0

    def _emit(self, lines: list[str]) -> None:
        try:
            self._sock.sendto("\n".join(lines).encode("utf-8"), self._addr)
            self._sent += 1
        except OSError:
            pass

    def sent(self) -> int:
        """Datagrams successfully handed to the socket — lets a shutdown
        path bound its wait for the async listener bus to flush."""
        return self._sent

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        name = _statsd_key(p.name or str(p.id))
        lines = [
            f"{self._prefix}.{name}.batches:1|c",
            f"{self._prefix}.{name}.input_rows:{int(p.numInputRows or 0)}|c",
        ]
        rps = p.processedRowsPerSecond
        if rps is not None and rps == rps:  # skip None/NaN
            lines.append(f"{self._prefix}.{name}.rows_per_sec:{rps:.3f}|g")
        self._emit(lines)

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def close(self) -> None:
        self._sock.close()
