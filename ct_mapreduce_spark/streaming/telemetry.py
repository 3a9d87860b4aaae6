"""Streaming telemetry (SURVEY §2.8 T6): the reference dumps counters every
statsRefreshPeriod and serves a health endpoint whose staleness bound is
2 x pollingDelayMean (telemetry/telemetry.go:37-87, ct-fetch.go:567-608).

Spark equivalent: a StreamingQueryListener collecting per-batch progress,
plus a staleness predicate over the last progress timestamp.
"""

from __future__ import annotations

import datetime as dt
import json
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
