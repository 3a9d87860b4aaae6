"""Custom Spark data source for CT-log-style ranged scans ("ctlog").

Closes the S1 gap (SURVEY §2.1): the reference's log scanner pulls
entries in 1000-entry ranged RPCs up to the signed tree head, resumes
from a saved cursor, and polls for growth (cmd/ct-fetch/ct-fetch.go:
398-488 downloadCTRangeToChannel; batch size 1000 at :417; resume range
calc :288-305). This restates that protocol on Spark's public Python
Data Source API (pyspark.sql.datasource, Spark 4):

- batch: `spark.read.format("ctlog")` — the scan range [offset,
  tree_size) splits into `batch_size` InputPartitions, one per ranged
  "RPC", so range fetches parallelize across the cluster exactly like
  the reference's per-log worker loop, but scheduled by Spark.
- streaming: `spark.readStream.format("ctlog")` — a
  SimpleDataSourceStreamReader whose offset is the entry index; each
  micro-batch reads [cursor, min(tree_size, cursor + max_per_trigger)).
  The tree head is re-read from `sth_path` every trigger, so a growing
  log is followed (the reference's polling loop); Spark's checkpoint
  persists the cursor (the reference's saveState/MaxEntry, T2).

The "network" is simulated: entry payloads are a deterministic function
of (log_url, index) — the transport is not the point; the ranged/
resumable/backpressured scan protocol is. A real HTTP transport slots
into `_fetch_range` without touching the Spark surface.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "entry_id long, log_url string, entry_ts timestamp, serial binary, "
    "issuer_id string"
)

# option emit=certs: full parsed-certificate rows (the post-P4 shape the
# ingest pipeline consumes) so the whole ct-fetch daemon can run off this
# source end-to-end. Matches schemas.CERTIFICATES.
CERT_SCHEMA = (
    "log_url string, entry_id long, entry_type string, entry_ts timestamp, "
    "raw_der binary, serial binary, issuer_id string, issuer_dn string, "
    "issuer_cn string, issuer_spki binary, skid binary, subject_cn string, "
    "not_before timestamp, not_after timestamp, is_ca boolean, "
    "basic_constraints_valid boolean, crl_dps array<string>, chain_len int"
)

DEFAULT_BATCH = 1000  # entries per ranged fetch (ct-fetch.go:417)


def _fetch_range(
    log_url: str, start: int, end: int, emit: str = "entries"
) -> Iterator[tuple]:
    """One ranged 'RPC': yield entries [start, end). Deterministic
    synthetic payloads stand in for the HTTP transport."""
    import datetime as dt

    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for i in range(start, end):
        d = hashlib.sha256(f"{log_url}:{i}".encode()).digest()
        serial = d[: 8 + i % 9]  # 8-16 byte serials
        issuer = f"issuer-{d[16] % 8}"
        if emit == "entries":
            yield (i, log_url, epoch + dt.timedelta(seconds=i), serial, issuer)
            continue
        spki = hashlib.sha256(issuer.encode()).digest()
        not_after = epoch + dt.timedelta(days=365, hours=d[17] % 48)
        yield (
            log_url,
            i,
            "precert" if d[18] % 10 == 0 else "x509",
            epoch + dt.timedelta(seconds=i),
            d * 2,                      # raw_der stand-in
            serial,
            issuer,
            f"CN={issuer}",
            f"{issuer} CA",
            spki,
            spki[:20] if d[19] % 7 else spki[:4],  # some short SKIDs
            f"host{i}.example.com",
            not_after - dt.timedelta(days=365),
            not_after,
            d[20] % 20 == 0,            # ~5% CA
            d[21] % 20 != 0,
            ["http://crl.example.com/root.crl"] if d[22] % 3 else [],
            0 if d[23] % 101 == 0 else 1 + d[23] % 3,
        )


DEFAULT_BACKOFF_MIN_S = 0.5  # ct-fetch.go:409-413 (Min: 500ms)
DEFAULT_BACKOFF_MAX_S = 300.0  # (Max: 5 minutes)


class Backoff:
    """Jittered exponential backoff with reset-on-success — the retry
    policy of the reference's 429 loop (cmd/ct-fetch/ct-fetch.go:409-437,
    jpillora/backoff semantics: duration(attempt) = min * factor^attempt
    capped at max; jitter draws uniformly between min and that)."""

    def __init__(
        self,
        min_s: float = DEFAULT_BACKOFF_MIN_S,
        max_s: float = DEFAULT_BACKOFF_MAX_S,
        factor: float = 2.0,
        rng=None,
    ):
        import random

        self.min_s, self.max_s, self.factor = min_s, max_s, factor
        self.attempt = 0
        self._rng = rng or random.Random()

    def next_duration(self) -> float:
        cap = min(self.max_s, self.min_s * self.factor**self.attempt)
        self.attempt += 1
        return self.min_s + self._rng.random() * max(0.0, cap - self.min_s)

    def reset(self) -> None:
        self.attempt = 0


def _http_fetch_range(
    base_url: str,
    log_url: str,
    start: int,
    end: int,
    backoff: Backoff | None = None,
    timeout_s: float = 30.0,
    sleep=None,
) -> list[tuple]:
    """One ranged fetch over real HTTP: GET
    {base_url}/ct/v1/get-entries?start=S&end=E-1 (inclusive end, the CT
    API convention). 429 responses retry forever under jittered
    exponential backoff with reset-on-success; any other failure raises
    (Spark's task retry is the outer loop, like the reference returning
    the error to its caller). JSON body: {"entries": [{"index", "ts_ms",
    "serial" (hex), "issuer_id"}]}."""
    import datetime as dt
    import json as _json
    import time
    import urllib.error
    import urllib.request

    backoff = backoff or Backoff()
    sleep = sleep or time.sleep
    url = f"{base_url}/ct/v1/get-entries?start={start}&end={end - 1}"
    while True:
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:
                body = _json.loads(resp.read().decode("utf-8"))
            backoff.reset()
            break
        except urllib.error.HTTPError as e:
            if e.code == 429:
                sleep(backoff.next_duration())
                continue
            raise RuntimeError(f"get-entries failed: HTTP {e.code}") from e
    out = []
    for entry in body["entries"]:
        out.append(
            (
                int(entry["index"]),
                log_url,
                dt.datetime.fromtimestamp(
                    entry["ts_ms"] / 1000.0, tz=dt.timezone.utc
                ),
                bytes.fromhex(entry["serial"]),
                entry["issuer_id"],
            )
        )
    return out


def _make_fetcher(options: dict):
    """Transport seam: returns `(log_url, start, end, emit) -> rows`.
    transport=synthetic (default) keeps the deterministic in-process
    payloads; transport=http fetches over the wire with the reference's
    429 backoff policy. Reads option knobs eagerly so the returned
    closure ships to executors without the options dict."""
    if options.get("transport", "synthetic") != "http":
        return _fetch_range
    base_url = options["base_url"]
    min_s = float(options.get("backoff_min_ms", DEFAULT_BACKOFF_MIN_S * 1000)) / 1000
    max_s = float(options.get("backoff_max_ms", DEFAULT_BACKOFF_MAX_S * 1000)) / 1000

    def fetch(log_url: str, start: int, end: int, emit: str = "entries"):
        if emit != "entries":
            raise ValueError("transport=http supports emit=entries only")
        # iter(): the batch reader contract wants an iterator; a list
        # iterator also satisfies the stream reader's pickle requirement
        return iter(
            _http_fetch_range(base_url, log_url, start, end, Backoff(min_s, max_s))
        )

    return fetch


def _read_tree_size(options: dict) -> int:
    """Tree head: explicit option wins; else read the sth JSON (the
    GetSTH analog — re-read per call so a growing log is observed)."""
    if "tree_size" in options:
        return int(options["tree_size"])
    sth_path = options.get("sth_path")
    if sth_path and os.path.exists(sth_path):
        with open(sth_path) as f:
            return int(json.load(f)["tree_size"])
    return 0


class _RangePartition(InputPartition):
    def __init__(self, log_url: str, start: int, end: int):
        self.log_url = log_url
        self.start = start
        self.end = end


class CTLogBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self):
        log_url = self.options.get("log_url", "ct.example/log0")
        batch = int(self.options.get("batch_size", DEFAULT_BATCH))
        start = int(self.options.get("offset", 0))
        end = _read_tree_size(self.options)
        if "limit" in self.options:
            # limit is a COUNT from offset (endPos = startPos + limit,
            # ct-fetch.go:303-305), not an absolute end entry id
            end = min(end, start + int(self.options["limit"]))
        return [
            _RangePartition(log_url, s, min(s + batch, end))
            for s in range(start, end, batch)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _make_fetcher(self.options)(
            partition.log_url,
            partition.start,
            partition.end,
            self.options.get("emit", "entries"),
        )


class CTLogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = options

    def initialOffset(self) -> dict:
        return {"index": int(self.options.get("offset", 0))}

    def read(self, start: dict):
        log_url = self.options.get("log_url", "ct.example/log0")
        cap = int(self.options.get("max_entries_per_trigger", 10 * DEFAULT_BATCH))
        lo = start["index"]
        hi = min(_read_tree_size(self.options), lo + cap)
        if hi <= lo:
            return iter([]), start
        # A list ITERATOR, not a generator: the simple stream reader's
        # rows are prefetched driver-side, cached, and pickled into the
        # planned batch — generators don't pickle, list iterators do.
        # The max_entries_per_trigger cap bounds the prefetch (the 16Ki
        # channel-capacity analog, ct-fetch.go:132).
        emit = self.options.get("emit", "entries")
        fetch = _make_fetcher(self.options)
        return iter(list(fetch(log_url, lo, hi, emit))), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Deterministic replay for recovery: same range, same rows. Runs
        # only when a batch was planned but not committed before a crash
        # — and its rows go through the same pickle path as read(), so
        # materialize to a list iterator here too (a generator would fail
        # exactly and only during crash recovery).
        log_url = self.options.get("log_url", "ct.example/log0")
        return iter(
            list(
                _make_fetcher(self.options)(
                    log_url,
                    start["index"],
                    end["index"],
                    self.options.get("emit", "entries"),
                )
            )
        )


class CTLogDataSource(DataSource):
    """`spark.dataSource.register(CTLogDataSource)` then
    `spark.read.format("ctlog").option(...)`. Options: log_url,
    tree_size | sth_path, offset, limit, batch_size (batch),
    max_entries_per_trigger (streaming), emit=entries|certs (certs =
    full parsed-certificate rows for end-to-end ingest),
    transport=synthetic|http (+ base_url, backoff_min_ms,
    backoff_max_ms: ranged fetches over real HTTP with the reference's
    jittered-exponential 429 retry policy, ct-fetch.go:409-437)."""

    @classmethod
    def name(cls) -> str:
        return "ctlog"

    def schema(self) -> str:
        return CERT_SCHEMA if self.options.get("emit") == "certs" else SCHEMA

    def reader(self, schema) -> CTLogBatchReader:
        return CTLogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> CTLogStreamReader:
        return CTLogStreamReader(self.options)
