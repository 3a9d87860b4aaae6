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
        return _fetch_range(
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
        return iter(list(_fetch_range(log_url, lo, hi, emit))), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Deterministic replay for recovery: same range, same rows. Runs
        # only when a batch was planned but not committed before a crash
        # — and its rows go through the same pickle path as read(), so
        # materialize to a list iterator here too (a generator would fail
        # exactly and only during crash recovery).
        log_url = self.options.get("log_url", "ct.example/log0")
        return iter(
            list(
                _fetch_range(
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
    full parsed-certificate rows for end-to-end ingest)."""

    @classmethod
    def name(cls) -> str:
        return "ctlog"

    def schema(self) -> str:
        return CERT_SCHEMA if self.options.get("emit") == "certs" else SCHEMA

    def reader(self, schema) -> CTLogBatchReader:
        return CTLogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> CTLogStreamReader:
        return CTLogStreamReader(self.options)
