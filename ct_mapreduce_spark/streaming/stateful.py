"""Custom stateful streaming operators (applyInPandasWithState).

The built-in `dropDuplicatesWithinWatermark` TTLs dedup state a fixed
delay after a key's LAST arrival. The reference instead expires state at
the data-derived bucket expiry instant — `EXPIREAT serials::<expDate>::
<issuer> <expiry>` (storage/knowncertificates.go:98-104, rediscache.go:
116-125) — so a bucket's memory cost is bounded by its remaining
lifetime, not by arrival patterns. This module reproduces that contract
with a grouped-state operator: per (bucket, …) key, a set of seen member
identities plus an event-time timeout pinned to the bucket's expiry.

At 100 TB the state store shards by the group key across executors
(hash-partitioned exchange — same clustering the reference got from
Redis key hashing), each group's state is O(distinct members in one
bucket), and eviction is driven by the watermark passing the bucket
expiry — no scan-and-delete pass.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.StringType()), True)]
)


def _canon(v: Any) -> str:
    """Canonical string identity for a dedup member (binary-safe)."""
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def cert_bucket_expiry(key: tuple) -> dt.datetime:
    """Expiry instant of a cert dedup bucket: the (exp_date hour-bucket)
    end — key[0] is the 'yyyy-MM-dd-HH' exp_date string (types.go:339-346:
    the bucket covers [hour, hour+1h))."""
    start = dt.datetime.strptime(key[0], "%Y-%m-%d-%H").replace(
        tzinfo=dt.timezone.utc
    )
    return start + dt.timedelta(hours=1)


def day_bucket_expiry(key: tuple) -> dt.datetime:
    """Expiry for day-bucketed keys: key[0] is 'yyyy-MM-dd'."""
    start = dt.datetime.strptime(key[0], "%Y-%m-%d").replace(
        tzinfo=dt.timezone.utc
    )
    return start + dt.timedelta(days=1)


def ttl_first_seen(
    stream: DataFrame,
    keys: list[str],
    member_col: str,
    expiry_fn: Callable[[tuple], dt.datetime],
    watermark_col: str,
    watermark_delay: str = "1 hour",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """First-seen dedup with data-time state TTL (WasUnknown + EXPIREAT,
    knowncertificates.go:36-55,98-104).

    Emits each (keys..., member) exactly once while the key's bucket is
    live; state for a group is dropped when the event-time watermark
    passes `expiry_fn(key)` (clamped just above the current watermark if
    the bucket is already expired — Spark requires future timeouts).
    Rows arriving after eviction are either dropped as late (below the
    watermark) or treated as new — the same observable behavior as the
    reference after its Redis set evaporates.

    carry_cols ride along on the first-seen row (arrival order within a
    micro-batch, like the reference's thread arrival order).
    """
    carry = list(carry_cols or [])
    cols = keys + [member_col] + carry
    in_fields = {f.name: f for f in stream.schema.fields}
    out_schema = T.StructType([in_fields[c] for c in cols])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (seen_list,) = state.get if state.exists else ([],)
        seen = set(seen_list or [])
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            ids = pdf[member_col].map(_canon)
            fresh_mask = ~ids.isin(seen) & ~ids.duplicated(keep="first")
            fresh = pdf.loc[fresh_mask, cols]
            if not fresh.empty:
                out.append(fresh)
                seen.update(ids[fresh_mask])
        state.update((sorted(seen),))
        expiry_ms = int(expiry_fn(key).timestamp() * 1000)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(expiry_ms, wm_ms + 1))
        for pdf in out:
            yield pdf

    return (
        stream.withWatermark(watermark_col, watermark_delay)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
