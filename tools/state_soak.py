#!/usr/bin/env python
"""State-store soak for the stateful dedup (r12, r11 verdict task 5).

ttl_first_seen (streaming/stateful.py) is correct and eviction-tested at
toy key counts; this drives ~10^6 distinct members through it across 20
triggers and records the live state-row/memory curve, proving the
EXPIREAT-at-bucket-expiry contract BOUNDS state at corpus-scale key
cardinality instead of accumulating it.

Shape: trigger i carries one hour-bucket of events — KEYS_PER_TRIGGER
distinct members under (exp_date=hour_i, issuer shard) group keys, 256
issuer shards per bucket. Event time rides with the bucket, so the 1h
watermark delay passes bucket j's expiry (hour j+1) two triggers later
and its groups — which get no further input — time out and evict. Live
state must therefore plateau at ~2-3 buckets' worth of groups while
TOTAL distinct members grow 20x past that plateau.

Gates (asserted, not just recorded):
- peak live state rows <= 4 buckets' group count (eviction keeps up;
  unbounded accumulation would reach n_triggers * groups_per_bucket)
- final-batch state rows < 1/4 of total groups created
- rows were actually removed (numRowsRemoved > 0 somewhere)

Prints one JSON line (curve + gates); findings land in BASELINE.md.

--provider rocksdb (r13, r12 verdict task 3) runs the SAME rung with
spark.sql.streaming.stateStore.providerClass flipped to the RocksDB
provider — the documented 100x lever (DESIGN_NOTES.md: the HDFS-backed
default holds every live group's seen-set on the JVM heap; RocksDB
spills to local disk with the same semantics). The run asserts the
provider actually served state (rocksdb* custom metrics present) and
the identical plateau gates, so BASELINE.md carries a measured parity
curve instead of a documented-but-never-executed lever. Exits with a
skip marker (exit 0, {"skipped": reason}) if this Spark build lacks
the provider class.
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_TRIGGERS = 20
KEYS_PER_TRIGGER = 50_000
SHARDS = 256  # issuer shards per hour bucket => groups per bucket

# --geometry grow (r14, r13 verdict task 4): a geometry whose live state
# actually GROWS instead of plateauing at 768 rows — 65536 issuer shards
# per hour bucket and a 15 h watermark delay hold ~17 buckets in flight,
# so live groups climb to ~1.1M rows before the first evictions land at
# trigger 17. This is the regime where the HDFS-backed provider's
# keep-it-all-on-heap design is supposed to degrade and RocksDB's
# spill-to-local-disk is supposed not to; running BOTH providers here
# records which actually happens (per-batch walls + state memory in the
# curve). The plateau gates of the default geometry don't apply — grow
# mode gates that the geometry really forced >=10^6 live rows and that
# eviction still begins inside the run.
GROW_N_TRIGGERS = 20
GROW_KEYS_PER_TRIGGER = 131_072
GROW_SHARDS = 65_536
GROW_WATERMARK = "15 hours"


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def main() -> None:
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.session import get_spark
    from ct_mapreduce_spark.streaming.stateful import (
        cert_bucket_expiry,
        ttl_first_seen,
    )

    provider = "rocksdb" if "--provider" in sys.argv and "rocksdb" in sys.argv else "default"
    grow = "--geometry" in sys.argv and "grow" in sys.argv
    n_triggers = GROW_N_TRIGGERS if grow else N_TRIGGERS
    keys_per_trigger = GROW_KEYS_PER_TRIGGER if grow else KEYS_PER_TRIGGER
    shards = GROW_SHARDS if grow else SHARDS
    watermark = GROW_WATERMARK if grow else "1 hour"
    spark = get_spark("state-soak")
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    t0d = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    root = tempfile.mkdtemp(prefix="ctspark_state_soak_")
    src = f"{root}/src"
    ckpt = f"{root}/ckpt"

    gen_t0 = time.perf_counter()
    for i in range(n_triggers):
        hour = t0d + dt.timedelta(hours=i)
        bucket = hour.strftime("%Y-%m-%d-%H")
        ts = hour + dt.timedelta(minutes=5)
        (
            spark.range(keys_per_trigger)
            .select(
                F.lit(bucket).alias("exp_date"),
                F.concat(
                    F.lit("iss"), (F.col("id") % shards).cast("string")
                ).alias("issuer_id"),
                # members globally distinct across triggers
                (F.col("id") + i * keys_per_trigger).alias("serial"),
                F.lit(ts).alias("entry_ts"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(1.1)  # distinct mtimes => deterministic batch order
    gen_s = round(time.perf_counter() - gen_t0, 2)
    print(
        f"generated {n_triggers} waves x {keys_per_trigger} keys in {gen_s}s",
        file=sys.stderr,
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = ttl_first_seen(
        stream,
        keys=["exp_date", "issuer_id"],
        member_col="serial",
        expiry_fn=cert_bucket_expiry,
        watermark_col="entry_ts",
        watermark_delay=watermark,
    )
    run_t0 = time.perf_counter()
    try:
        q = (
            out.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .start()
        )
        # a missing/broken provider class typically surfaces at the FIRST
        # TRIGGER's state-store init (inside processAllAvailable), not at
        # start() — keep the whole first drain inside the skip guard
        q.processAllAvailable()
    except Exception as e:  # noqa: BLE001 — provider may be absent
        if provider == "rocksdb" and "RocksDB" in str(e):
            print(json.dumps({"provider": provider, "skipped": str(e)[:300]}))
            return
        raise
    progresses = [p for p in q.recentProgress if p and p["numInputRows"] > 0]
    q.stop()
    run_s = round(time.perf_counter() - run_t0, 2)

    curve = []
    for p in progresses:
        so = p["stateOperators"][0]
        curve.append(
            {
                "batch": p["batchId"],
                "input_rows": p["numInputRows"],
                "state_rows": so["numRowsTotal"],
                "state_rows_removed": so["numRowsRemoved"],
                "state_memory_mb": round(
                    so.get("memoryUsedBytes", 0) / 1e6, 2
                ),
                "batch_wall_ms": p.get("batchDuration"),
                "watermark": p.get("eventTime", {}).get("watermark"),
            }
        )

    total_groups = n_triggers * shards
    peak = max(c["state_rows"] for c in curve)
    final = curve[-1]["state_rows"]
    removed = sum(c["state_rows_removed"] for c in curve)
    if grow:
        # grow-mode gates: the geometry really forced ~10^6 live rows
        # (the comparison regime exists) and eviction kept the store
        # below full accumulation (evictions balance arrivals once the
        # watermark reaches bucket 0, so final == peak == ~17 buckets,
        # NOT n_triggers buckets)
        assert peak >= 1_000_000, (peak, curve)
        assert removed > 0, curve
        assert final < total_groups, (final, total_groups)
    else:
        assert peak <= 4 * shards, (peak, 4 * shards)
        assert final < total_groups / 4, (final, total_groups)
        assert removed > 0, curve
    if provider == "rocksdb":
        # prove RocksDB actually served the state, not a silent
        # fallback: the provider exports rocksdb* custom metrics
        so = progresses[-1]["stateOperators"][0]
        rocks_metrics = [
            k for k in so.get("customMetrics", {}) if k.startswith("rocksdb")
        ]
        assert rocks_metrics, so

    results = {
        "provider": provider,
        "geometry": "grow" if grow else "plateau",
        "triggers": n_triggers,
        "distinct_members_total": n_triggers * keys_per_trigger,
        "groups_per_bucket": shards,
        "groups_total": total_groups,
        "gen_s": gen_s,
        "run_s": run_s,
        "peak_state_rows": peak,
        "final_state_rows": final,
        "state_rows_removed_total": removed,
        "peak_state_memory_mb": max(c["state_memory_mb"] for c in curve),
        "curve": curve,
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
