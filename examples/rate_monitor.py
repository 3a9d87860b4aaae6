#!/usr/bin/env python
"""Event-rate anomaly monitoring, batch and streaming (operators/
statistics.py:rate_anomaly + streaming/rate_stream.py, also exposed as
`cli monitor`):

  events -> per-(key, hour) counts (one map-side-combined pass)
  -> trailing rolling baseline from exact BIGINT moments
  -> z-score (variance floored for count data) -> alerts

  python examples/rate_monitor.py [workdir]

The script synthesizes a month-shaped stream — steady traffic with one
planted 10x spike and one planted outage-quiet hour — then (1) runs the
one-shot batch report and (2) replays the same events through the
streaming daemon in two micro-batches, showing the daemon's alerts
table converging to exactly the batch answer (the equivalence the
pytest suite asserts)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# Python UDF workers don't inherit the driver's sys.path — propagate the
# repo root through the environment so mapInPandas stages import cleanly
# when this script runs from any cwd (local mode spawns workers with the
# driver's env).
_root = str(Path(__file__).resolve().parent.parent)
os.environ["PYTHONPATH"] = _root + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)


def _events(spark, h0: int, h1: int, spike_at: int, quiet_at: int):
    from pyspark.sql import Row

    base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    rows, eid = [], h0 * 10_000
    for h in range(h0, h1):
        n = 200 if h == spike_at else (1 if h == quiet_at else 20)
        for i in range(n):
            rows.append(
                Row(
                    event_id=eid,
                    ts=base + dt.timedelta(hours=h, minutes=i % 60),
                    event_type="fetch",
                )
            )
            eid += 1
    return spark.createDataFrame(rows)


def _one_file(df, src_dir: str, name: str) -> None:
    tmp = src_dir + "_stage_" + name
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(src_dir, exist_ok=True)
    shutil.copyfile(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(src_dir, name + ".parquet"),
    )
    shutil.rmtree(tmp, ignore_errors=True)


def run(spark, workdir: str):
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators.statistics import rate_anomaly
    from ct_mapreduce_spark.streaming.rate_stream import start_rate_monitor

    history = _events(spark, 0, 60, spike_at=-1, quiet_at=-1)
    # quiet hour BEFORE the spike: an anomaly inside the trailing
    # window inflates the baseline variance and masks later ones — the
    # standard rolling-z caveat, worth demonstrating in the right order
    tail = _events(spark, 60, 72, spike_at=68, quiet_at=63)
    both = history.unionByName(tail)

    print("== batch report ==")
    report = rate_anomaly(both)
    for r in report.where(F.col("is_anomaly")).orderBy("bucket_ts").collect():
        kind = "spike" if r.z_score > 0 else "quiet"
        print(f"  {r.bucket_ts}  n={r.n:4d}  z={r.z_score:8.3f}  ({kind})")

    print("== streaming daemon (two micro-batches) ==")
    src = os.path.join(workdir, "src")
    _one_file(history, src, "b0")
    _one_file(tail, src, "b1")
    alerts = os.path.join(workdir, "alerts")
    q = start_rate_monitor(
        spark,
        source_path=src,
        history_path=os.path.join(workdir, "hist"),
        alerts_path=alerts,
        checkpoint=os.path.join(workdir, "ckpt"),
    )
    q.awaitTermination(300)
    streamed = {
        (r.key, r.bucket_ts) for r in spark.read.parquet(alerts).collect()
    }
    batch = {
        (r.key, r.bucket_ts)
        for r in report.where(F.col("is_anomaly")).collect()
    }
    print(f"  alerts: {sorted(t for _, t in streamed)}")
    print(f"  matches batch report: {streamed == batch}")
    assert streamed == batch


def main() -> int:
    from ct_mapreduce_spark.session import get_spark

    workdir = (
        sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ratemon_")
    )
    spark = get_spark("example-rate-monitor", shuffle_partitions=8)
    run(spark, workdir)
    print(f"workdir: {workdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
