"""Streaming rate monitor (streaming/rate_stream.py): per-trigger delta
folding, batch-operator equivalence of the re-scored history, and
replay-idempotent batch-keyed delta writes."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import Row

from ct_mapreduce_spark.operators.statistics import rate_anomaly
from ct_mapreduce_spark.streaming.rate_stream import (
    history_totals,
    start_rate_monitor,
)

BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _events(h0: int, h1: int, spike_at: int | None = None):
    rows, eid = [], h0 * 1000
    for h in range(h0, h1):
        n = 100 if h == spike_at else 10
        for i in range(n):
            rows.append(
                Row(
                    event_id=eid,
                    ts=BASE + dt.timedelta(hours=h, minutes=i % 60),
                    event_type="click",
                )
            )
            eid += 1
    return rows


def _one_file(df, src_dir: str, name: str, mtime: float) -> None:
    tmp = src_dir + "_stage_" + name
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(tmp + "/part-*.parquet")[0]
    os.makedirs(src_dir, exist_ok=True)
    dst = os.path.join(src_dir, name + ".parquet")
    shutil.copyfile(part, dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp, ignore_errors=True)


def test_rate_monitor_flags_spike_and_matches_batch(spark, tmp_path):
    """Two triggers (steady history, then a spiky tail): the alerts
    table contains exactly the planted spike, the summed deltas equal
    the true counts (two triggers never double-count), and the
    re-scored history is row-identical to the batch operator on the
    union — the streaming/batch equivalence contract."""
    ev0 = spark.createDataFrame(_events(0, 30))
    ev1 = spark.createDataFrame(_events(30, 35, spike_at=30))
    src = str(tmp_path / "src")
    _one_file(ev0, src, "b0", 1_000_000.0)
    _one_file(ev1, src, "b1", 1_000_100.0)

    hist = str(tmp_path / "hist")
    alerts = str(tmp_path / "alerts")
    q = start_rate_monitor(
        spark,
        source_path=src,
        history_path=hist,
        alerts_path=alerts,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = spark.read.parquet(alerts).collect()
    spike_ts = (BASE + dt.timedelta(hours=30)).strftime("%Y-%m-%d %H:%M:%S")
    assert [(r.key, r.bucket_ts, r.n) for r in got] == [
        ("click", spike_ts, 100)
    ]
    assert got[0].is_anomaly and got[0].z_score == 90.0

    totals = {
        r.bucket_ts: r.n for r in history_totals(spark, hist).collect()
    }
    assert len(totals) == 35 and sum(totals.values()) == 34 * 10 + 100

    both = spark.createDataFrame(_events(0, 30) + _events(30, 35, spike_at=30))
    batch = {
        (r.key, r.bucket_ts): (r.n, r.z_score, r.is_anomaly)
        for r in rate_anomaly(both).collect()
    }
    from ct_mapreduce_spark.operators.statistics import zscore_counts

    streamed = {
        (r.key, r.bucket_ts): (r.n, r.z_score, r.is_anomaly)
        for r in zscore_counts(history_totals(spark, hist)).collect()
    }
    assert streamed == batch


def test_rate_monitor_replay_is_idempotent(spark, tmp_path):
    """Re-delivering a batch id must overwrite its own delta partition,
    not append beside it: simulate a crash-replay by running the same
    single-file stream twice with a FRESH checkpoint (same batch id 0)
    and assert totals did not double."""
    ev = spark.createDataFrame(_events(0, 13))
    src = str(tmp_path / "src")
    _one_file(ev, src, "b0", 1_000_000.0)
    hist = str(tmp_path / "hist")
    alerts = str(tmp_path / "alerts")
    for tag in ("c1", "c2"):
        q = start_rate_monitor(
            spark,
            source_path=src,
            history_path=hist,
            alerts_path=alerts,
            checkpoint=str(tmp_path / f"ckpt_{tag}"),
        )
        q.awaitTermination(180)
    totals = {
        r.bucket_ts: r.n for r in history_totals(spark, hist).collect()
    }
    assert len(totals) == 13 and set(totals.values()) == {10}
    assert spark.read.parquet(alerts).count() == 0  # steady stream
