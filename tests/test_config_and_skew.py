"""Config layering (config/config_test.go:8-96 analog) and skew-aware
aggregation exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from ct_mapreduce_spark.config import load_config
from ct_mapreduce_spark.operators.skew import salted_count_distinct, salted_first_seen


def test_config_defaults():
    cfg = load_config(env={})
    assert cfg.num_threads == 1
    assert cfg.log_expired is False
    assert cfg.save_period == "15m"
    assert cfg.cn_prefixes == []


def test_config_precedence(tmp_path):
    ini = tmp_path / "ct.ini"
    ini.write_text("[ctspark]\nnum_threads = 8\nissuer_cn_filter = ISRG\n")
    cfg = load_config(
        flags={"num_threads": 4, "log_expired": True},
        ini_path=str(ini),
        env={"CTSPARK_NUM_THREADS": "16"},
    )
    # flags < ini < env
    assert cfg.num_threads == 16
    assert cfg.issuer_cn_filter == "ISRG"
    assert cfg.log_expired is True
    assert cfg.cn_prefixes == ["ISRG"]


def test_config_statsd_keys(tmp_path):
    """statsdHost/statsdPort ride the same ini/env layering as the
    reference (config/config.go:200-201); ints coerce from strings."""
    ini = tmp_path / "ct.ini"
    ini.write_text("[ctspark]\nstatsd_host = metrics.local\nstatsd_port = 8125\n")
    cfg = load_config(ini_path=str(ini), env={})
    assert (cfg.statsd_host, cfg.statsd_port) == ("metrics.local", 8125)
    cfg = load_config(env={"CTSPARK_STATSD_PORT": "9125"})
    assert cfg.statsd_port == 9125
    assert load_config(env={}).statsd_port == 0  # disabled by default


def test_salted_count_distinct_exact(spark):
    # heavy skew: one key gets 90% of rows, values repeat
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    got = {
        r.k: r.n_distinct
        for r in salted_count_distinct(df, ["k"], "v", buckets=16).collect()
    }
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want


def test_salted_first_seen_matches_plain(spark, certs):
    import datetime as dt

    from ct_mapreduce_spark.operators.dedup import first_seen
    from ct_mapreduce_spark.plans.ingest import prepare

    prepared = prepare(certs, now=dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc))
    plain = first_seen(prepared)
    salted = salted_first_seen(
        prepared, keys=["exp_date", "issuer_id", "serial"], order_col="entry_id"
    )
    assert salted.count() == plain.count()
    assert (
        salted.select("entry_id").exceptAll(plain.select("entry_id")).count() == 0
    )


def test_store_partition_pruning_plan(spark, certs, tmp_path):
    """The partitioned store must prune to one (exp_date, issuer_id)
    directory on point predicates — the reference's SkipDir optimization
    (localdiskbackend.go:105-113) for free from Catalyst."""
    import datetime as dt

    from ct_mapreduce_spark.plans.ingest import ingest_batch, write_store

    deduped = ingest_batch(certs, now=dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc))
    path = str(tmp_path / "store")
    write_store(deduped, path)
    store = spark.read.parquet(path)
    probe = deduped.select("exp_date", "issuer_id").first()
    q = store.where(
        (F.col("exp_date") == probe["exp_date"])
        & (F.col("issuer_id") == probe["issuer_id"])
    )
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # both partition predicates must appear in PartitionFilters, not as a
    # post-scan filter
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "exp_date" in pf_line and "issuer_id" in pf_line


def test_store_write_file_count_bounded(spark, certs, tmp_path):
    """Guard for the small-file fix (round-1 review, wrong #1): the
    REBALANCE clustering must keep files per (exp_date, issuer_id)
    directory O(partition bytes / target file size) — at test scale that
    means a handful per directory, NOT one file per shuffle task.

    Without clustering, every shuffle partition touches most (date, issuer)
    pairs, producing ~n_shuffle_partitions files per directory; with it,
    AQE coalesces each pair's rows into few right-sized output files."""
    import datetime as dt
    from collections import Counter
    from pathlib import Path

    from ct_mapreduce_spark.plans.ingest import ingest_batch, write_store

    deduped = ingest_batch(certs, now=dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc))
    path = str(tmp_path / "store")
    write_store(deduped, path)

    per_dir: Counter[str] = Counter()
    for f in Path(path).rglob("*.parquet"):
        per_dir[str(f.parent)] += 1
    assert per_dir, "store wrote no parquet files"
    n_pairs = deduped.select("exp_date", "issuer_id").distinct().count()
    assert len(per_dir) == n_pairs  # one directory per (date, issuer)
    # Bounded: no directory exploded into per-task files (shuffle
    # partitions is 8 in tests; unclustered writes give ~8 per dir).
    assert max(per_dir.values()) <= 4, per_dir.most_common(5)
