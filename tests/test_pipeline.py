"""Phase-1 end-to-end slice: ingest filters -> first-seen dedup -> rollup
report, cross-checked against an independent pandas computation of the same
semantics (the reference's numbers at storage-statistics.go:78-82)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.dedup import first_seen, was_unknown_flags
from ct_mapreduce_spark.operators.metadata import issuer_and_dates, issuer_metadata
from ct_mapreduce_spark.operators.statistics import stats_rollup
from ct_mapreduce_spark.plans.ingest import ingest_batch, prepare
from ct_mapreduce_spark.plans.statistics import statistics_report

NOW = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)


def _expected_pdf(certs) -> pd.DataFrame:
    """Independent re-computation of filter+dedup in pandas."""
    pdf = certs.toPandas()
    pdf = pdf[~(pdf.basic_constraints_valid & pdf.is_ca)]
    pdf = pdf[pdf.not_after >= pd.Timestamp(NOW).tz_localize(None)]
    pdf = pdf[pdf.chain_len >= 1]
    pdf["exp_date"] = pdf.not_after.dt.floor("h").dt.strftime("%Y-%m-%d-%H")
    pdf["skey"] = pdf.serial.map(bytes)
    pdf = pdf.sort_values("entry_id")
    return pdf


def test_first_seen_dedup_matches_pandas(spark, certs):
    deduped = ingest_batch(certs, now=NOW).toPandas()
    pdf = _expected_pdf(certs)
    want = pdf.drop_duplicates(["exp_date", "issuer_id", "skey"])
    assert len(deduped) == len(want)
    got_ids = set(deduped.entry_id)
    assert got_ids == set(want.entry_id)  # min-entry_id winner, exactly


def test_was_unknown_flags(spark, certs):
    prepared = prepare(certs, now=NOW)
    flagged = was_unknown_flags(prepared).toPandas()
    assert flagged.was_unknown.sum() == len(
        _expected_pdf(certs).drop_duplicates(["exp_date", "issuer_id", "skey"])
    )
    assert len(flagged) == len(_expected_pdf(certs))


def test_stats_rollup_levels(spark, certs):
    rollup_df, report = statistics_report(certs, now=NOW)
    r = rollup_df.toPandas()
    pdf = _expected_pdf(certs).drop_duplicates(["exp_date", "issuer_id", "skey"])

    grand = r[(r.g_issuer == 1) & (r.g_exp == 1)]
    assert len(grand) == 1
    assert int(grand.n_serials.iloc[0]) == pdf[["exp_date", "issuer_id", "skey"]].drop_duplicates().shape[0]

    per_issuer = r[(r.g_issuer == 0) & (r.g_exp == 1)].set_index("issuer_id")
    # distinct (exp_date, skey) per issuer, via drop_duplicates + size
    # (a groupby.apply over the grouping column is deprecated in pandas)
    want_issuer = (
        pdf.drop_duplicates(["issuer_id", "exp_date", "skey"])
        .groupby("issuer_id")
        .size()
    )
    # per-issuer level = additive sum of leaf SCARDs (storage-statistics.go:44-53)
    for issuer, cnt in want_issuer.items():
        assert int(per_issuer.loc[issuer, "n_serials"]) == cnt

    rep = report.toPandas().set_index("issuer_id")
    for issuer, cnt in want_issuer.items():
        assert int(rep.loc[issuer, "n_serials"]) == cnt


def test_stats_rollup_reagg_matches_rollup(spark, certs):
    """The additive-reaggregation form (the 100 TB shuffle shape) must
    produce exactly the ROLLUP's rows - same levels, same counts."""
    from ct_mapreduce_spark.operators.statistics import (
        stats_rollup,
        stats_rollup_reagg,
    )
    from ct_mapreduce_spark.plans.ingest import prepare

    prepared = prepare(certs, now=NOW)

    def canon(df):
        return {
            (r.issuer_id, r.exp_date, r.g_issuer, r.g_exp): (r.n_serials, r.n_rows)
            for r in df.collect()
        }

    assert canon(stats_rollup_reagg(prepared)) == canon(stats_rollup(prepared))


def test_issuer_metadata_sets(spark, certs):
    prepared = prepare(certs, now=NOW)
    meta = issuer_metadata(prepared).toPandas().set_index("issuer_id")
    pdf = _expected_pdf(certs)

    for issuer, g in pdf.groupby("issuer_id"):
        crls = set()
        for arr in g.crl_dps:
            for u in arr:
                u = u.strip()
                if u.startswith("http://") or u.startswith("https://"):
                    crls.add(u)
        assert set(meta.loc[issuer, "crl_set"]) == crls
        assert set(meta.loc[issuer, "dn_set"]) == set(g.issuer_dn)
        assert set(meta.loc[issuer, "exp_date_set"]) == set(g.exp_date)


def test_issuer_and_dates(spark, certs):
    prepared = prepare(certs, now=NOW)
    got = issuer_and_dates(prepared).toPandas().set_index("issuer_id")
    pdf = _expected_pdf(certs)
    for issuer, g in pdf.groupby("issuer_id"):
        assert list(got.loc[issuer, "exp_dates"]) == sorted(set(g.exp_date))


def test_store_write_and_point_lookup(spark, certs, tmp_path):
    from ct_mapreduce_spark.plans.ingest import write_store
    from ct_mapreduce_spark.plans.point_lookup import get_cert

    deduped = ingest_batch(certs, now=NOW)
    path = str(tmp_path / "store")
    write_store(deduped, path)
    store = spark.read.parquet(path)
    assert store.count() == deduped.count()

    probe = deduped.select("exp_date", "issuer_id", F.lower(F.hex("serial")).alias("h")).first()
    got = get_cert(store, probe["exp_date"], probe["issuer_id"], probe["h"])
    assert got.count() == 1


def test_serial_list_export_golden(spark, tmp_path):
    """Golden byte check (localdiskbackend_test.go:60-85): serials
    01,02,03 -> file bytes 30310A30320A30330A."""
    from pyspark.sql import Row

    from ct_mapreduce_spark.sources.sinks import write_serial_list

    df = spark.createDataFrame(
        [Row(serial=bytes([i]), issuer_id="issuerAKI", entry_id=i) for i in (1, 2, 3)]
    )
    path = str(tmp_path / "serials")
    write_serial_list(df, path)
    import glob

    files = glob.glob(f"{path}/issuer_id=issuerAKI/part-*")
    data = b"".join(open(f, "rb").read() for f in sorted(files))
    assert sorted(data.split(b"\n")[:-1] if data.endswith(b"\n") else data.split(b"\n")) == [b"01", b"02", b"03"]
    assert bytes.fromhex("30310A30320A30330A".lower()) == b"01\n02\n03\n"


def test_incremental_leaf_counts_match_full_recompute(spark, certs, tmp_path):
    """Incremental stats maintenance: merging per-batch counts of
    cross-run-deduped deltas equals a full recompute over everything
    seen - the reference's SCARD-bump flow (never rescan history)."""
    from ct_mapreduce_spark.operators.statistics import update_leaf_counts
    from ct_mapreduce_spark.plans.ingest import ingest_batch, write_store
    from ct_mapreduce_spark.sources.sinks import append_new_to_store

    agg_path = str(tmp_path / "leaf_counts")
    store = str(tmp_path / "store")

    b1 = ingest_batch(certs.where("entry_id < 1000"), now=NOW)
    b2 = ingest_batch(certs.where("entry_id >= 600"), now=NOW)  # overlap

    write_store(b1, store)
    update_leaf_counts(spark, agg_path, b1)
    # second batch goes through the cross-run gate first: only its
    # never-seen keys contribute
    _, fresh2 = append_new_to_store(b2, store)
    merged = update_leaf_counts(spark, agg_path, fresh2)

    from pyspark.sql import functions as F

    full = spark.read.parquet(store).groupBy("issuer_id", "exp_date").agg(
        F.count_distinct("serial").alias("n_serials"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    got = {
        (r.issuer_id, r.exp_date): (r.n_serials, r.n_rows)
        for r in merged.collect()
    }
    want = {
        (r.issuer_id, r.exp_date): (r.n_serials, r.n_rows)
        for r in full.collect()
    }
    assert got == want

def test_rate_anomaly_planted_spike(spark):
    """A steady 10-events/hour series with ONE 100-event hour: the spike
    is the only anomalous bucket (flat baseline -> variance floor 1.0,
    z = 90), warmup buckets score exactly 0, and the post-spike bucket's
    z matches the hand-computed moment formula (spike now inside its
    trailing window)."""
    import datetime as dt
    import math

    from pyspark.sql import Row

    from ct_mapreduce_spark.operators.statistics import rate_anomaly

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for h in range(40):
        n = 100 if h == 30 else 10
        for i in range(n):
            rows.append(
                Row(
                    event_id=eid,
                    ts=base + dt.timedelta(hours=h, minutes=i % 60),
                    event_type="click",
                )
            )
            eid += 1
    ev = spark.createDataFrame(rows)
    got = {
        r.bucket_ts: r
        for r in rate_anomaly(ev, trailing=24, warmup=12).collect()
    }
    assert len(got) == 40

    def at(h):
        return got[(base + dt.timedelta(hours=h)).strftime("%Y-%m-%d %H:%M:%S")]

    for h in range(12):  # cold start: never anomalous, exactly 0
        assert at(h).z_score == 0.0 and not at(h).is_anomaly
    # the spike: 24 trailing buckets all n=10 -> mean 10, var 0 floored
    # to 1.0 -> z = (100-10)/1 = 90
    assert at(30).z_score == 90.0 and at(30).is_anomaly
    # one bucket later the spike sits INSIDE the trailing window:
    # s1 = 23*10+100, s2 = 23*100+10000, and n=10 is unremarkable
    c, s1, s2 = 24, 23 * 10 + 100, 23 * 100 + 10000
    mean = s1 / c
    var = (s2 - s1 * s1 / c) / (c - 1)
    want = round((10 - mean) / math.sqrt(max(var, 1.0)), 6)
    assert abs(at(31).z_score - want) < 1e-9
    assert not at(31).is_anomaly
    assert [k for k, r in got.items() if r.is_anomaly] == [
        (base + dt.timedelta(hours=30)).strftime("%Y-%m-%d %H:%M:%S")
    ]
