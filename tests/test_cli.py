"""CLI surface: the three reference binaries as subcommands
(fetch / statistics / getcert), with flag<ini<env layering."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from ct_mapreduce_spark.cli import main
from ct_mapreduce_spark.plans.ingest import ingest_batch
from ct_mapreduce_spark.sources.certificates import synthetic_certificates

NOW = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)


@pytest.fixture(scope="module")
def cert_src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli_certs"))
    synthetic_certificates(spark, n=800, seed=11).write.mode("overwrite").parquet(path)
    return path


def test_fetch_writes_partitioned_store(spark, cert_src, tmp_path, capsys):
    store = str(tmp_path / "store")
    rc = main(
        ["fetch", "--source", cert_src, "--store", store, "--now", "2024-01-02"], spark=spark
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "stored" in out and store in out
    got = spark.read.parquet(store)
    assert {"exp_date", "issuer_id"} <= set(got.columns)
    assert got.count() > 0


def test_fetch_offset_limit_bounds_scan(spark, cert_src, capsys):
    rc = main(
        ["fetch", "--source", cert_src, "--offset", "100", "--limit", "200",
         "--now", "2024-01-02"],
        spark=spark,
    )
    assert rc == 0
    n = int(capsys.readouterr().out.split()[1])
    # --limit is a count from --offset (ct-fetch.go:303-305): [100, 300)
    certs = spark.read.parquet(cert_src).where(
        "entry_id >= 100 AND entry_id < 300"
    )
    expected = ingest_batch(certs, now=NOW).count()
    assert n == expected


def test_statistics_report_lines(spark, cert_src, capsys):
    rc = main(["statistics", "--source", cert_src, "--now", "2024-01-02"], spark=spark)
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[-1].startswith("total serials=")
    issuer_lines = [l for l in lines if l.startswith("issuer=")]
    assert issuer_lines and all("crls=" in l and "dns=" in l for l in issuer_lines)
    # per-issuer serials sum to the grand total (storage-statistics.go:82)
    total = int(lines[-1].split("serials=")[1].split()[0])
    assert sum(int(l.split("serials=")[1].split()[0]) for l in issuer_lines) == total


def test_statistics_from_store_matches_source(spark, cert_src, tmp_path, capsys):
    """fetch -> statistics --store is the reference workflow (statistics
    reads post-dedup state); totals must match the from-source path."""
    store = str(tmp_path / "store")
    main(
        ["fetch", "--source", cert_src, "--store", store, "--now", "2024-01-02"],
        spark=spark,
    )
    capsys.readouterr()
    assert main(["statistics", "--store", store], spark=spark) == 0
    from_store = capsys.readouterr().out.strip().splitlines()
    assert (
        main(["statistics", "--source", cert_src, "--now", "2024-01-02"], spark=spark)
        == 0
    )
    from_source = capsys.readouterr().out.strip().splitlines()
    assert from_store[-1] == from_source[-1]  # identical grand totals
    assert sorted(from_store) == sorted(from_source)


def test_fetch_append_incremental(spark, cert_src, tmp_path, capsys):
    """fetch --append: second overlapping run appends only never-seen
    keys and maintains the leaf-count table incrementally; totals match
    a single full ingest."""
    store = str(tmp_path / "store")
    # --append bootstraps on a missing store, so the incremental flow is
    # simply "always --append"
    main(
        ["fetch", "--source", cert_src, "--store", store, "--limit", "500",
         "--now", "2024-01-02", "--append"],
        spark=spark,
    )
    main(
        ["fetch", "--source", cert_src, "--store", store, "--offset", "250",
         "--now", "2024-01-02", "--append"],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert "appended" in out
    got = spark.read.parquet(store)
    keys = got.select("exp_date", "issuer_id", "serial")
    assert keys.count() == keys.distinct().count()  # no dup keys ever
    full = ingest_batch(spark.read.parquet(cert_src), now=NOW).select(
        "exp_date", "issuer_id", "serial"
    )
    assert keys.distinct().count() == full.distinct().count()
    # maintained leaf counts == recompute from the store
    from pyspark.sql import functions as F

    counts = spark.read.parquet(store + "_leaf_counts")
    want = got.groupBy("issuer_id", "exp_date").agg(
        F.count_distinct("serial").alias("n_serials")
    )
    a = {(r.issuer_id, r.exp_date): r.n_serials for r in counts.collect()}
    b = {(r.issuer_id, r.exp_date): r.n_serials for r in want.collect()}
    assert a == b


def test_statistics_approx_flag(spark, cert_src, capsys):
    """--approx swaps exact distinct counts for HLL sketches; at fixture
    cardinality the sketch is still in exact mode, so totals agree."""
    rc = main(
        ["statistics", "--source", cert_src, "--now", "2024-01-02", "--approx"],
        spark=spark,
    )
    assert rc == 0
    approx_lines = capsys.readouterr().out.strip().splitlines()
    main(["statistics", "--source", cert_src, "--now", "2024-01-02"], spark=spark)
    exact_lines = capsys.readouterr().out.strip().splitlines()

    def total(lines):
        return int(lines[-1].split("serials=")[1].split()[0])

    exact_n, approx_n = total(exact_lines), total(approx_lines)
    assert abs(approx_n - exact_n) / exact_n < 0.05  # HLL++ default rsd


def test_getcert_pem_roundtrip(spark, cert_src, capsys):
    import base64

    certs = spark.read.parquet(cert_src)
    row = certs.select("log_url", "entry_id", "raw_der").first()
    rc = main(
        [
            "getcert",
            "--source",
            cert_src,
            "--log-url",
            row.log_url,
            "--entry-id",
            str(row.entry_id),
        ],
        spark=spark,
    )
    assert rc == 0
    pem = capsys.readouterr().out.strip()
    assert pem.startswith("-----BEGIN CERTIFICATE-----")
    body = "".join(
        l for l in pem.splitlines() if not l.startswith("-----")
    )
    assert base64.b64decode(body) == bytes(row.raw_der)
    # missing entry -> exit 1
    assert (
        main(
            ["getcert", "--source", cert_src, "--log-url", row.log_url,
             "--entry-id", "99999999"],
            spark=spark,
        )
        == 1
    )


def test_fetch_append_bootstraps_leaf_counts(spark, cert_src, tmp_path):
    """README flow: plain `fetch --store` (no leaf table) then
    `fetch --append`. The first --append must seed the leaf-count table
    from the FULL store (one-time recompute), not just its own delta —
    otherwise the maintained table permanently undercounts the pre-append
    history."""
    from pyspark.sql import functions as F

    store = str(tmp_path / "store")
    main(
        ["fetch", "--source", cert_src, "--store", store, "--limit", "500",
         "--now", "2024-01-02"],
        spark=spark,
    )  # plain overwrite run: no _leaf_counts written
    import os

    assert not os.path.exists(store + "_leaf_counts")
    main(
        ["fetch", "--source", cert_src, "--store", store, "--offset", "250",
         "--now", "2024-01-02", "--append"],
        spark=spark,
    )
    counts = spark.read.parquet(store + "_leaf_counts")
    want = (
        spark.read.parquet(store)
        .groupBy("issuer_id", "exp_date")
        .agg(F.count_distinct("serial").alias("n_serials"))
    )
    a = {(r.issuer_id, r.exp_date): r.n_serials for r in counts.collect()}
    b = {(r.issuer_id, r.exp_date): r.n_serials for r in want.collect()}
    assert a == b  # covers [0,500) history + the appended tail, not just delta


def test_statistics_verbose_levels(spark, cert_src, tmp_path, capsys):
    """-v / -vv / -vvv mirror the reference's glog report levels
    (storage-statistics.go:56,58-59,62-74): per-expDate counts, serial
    listings, PEM dumps. Each level's detail is consistent with the
    summary lines above it."""
    store = str(tmp_path / "vstore")
    assert main(
        ["fetch", "--source", cert_src, "--store", store, "--now", "2024-01-02"],
        spark=spark,
    ) == 0
    capsys.readouterr()

    assert main(["statistics", "--store", store, "-v"], spark=spark) == 0
    out = capsys.readouterr().out
    bucket_lines = [l for l in out.splitlines() if l.startswith("- ")]
    assert bucket_lines and all("serials)" in l for l in bucket_lines)
    # per-bucket counts sum to the grand total (unique by bucket contract)
    total = int(out.splitlines()[-1].split("serials=")[1].split()[0])
    assert sum(int(l.split("(")[1].split()[0]) for l in bucket_lines) == total
    assert "Serials: [" not in out

    assert main(["statistics", "--store", store, "-vv"], spark=spark) == 0
    out2 = capsys.readouterr().out
    serial_lines = [l for l in out2.splitlines() if "Serials: [" in l]
    assert len(serial_lines) == len(bucket_lines)
    n_listed = sum(len(l.split("[")[1].rstrip("]").split()) for l in serial_lines)
    assert n_listed == total

    assert main(["statistics", "--store", store, "-vvv"], spark=spark) == 0
    out3 = capsys.readouterr().out
    assert out3.count("-----BEGIN CERTIFICATE-----") == total
    assert out3.count("Certificate serial={") == total


def test_cli_ann_lifecycle(spark, tmp_path, capsys):
    """The ann subcommand drives the whole IVF lifecycle: build on half
    the corpus, append the rest, stream one more batch, topk to parquet,
    compact — and the served results are identical before/after the
    compact."""
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.cli import main

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    halves = [emb.where(F.col("vec_id") % 3 == i) for i in range(3)]
    p_build = str(tmp_path / "e0")
    p_app = str(tmp_path / "e1")
    halves[0].write.parquet(p_build)
    halves[1].write.parquet(p_app)
    src = str(tmp_path / "src")
    halves[2].select("vec_id", "embedding").coalesce(1).write.parquet(src)
    idx = str(tmp_path / "idx")
    q_path = str(tmp_path / "q")
    emb.where(F.col("vec_id") < 8).write.parquet(q_path)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")

    assert main(["ann", "build", "--index", idx, "--embeddings", p_build],
                spark=spark) == 0
    assert main(["ann", "append", "--index", idx, "--embeddings", p_app],
                spark=spark) == 0
    assert main(["ann", "stream", "--index", idx, "--stream-source", src,
                 "--checkpoint", str(tmp_path / "ckpt")], spark=spark) == 0
    assert main(["ann", "topk", "--index", idx, "--queries", q_path,
                 "--out", out1], spark=spark) == 0
    assert main(["ann", "compact", "--index", idx], spark=spark) == 0
    out = capsys.readouterr().out
    assert "compacted" in out and "stream drained" in out
    assert main(["ann", "topk", "--index", idx, "--queries", q_path,
                 "--out", out2], spark=spark) == 0
    a = sorted(tuple(r) for r in spark.read.parquet(out1).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(out2).collect())
    assert a == b and len(a) == 40


def test_cli_dedup_lifecycle(spark, tmp_path, capsys):
    """The dedup subcommand drives the incremental-dedup daemon end to
    end: stream two batches (the second all verbatim copies under new
    ids — every row must drop against the index the first batch built),
    with --compact-every wired through to the auto-compaction contract,
    then an external-window compact."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from ct_mapreduce_spark.cli import main

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 10 == 0)
    )
    copies = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for name, frame, mtime in (("b0", docs, 1e6), ("b1", copies, 1e6 + 100)):
        tmp = str(tmp_path / ("stage_" + name))
        frame.coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = os.path.join(src, name + ".parquet")
        shutil.copyfile(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    idx, keep = str(tmp_path / "idx"), str(tmp_path / "keep")
    assert (
        main(
            ["dedup", "stream", "--index", idx, "--stream-source", src,
             "--keep", keep, "--checkpoint", str(tmp_path / "ckpt"),
             "--compact-every", "2"],
            spark=spark,
        )
        == 0
    )
    assert "stream drained" in capsys.readouterr().out
    kept = spark.read.parquet(keep)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert kept_ids and all(i < 100000 for i in kept_ids)  # copies dropped

    assert main(["dedup", "compact", "--index", idx], spark=spark) == 0
    assert "compacted" in capsys.readouterr().out


def test_cli_tokenize_lifecycle(spark, tmp_path, capsys):
    """The tokenize subcommand drives the BPE lifecycle: train writes the
    merge-table artifact, encode tokenizes under the stored model (counts
    and arrays agree), stats reports corpus totals."""
    from ct_mapreduce_spark.cli import main
    from ct_mapreduce_spark.sources.tables import load_table

    docs_path = str(tmp_path / "docs")
    load_table(spark, "documents", "/root/testdata/sf0.001").select(
        "doc_id", "text"
    ).write.parquet(docs_path)
    model = str(tmp_path / "model")
    out_arrays = str(tmp_path / "enc")
    out_counts = str(tmp_path / "cnt")

    assert main(
        ["tokenize", "train", "--input", docs_path, "--model", model,
         "--n-merges", "40"],
        spark=spark,
    ) == 0
    assert "trained" in capsys.readouterr().out

    assert main(
        ["tokenize", "encode", "--input", docs_path, "--model", model,
         "--out", out_arrays],
        spark=spark,
    ) == 0
    assert main(
        ["tokenize", "encode", "--input", docs_path, "--model", model,
         "--out", out_counts, "--counts-only"],
        spark=spark,
    ) == 0
    from pyspark.sql import functions as F

    enc = spark.read.parquet(out_arrays).select(
        "doc_id", F.size("bpe_tokens").alias("n")
    )
    cnt = spark.read.parquet(out_counts).select(
        "doc_id", F.col("n_bpe_tokens").alias("n")
    )
    assert enc.exceptAll(cnt).count() == 0 and cnt.exceptAll(enc).count() == 0

    assert main(
        ["tokenize", "stats", "--input", docs_path, "--model", model],
        spark=spark,
    ) == 0
    out = capsys.readouterr().out
    assert "total_tokens" in out and "chars_per_token" in out


def test_cli_monitor_report_and_stream(spark, tmp_path, capsys):
    """The monitor subcommand: `report` prints the planted spike from a
    parquet table; `stream` drains the source dir and writes the same
    alert to the alerts table."""
    import datetime as dt
    import glob
    import os
    import shutil

    from pyspark.sql import Row

    from ct_mapreduce_spark.cli import main

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows, eid = [], 0
    for h in range(32):
        n = 80 if h == 30 else 10
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
    events_path = str(tmp_path / "events")
    ev.write.parquet(events_path)

    assert main(
        ["monitor", "report", "--input", events_path], spark=spark
    ) == 0
    out = capsys.readouterr().out
    assert "2024-01-02 06:00:00" in out and "n=80" in out

    # stream form: stage the same rows as one source file
    src = str(tmp_path / "src")
    tmpdir = str(tmp_path / "stage")
    ev.coalesce(1).write.parquet(tmpdir)
    os.makedirs(src, exist_ok=True)
    shutil.copyfile(
        glob.glob(tmpdir + "/part-*.parquet")[0], src + "/b0.parquet"
    )
    assert main(
        [
            "monitor", "stream",
            "--input", src,
            "--history", str(tmp_path / "hist"),
            "--alerts", str(tmp_path / "alerts"),
            "--checkpoint", str(tmp_path / "ckpt"),
        ],
        spark=spark,
    ) == 0
    assert "alerts: 1" in capsys.readouterr().out
    got = spark.read.parquet(str(tmp_path / "alerts")).collect()
    assert len(got) == 1 and got[0].n == 80 and got[0].is_anomaly

    # stream without required dirs is a usage error, not a crash
    assert main(
        ["monitor", "stream", "--input", src], spark=spark
    ) == 2


def test_cli_ann_pq_lifecycle(spark, tmp_path, capsys):
    """--pq switches the ann verbs to the IVF-PQ store: build on half,
    append a quarter, stream the rest (the r9 PQ daemon), topk with
    exact re-rank to parquet, compact — served results identical
    before/after compact."""
    import glob as _glob
    import shutil as _shutil

    from pyspark.sql import functions as F

    from ct_mapreduce_spark.cli import main

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    p_build = str(tmp_path / "e0")
    p_app = str(tmp_path / "e1")
    emb.where(F.col("vec_id") % 4 <= 1).write.parquet(p_build)
    emb.where(F.col("vec_id") % 4 == 2).write.parquet(p_app)
    src = str(tmp_path / "src")
    stage = str(tmp_path / "stage")
    emb.where(F.col("vec_id") % 4 == 3).select(
        "vec_id", "embedding"
    ).coalesce(1).write.parquet(stage)
    os.makedirs(src, exist_ok=True)
    _shutil.copyfile(
        _glob.glob(stage + "/part-*.parquet")[0], src + "/b0.parquet"
    )
    idx = str(tmp_path / "idx")
    q_path = str(tmp_path / "q")
    emb.where(F.col("vec_id") < 8).write.parquet(q_path)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")

    assert main(["ann", "build", "--pq", "--index", idx,
                 "--embeddings", p_build], spark=spark) == 0
    assert "IVF-PQ" in capsys.readouterr().out
    assert main(["ann", "append", "--pq", "--index", idx,
                 "--embeddings", p_app], spark=spark) == 0
    assert main(["ann", "stream", "--pq", "--index", idx,
                 "--stream-source", src,
                 "--checkpoint", str(tmp_path / "ckpt"),
                 "--compact-every", "4"], spark=spark) == 0
    assert "stream drained" in capsys.readouterr().out
    assert main(["ann", "topk", "--pq", "--index", idx, "--queries", q_path,
                 "--rerank-factor", "4", "--rerank-corpus", p_build,
                 "--out", out1], spark=spark) == 0
    assert main(["ann", "compact", "--pq", "--index", idx], spark=spark) == 0
    assert "compacted" in capsys.readouterr().out
    assert main(["ann", "topk", "--pq", "--index", idx, "--queries", q_path,
                 "--rerank-factor", "4", "--rerank-corpus", p_build,
                 "--out", out2], spark=spark) == 0
    a = sorted(tuple(r) for r in spark.read.parquet(out1).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(out2).collect())
    assert a == b and len(a) == 40
