"""Sequence packing (operators/packing.py): two-phase distributed prefix
sum must equal the naive global-window cumsum, be invariant to input
partitioning and bucket count, and never plan a single-partition global
window (the thing that dies at 100 TB)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, n=200, partitions=None):
    rows = [(i, " ".join(["tok"] * (1 + (i * 37) % 90))) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(partitions) if partitions else df


def _naive(spark, docs, seq_len):
    ntok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    c = docs.select(
        "doc_id",
        ntok.alias("n_tokens"),
        F.coalesce(F.sum(ntok).over(w), F.lit(0)).cast("long").alias("off"),
    )
    return {
        r["doc_id"]: (r["n_tokens"], r["off"]) for r in c.collect()
    }


def test_pack_matches_global_cumsum(spark):
    docs = _docs(spark, 200)
    expect = _naive(spark, docs, 64)
    got = pack_sequences(docs, seq_len=64, n_buckets=8).collect()
    assert len(got) == 200
    for r in got:
        ntok, off = expect[r["doc_id"]]
        assert r["n_tokens"] == ntok
        assert r["start_offset"] == off
        assert r["seq_first"] == off // 64
        assert r["seq_last"] == (off + ntok - 1) // 64
        assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1


def test_pack_invariant_to_partitioning_and_buckets(spark):
    base = sorted(
        tuple(r)
        for r in pack_sequences(_docs(spark, 150), seq_len=32, n_buckets=4)
        .collect()
    )
    for parts, nb in [(1, 1), (13, 7), (32, 150)]:
        alt = sorted(
            tuple(r)
            for r in pack_sequences(
                _docs(spark, 150, partitions=parts), seq_len=32, n_buckets=nb
            ).collect()
        )
        assert alt == base


def test_pack_no_global_single_partition_window(spark):
    plan = pack_sequences(_docs(spark, 50), seq_len=64, n_buckets=8)._jdf.queryExecution().executedPlan().toString()
    # every Window node must be partitioned by the bucket column — an
    # empty partitionBy would show "Window [...], [_bucket..." missing
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_bucket" in line, f"unpartitioned global window: {line}"


def test_pack_sparse_nonzero_ids(spark):
    # order keys need not be dense or zero-based
    rows = [(i * 1000 + 7, "a b c") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["start_offset"])
        for r in pack_sequences(df, seq_len=5, n_buckets=6).collect()
    )
    assert [off for _, off in got] == [i * 3 for i in range(40)]


def test_pack_full_range_hash_ids(spark):
    """Order keys spanning the full long range (xxhash64-derived ids)
    must not overflow the bucket arithmetic under ANSI mode, and offsets
    must still follow ascending-id order exactly."""
    ids = [-(2**63) + 5, -(2**40), -17, 0, 3, 2**40, 2**62, 2**63 - 11]
    rows = [(i, "w " * ((k % 5) + 1)) for k, i in enumerate(sorted(ids))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["start_offset"] for r in pack_sequences(df, seq_len=4, n_buckets=4).collect()}
    expect_tok = {i: len(t.split()) for i, t in rows}
    off = 0
    for i in sorted(ids):
        assert got[i] == off, (i, got[i], off)
        off += expect_tok[i]


def test_packing_stats(spark):
    docs = _docs(spark, 100)
    packed = pack_sequences(docs, seq_len=64, n_buckets=8)
    s = packing_stats(packed, seq_len=64).first()
    total = sum(r["n_tokens"] for r in packed.collect())
    assert s["n_docs"] == 100
    assert s["total_tokens"] == total
    assert s["n_sequences"] == (total + 63) // 64
    assert s["tail_pad_tokens"] == s["n_sequences"] * 64 - total
    straddle = sum(
        1 for r in packed.collect() if r["seq_last"] > r["seq_first"]
    )
    assert s["n_straddlers"] == straddle


def test_pack_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(df, seq_len=64).count() == 0
