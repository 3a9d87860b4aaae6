"""Sequence packing: map documents onto a fixed-length training stream.

GPT-style pretraining concatenates the whole corpus into one token stream
(documents separated implicitly, allowed to straddle sequence boundaries)
and cuts it into fixed `seq_len` windows. The curation-side question this
operator answers is "where does each document land": its global token
offset, which training sequences it occupies, and how many boundaries it
crosses — the inputs for packing-efficiency audits, boundary-crossing
loss masking, and resumable sharding of a 100 TB corpus into training
files.

The hard part at scale is the global cumulative sum. A naive
`sum().over(Window.orderBy(key))` is a single-partition window — one task
owns the entire corpus, which is exactly the plan that dies at 100 TB.
This module implements the classic two-phase distributed prefix sum
instead:

1. bucket every row by a range of the (numeric, unique) order key;
2. one map-side-combined `groupBy(bucket)` computes per-bucket token
   totals — `n_buckets` rows, bounded model parameters, which visit the
   driver to become exclusive-prefix bucket offsets (the same "model
   parameters may be collected, data may not" rule the IVF centroids
   follow);
3. the within-bucket running sum is a window PARTITIONED by bucket — so
   the sort is per-bucket, parallel across the cluster — plus the
   broadcast bucket offset.

The result is a pure function of the data (no partitioning or seed
dependence), so the DuckDB oracle can recompute it with an ordinary
window cumsum and match bit-for-bit: token counts are exact integers and
every offset is integer arithmetic.

No reference analog (jcjones/ct-mapreduce has no training-stream
concept); this extends the §2.6 window tier the same way the dedup/ANN
suite extends §2.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.text import tokens
from ct_mapreduce_spark.operators.util import local_frame


def _bucket_offsets(
    base: DataFrame, order_col: str, value_col: str, n_buckets: int
) -> tuple[Column, DataFrame]:
    """Range-bucket expression over `order_col` plus a tiny frame mapping
    each bucket to the exclusive prefix sum of `value_col` across all
    earlier buckets. Two bounded driver actions: a (min, max) pair and
    `n_buckets` subtotal rows — model parameters, never data."""
    lo, hi = base.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if lo is None:  # empty input: any bucket expr works, offsets empty
        spark = base.sparkSession
        return F.lit(0), local_frame(
            spark, [], "_bucket bigint, _bucket_off bigint"
        )
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    # Bucket assignment happens in DOUBLE space: order keys may span the
    # full long range (e.g. xxhash64-derived ids), where (col - lo) in
    # long arithmetic overflows under ANSI mode. The double conversion
    # and division are monotonic, which is all bucketing needs — the
    # offsets frame is built from the SAME expression's actual totals,
    # so a boundary wobble of a few ulps moves a row between adjacent
    # buckets consistently on both sides and the prefix sums stay exact
    # (token counts never touch floating point).
    bucket = F.floor(
        (F.col(order_col).cast("double") - float(int(lo))) / float(width)
    ).cast("long")
    totals = (
        base.groupBy(bucket.alias("_bucket"))
        .agg(F.sum(value_col).alias("_tot"))
        .collect()
    )
    offs, acc = [], 0
    for row in sorted(totals, key=lambda r: r["_bucket"]):
        offs.append((row["_bucket"], acc))
        acc += row["_tot"]
    spark = base.sparkSession
    off_df = local_frame(spark, offs, "_bucket bigint, _bucket_off bigint")
    return bucket, off_df


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    text_col: str = "text",
    order_col: str = "doc_id",
    n_buckets: int = 64,
    count_col: str | None = None,
) -> DataFrame:
    """Assign every document its span in the packed training stream.

    Documents are laid out in `order_col` order (must be numeric and
    unique — the deterministic corpus order); each occupies
    [start_offset, start_offset + n_tokens) in the global token stream;
    sequence s covers tokens [s*seq_len, (s+1)*seq_len).

    `count_col`: pack by a precomputed per-doc token count (e.g. learned
    BPE counts from operators/tokenizer.py:token_counts) instead of the
    default whitespace tokenization of `text_col` — real training
    streams are laid out in model-tokenizer units, not words.

    Returns (order_col, n_tokens, start_offset, seq_first, seq_last,
    n_seqs) with n_seqs = seq_last - seq_first + 1 (the number of
    training sequences the document touches; >1 means it straddles a
    boundary and a loss-masking policy applies).

    Plan shape (the 100 TB contract): one map-side-combined aggregate for
    bucket totals, then a window partitioned BY BUCKET — never a global
    single-partition sort. Shuffle volume is one (order, n_tokens) pair
    per row; the text column is pruned before the exchange.
    """
    ntok = (
        F.col(count_col).cast("long")
        if count_col is not None
        else F.size(tokens(text_col)).cast("long")
    )
    base = docs.select(F.col(order_col), ntok.alias("n_tokens"))
    bucket, off_df = _bucket_offsets(base, order_col, "n_tokens", n_buckets)
    w = (
        W.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    staged = (
        base.withColumn("_bucket", bucket)
        .join(F.broadcast(off_df), "_bucket")
        .withColumn("start_offset", (local + F.col("_bucket_off")).cast("long"))
    )
    # Integer DIV, not floor(double-division): offsets on a 100 TB stream
    # approach 2^53, where double division stops being exact.
    seq_first = F.expr(f"start_offset DIV {int(seq_len)}").cast("long")
    seq_last = F.expr(
        f"(start_offset + n_tokens - 1) DIV {int(seq_len)}"
    ).cast("long")
    return staged.select(
        order_col,
        "n_tokens",
        "start_offset",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + 1).alias("n_seqs"),
    )


def shard_manifest(
    packed: DataFrame, seq_len: int = 512, seqs_per_shard: int = 8
) -> DataFrame:
    """Training-shard manifest over pack_sequences output: each document
    belongs to the shard its FIRST token lands in (shard =
    seq_first DIV seqs_per_shard); per shard report doc/token totals,
    the doc_id range (what a resumable exporter needs to re-emit one
    shard), and how many of its documents spill into the next shard
    (the cross-shard read a trainer must stitch). One map-side-combined
    aggregation over integer columns — the DuckDB oracle recomputes it
    exactly."""
    shard = F.expr(f"seq_first DIV {int(seqs_per_shard)}").cast("long")
    spills = F.sum(
        F.when(
            F.expr(f"seq_last DIV {int(seqs_per_shard)}") > shard, 1
        ).otherwise(0)
    )
    return (
        packed.groupBy(shard.alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min(packed.columns[0]).alias("first_doc"),
            F.max(packed.columns[0]).alias("last_doc"),
            spills.cast("long").alias("n_spill_docs"),
        )
    )


def packing_stats(packed: DataFrame, seq_len: int = 512) -> DataFrame:
    """Corpus-level packing audit over pack_sequences output: totals,
    boundary-crossing counts, and the tail-waste of the final partial
    sequence. One global aggregate (map-side combined, scalar result)."""
    agg = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("n_seqs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_straddlers"),
    )
    n_seqs_used = F.expr(
        f"(total_tokens + {int(seq_len) - 1}) DIV {int(seq_len)}"
    ).cast("long")
    return agg.select(
        "n_docs",
        "total_tokens",
        n_seqs_used.alias("n_sequences"),
        "n_straddlers",
        (n_seqs_used * seq_len - F.col("total_tokens"))
        .cast("long")
        .alias("tail_pad_tokens"),
    )
