"""The crawl-curation plan: WARC archives in, training-ready corpus out.

One composition of oracle-verified operators (each stage is separately
gated in plans/corpus.py), shared by `cli curate` and
examples/crawl_pipeline.py:

  WARC -> HTTP header strip -> HTML-to-text -> quality gate
       -> incremental MinHash dedup (probe index, append survivors)
       -> language mixture rebalance -> sequence packing
       -> shard manifest -> gzipped JSONL export

The dedup index persists under {workdir}/mh_index across invocations —
run the command per crawl drop and each batch dedups against everything
previously accepted (the O(batch) incremental architecture, never a
corpus re-pair)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def curate_crawl(
    spark: SparkSession,
    warc_dir: str,
    workdir: str,
    quality_min: float = 0.2,
    est_threshold: float = 0.9,
    seq_len: int = 512,
    seqs_per_shard: int = 8,
    n_export_shards: int = 2,
) -> dict:
    """Run the full curation pass; returns stage-count stats. Writes
    {workdir}/mh_index (created on first run, probed+grown after),
    {workdir}/export (gzipped JSONL shards), {workdir}/manifest
    (parquet shard manifest)."""
    from ct_mapreduce_spark.operators import dedup_fuzzy, sampling, text
    from ct_mapreduce_spark.operators.packing import (
        pack_sequences,
        shard_manifest,
    )
    from ct_mapreduce_spark.sources import text_source

    raw = text_source.read_warc(spark, warc_dir).where(
        F.col("warc_type") == "response"
    )
    txt = text.html_to_text(text.strip_http_headers(F.col("body")))
    docs = raw.select(
        F.xxhash64("record_id").alias("doc_id"),
        "url",
        txt.alias("text"),
    ).where(F.length("text") > 0)
    n_extracted = docs.count()

    qual = text.quality_score(docs).select("doc_id", "quality")
    good = docs.join(
        qual.where(F.col("quality") >= quality_min), "doc_id"
    ).select("doc_id", "text")
    n_good = good.count()

    idx = os.path.join(workdir, "mh_index")
    idx_exists = os.path.exists(os.path.join(idx, "sigs"))
    if idx_exists:  # later drops dedup against everything accepted before
        # two tiers: (1) id-level containment — a re-crawl of a page we
        # already ingested carries the SAME doc_id, which the minhash
        # probe correctly treats as "self" and skips; (2) near-dup
        # probe for new ids with known-similar content.
        existing = spark.read.parquet(os.path.join(idx, "sigs")).select(
            "doc_id"
        )
        fresh = good.join(existing, "doc_id", "left_anti")
        dups = (
            dedup_fuzzy.minhash_probe_index(spark, idx, fresh)
            .where(F.col("est_jaccard") >= est_threshold)
            .select(F.col("new_doc_id").alias("doc_id"))
            .distinct()
        )
        novel = fresh.join(F.broadcast(dups), "doc_id", "left_anti")
    else:  # first drop: within-batch dedup only
        novel = good
    within = (
        dedup_fuzzy.minhash_lsh_pairs(novel)
        .where(F.col("est_jaccard") >= est_threshold)
        .select(F.greatest("doc_a", "doc_b").alias("doc_id"))
        .distinct()
    )
    kept = novel.join(F.broadcast(within), "doc_id", "left_anti")
    kept = kept.localCheckpoint(eager=True)
    if idx_exists:
        dedup_fuzzy.minhash_index_append(kept, idx)
    else:
        dedup_fuzzy.minhash_index_build(kept, idx)
    n_kept = kept.count()

    langs = text.lang_id(kept).select(
        "doc_id", F.col("pred_lang").alias("lang")
    )
    balanced = sampling.mixture_rebalance(
        kept.join(langs, "doc_id"), "lang", "doc_id"
    ).select("doc_id", "text", "lang")
    n_balanced = balanced.count()

    packed = pack_sequences(balanced, seq_len=seq_len, n_buckets=64)
    manifest = shard_manifest(
        packed, seq_len=seq_len, seqs_per_shard=seqs_per_shard
    )
    manifest.write.mode("overwrite").parquet(os.path.join(workdir, "manifest"))
    text_source.write_jsonl_gz(
        balanced, os.path.join(workdir, "export"), n_shards=n_export_shards
    )
    n_shards = spark.read.parquet(os.path.join(workdir, "manifest")).count()
    return {
        "extracted": n_extracted,
        "quality_survivors": n_good,
        "after_dedup": n_kept,
        "after_mixture": n_balanced,
        "shards": n_shards,
    }
