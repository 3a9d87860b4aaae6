#!/usr/bin/env python
"""End-to-end web-crawl curation — the Common Crawl shape, WARC to
training shards, every stage an operator from ct_mapreduce_spark:

  WARC archives -> HTTP header strip -> HTML-to-text -> quality gate
  -> incremental MinHash dedup against a corpus index -> mixture
  rebalance -> sequence packing -> shard manifest -> JSONL.gz export

  python examples/crawl_pipeline.py [workdir]

The script synthesizes a small crawl fixture (two WARC archives, one
gzipped) so it runs self-contained; point `read_warc` at real archives
and nothing else changes.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def run(spark, workdir: str):
    from ct_mapreduce_spark.operators import dedup_fuzzy, sampling, text
    from ct_mapreduce_spark.operators.packing import (
        pack_sequences,
        shard_manifest,
    )
    from ct_mapreduce_spark.sources import text_source

    # 0. a self-contained crawl (swap for real archives in production)
    crawl = f"{workdir}/crawl"
    text_source.synthetic_warc_html_fixture(crawl, n=48)

    # 1. WARC -> visible text
    raw = text_source.read_warc(spark, crawl).where(
        F.col("warc_type") == "response"
    )
    txt = text.html_to_text(text.strip_http_headers(F.col("body")))
    docs = raw.select(
        F.xxhash64("record_id").alias("doc_id"),
        F.col("url").alias("url"),
        txt.alias("text"),
    ).where(F.length("text") > 0)
    n_extracted = docs.count()

    # 2. quality gate
    qual = text.quality_score(docs).select("doc_id", "quality")
    good = docs.join(qual.where(F.col("quality") >= 0.2), "doc_id")

    # 3. incremental dedup: probe the historical index, keep novel docs,
    #    fold survivors back in for the next crawl drop
    idx = f"{workdir}/mh_index"
    seed_corpus = good.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    dedup_fuzzy.minhash_index_build(seed_corpus, idx)
    batch = good.where(F.col("doc_id") % 2 != 0).select("doc_id", "text")
    dups = (
        dedup_fuzzy.minhash_probe_index(spark, idx, batch)
        .where(F.col("est_jaccard") >= 0.9)
        .select(F.col("new_doc_id").alias("doc_id"))
        .distinct()
    )
    novel = batch.join(F.broadcast(dups), "doc_id", "left_anti")
    dedup_fuzzy.minhash_index_append(novel, idx)
    kept = seed_corpus.unionByName(novel)

    # 4. language-balanced mixture (langs derived by the lang-id tier)
    langs = text.lang_id(kept).select(
        "doc_id", F.col("pred_lang").alias("lang")
    )
    balanced = sampling.mixture_rebalance(
        kept.join(langs, "doc_id"), "lang", "doc_id"
    ).select("doc_id", "text", "lang")

    # 5. pack into 512-token sequences, manifest 4096-token shards
    packed = pack_sequences(balanced, seq_len=512, n_buckets=8)
    manifest = shard_manifest(packed, seq_len=512, seqs_per_shard=8)

    # 6. export the curated corpus as gzipped JSONL shards
    text_source.write_jsonl_gz(balanced, f"{workdir}/export", n_shards=2)

    stats = {
        "extracted": n_extracted,
        "quality_survivors": good.count(),
        "after_dedup": kept.count(),
        "after_mixture": balanced.count(),
        "shards": manifest.count(),
        "exported": spark.read.option("compression", "gzip")
        .json(f"{workdir}/export")
        .count(),
    }
    for k, v in stats.items():
        print(f"{k:18s} {v}")
    return stats


def main() -> int:
    from ct_mapreduce_spark.session import get_spark

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="ctspark_crawl_"
    )
    spark = get_spark("crawl-pipeline")
    run(spark, workdir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
