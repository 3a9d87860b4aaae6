#!/usr/bin/env python
"""Tokenizer-centric training-data flow (operators/tokenizer.py, also
exposed as `cli tokenize`):

  corpus -> word-frequency pass (distributed, top-V capped)
  -> BPE merge training (driver-side on the model-sized table)
  -> merge-table model artifact (parquet)
  -> id vocabulary -> distributed id encoding (memoized mapInPandas)
  -> sequence packing in LEARNED-tokenizer units (count_col)
  -> shard manifest

  python examples/tokenizer_pipeline.py [workdir]

Runs self-contained on the sf0.001 documents table. The same flow at
100 TB keeps the identical plan shape: one map-side-combined frequency
aggregation, a bounded driver collect (top_v rows), and narrow encode /
packing stages — the merge loop's cost depends on vocabulary size, not
corpus bytes.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# Python UDF workers don't inherit the driver's sys.path — propagate the
# repo root through the environment so mapInPandas stages import cleanly
# when this script runs from any cwd (local mode spawns workers with the
# driver's env).
import os  # noqa: E402

_root = str(Path(__file__).resolve().parent.parent)
os.environ["PYTHONPATH"] = _root + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)


def run(spark, workdir: str):
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import tokenizer
    from ct_mapreduce_spark.operators.packing import (
        pack_sequences,
        shard_manifest,
    )
    from ct_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )

    # 1. train: one corpus pass + driver merges; persist the model
    freq = tokenizer.word_frequencies(docs, top_v=8192)
    merges = tokenizer.bpe_train(freq, n_merges=64)
    model = f"{workdir}/bpe_model"
    tokenizer.save_merges(spark, merges, model)
    print(f"trained {len(merges)} merges -> {model}")

    # 2. vocabulary + id encoding (the dataloader-ready shape)
    vocab = tokenizer.bpe_vocab(merges, tokenizer.alphabet_of(freq))
    ids = tokenizer.bpe_encode_ids(docs, merges, vocab)
    ids.select("doc_id", F.slice("token_ids", 1, 8).alias("head")).show(
        3, truncate=False
    )

    # 3. pack the training stream in BPE units, manifest the shards
    counts = tokenizer.token_counts(docs, merges)
    packed = pack_sequences(counts, seq_len=256, count_col="n_bpe_tokens")
    manifest = shard_manifest(packed, seq_len=256, seqs_per_shard=8)
    print("shard manifest (BPE-unit token totals):")
    manifest.orderBy("shard").show()


def main() -> int:
    from ct_mapreduce_spark.session import get_spark

    workdir = (
        sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="tokex_")
    )
    spark = get_spark("tokenizer-pipeline-example")
    run(spark, workdir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
