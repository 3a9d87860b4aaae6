#!/usr/bin/env python
"""End-to-end training-data curation over the `documents` table:

  quality gate -> PII scrub -> near-dup pairs -> cluster -> keep-list
  -> deterministic train/val/test split

Every stage is an oracle-verified operator from ct_mapreduce_spark;
this script just composes them the way a corpus pipeline would.

  python examples/llm_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
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

from pyspark.sql import functions as F


def run(spark, sf_dir: str):
    from ct_mapreduce_spark.operators import dedup_fuzzy, sampling, text
    from ct_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    n_in = docs.count()

    # 1. quality gate
    qual = text.quality_score(docs).select("doc_id", "quality")
    good = docs.join(qual.where(F.col("quality") >= 0.6), "doc_id")

    # 2. PII audit (counts; redaction itself would rewrite `text`)
    pii = text.redact_pii(good)
    n_pii = pii.where(
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phoneish")) > 0
    ).count()

    # 3. near-dup pairs -> connected components -> canonical keep-list
    pairs = dedup_fuzzy.ngram_jaccard_pairs(good, threshold=0.12)
    clusters = dedup_fuzzy.dedup_clusters(good, pairs)
    keep = clusters.where(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )

    # 4. stable splits over the survivors
    final = sampling.hash_split(
        good.join(keep, "doc_id"), "doc_id", {"train": 80, "val": 10, "test": 10}
    )
    by_split = {
        r.split: r.n for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    print(f"input docs:        {n_in}")
    print(f"quality survivors: {good.count()}")
    print(f"docs w/ PII hits:  {n_pii}")
    print(f"keep-list size:    {keep.count()}")
    print(f"splits:            {by_split}")
    return by_split


if __name__ == "__main__":
    from ct_mapreduce_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    run(get_spark("llm-pipeline-example"), sf)
