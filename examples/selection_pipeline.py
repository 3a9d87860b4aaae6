#!/usr/bin/env python
"""Data-selection walkthrough — DSIR importance scoring and token-budget
corpus selection (operators/selection.py):

  1. train an importance model: hashed unigram+bigram bucket weights of
     a TARGET distribution (here: the English slice) vs the raw corpus;
  2. score every document (exact integer sums — reproducible anywhere);
  3. fill a global token budget with the highest-scoring documents;
  4. fill a PER-LANGUAGE budget (the mixture-aware form).

  python examples/selection_pipeline.py [sf_dir]

Runs self-contained against the synthetic documents table
(default /root/testdata/sf0.001).
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


def run(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators.selection import (
        dsir_score,
        dsir_weights,
        select_token_budget,
        select_token_budget_per_stratum,
    )
    from ct_mapreduce_spark.operators.text import tokens
    from ct_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)

    # 1. importance model: English looks "target", everything is "raw"
    weights = dsir_weights(
        docs.where(F.col("lang") == "en"), docs, n_buckets=256
    )
    print("weight table (model parameters, 256 rows):")
    weights.orderBy(F.desc("weight_micro")).show(5)

    # 2. integer importance scores
    scored = dsir_score(docs, weights, n_buckets=256)
    print("top-scoring documents:")
    scored.orderBy(F.desc("dsir_score_micro")).show(5)

    # narrow (id, lang, score, n_tokens) frame; checkpointed so the
    # scoring pipeline runs once, not once per bounded driver action
    frame = (
        docs.select(
            "doc_id",
            "lang",
            F.size(tokens("text")).cast("long").alias("n_tokens"),
        )
        .join(scored.select("doc_id", "dsir_score_micro"), "doc_id")
        .localCheckpoint()
    )
    total = frame.agg(F.sum("n_tokens")).collect()[0][0]

    # 3. global budget: half the corpus tokens, best-first
    budget = int(total) // 2
    picked = select_token_budget(
        frame, budget, "dsir_score_micro", count_col="n_tokens"
    )
    spent = picked.agg(
        F.count(F.lit(1)).alias("docs"), F.max("cum_tokens").alias("tokens")
    ).collect()[0]
    print(
        f"global budget {budget}: kept {spent['docs']} docs, "
        f"{spent['tokens']} tokens"
    )

    # 4. per-language budget: the same spend, split evenly across langs
    n_langs = frame.select("lang").distinct().count()
    per = max(budget // n_langs, 1)
    by_lang = select_token_budget_per_stratum(
        frame, per, "dsir_score_micro", "lang", count_col="n_tokens"
    )
    print(f"per-language budget {per}:")
    by_lang.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.max("cum_tokens").alias("tokens_spent"),
    ).orderBy("lang").show()


def main() -> None:
    from ct_mapreduce_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("selection-pipeline-example", shuffle_partitions=8)
    run(spark, sf_dir)


if __name__ == "__main__":
    main()
