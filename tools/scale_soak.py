#!/usr/bin/env python
"""10x/100x scale soak for the two heaviest pipelines (r3 task 7):

- ingest_batch + write_store at 20k / 200k / 2M synthetic certs
- minhash_lsh_pairs at 1x / 10x the sf0.1 documents corpus (the 10x
  corpus is built JVM-side by replicating each doc with a perturbed tail
  token — deliberately near-dup-heavy, so the banded self-join does real
  pair work instead of the random-corpus nothing)

Protocol: source parquet materialized to /tmp first (generation excluded,
like bench.py's ingest entries); each rung timed twice, both iterations
recorded. Prints one JSON line; findings land in BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

INGEST_RUNGS = [20_000, 200_000, 2_000_000]
DOC_MULTS = [1, 10]
ITERATIONS = 2


def _certs_path(spark, n: int) -> str:
    path = f"/tmp/ctspark_soak_certs_{n}"
    try:
        spark.read.parquet(path).head(1)
    except Exception:
        from ct_mapreduce_spark.sources.certificates import synthetic_certificates

        synthetic_certificates(spark, n=n).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    import datetime as dt

    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators.dedup_fuzzy import minhash_lsh_pairs
    from ct_mapreduce_spark.plans.ingest import ingest_batch, write_store
    from ct_mapreduce_spark.session import get_spark
    from ct_mapreduce_spark.sources.tables import load_table

    spark = get_spark("scale-soak")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    now = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)

    results: dict[str, dict] = {}
    for n in INGEST_RUNGS:
        certs = spark.read.parquet(_certs_path(spark, n))
        times = []
        for _ in range(ITERATIONS):
            out = tempfile.mkdtemp(prefix="ctspark_soak_store_")
            t0 = time.perf_counter()
            write_store(ingest_batch(certs, now=now), out)
            times.append(round(time.perf_counter() - t0, 2))
            shutil.rmtree(out, ignore_errors=True)
        results[f"ingest_{n}"] = {"iterations": times, "min": min(times)}
        print(f"ingest n={n}: {times}", file=sys.stderr)

    base_docs = load_table(spark, "documents", "/root/testdata/sf0.1")
    for mult in DOC_MULTS:
        if mult == 1:
            docs = base_docs
        else:
            reps = spark.range(mult).withColumnRenamed("id", "_rep")
            docs = base_docs.crossJoin(reps).select(
                (F.col("doc_id") * mult + F.col("_rep")).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" v"), F.col("_rep").cast("string")
                ).alias("text"),
            )
        times = []
        n_pairs = None
        for _ in range(ITERATIONS):
            t0 = time.perf_counter()
            out = minhash_lsh_pairs(docs)
            n_pairs = out.count()
            times.append(round(time.perf_counter() - t0, 2))
        results[f"minhash_x{mult}"] = {
            "iterations": times,
            "min": min(times),
            "n_pairs": n_pairs,
        }
        print(f"minhash x{mult}: {times} pairs={n_pairs}", file=sys.stderr)

    import math

    def expo(a: str, b: str, factor: float) -> float:
        return round(
            math.log(results[b]["min"] / results[a]["min"]) / math.log(factor), 3
        )

    results["scaling"] = {
        "ingest_20k_to_200k": expo("ingest_20000", "ingest_200000", 10),
        "ingest_200k_to_2M": expo("ingest_200000", "ingest_2000000", 10),
        "minhash_1x_to_10x": expo("minhash_x1", "minhash_x10", 10),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
