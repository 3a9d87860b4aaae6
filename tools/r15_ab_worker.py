#!/usr/bin/env python
"""Worker for tools/r15_ab.py: run the named registry queries in THIS
checkout's package, min-of-N with the noop sink, print one JSON line
{query: min_sec}. Mirrors bench.py's timing methodology (same sink,
same per-iteration fresh plan) without the harness extras."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    queries = sys.argv[1].split(",")
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from ct_mapreduce_spark.plans.corpus import REGISTRY
    from ct_mapreduce_spark.session import get_spark

    spark = get_spark("r15-ab-worker")
    mins: dict[str, float] = {}
    for name in queries:
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        mins[name] = round(best, 3)
    print(json.dumps(mins))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
