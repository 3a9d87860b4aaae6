#!/usr/bin/env python
"""Interleaved fresh-process A/B for the ingest bench entries (bench.py's
_bench_ingest, not registry queries). Same protocol as r15_curate_ab.py.

Usage: python tools/r15_ingest_ab.py --b /tmp/repo_prezstd [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json
import bench
from ct_mapreduce_spark.session import get_spark
spark = get_spark("ingest-ab")
flat = bench._bench_ingest(spark)
skew = bench._bench_ingest(spark, hot_issuer_weight=0.8)
print(json.dumps({"flat": min(flat), "skew": min(skew),
                  "flat_times": flat, "skew_times": skew}))
"""


def run_side(root: str) -> dict:
    env = {**os.environ, "PYTHONPATH": root}
    out = subprocess.run(
        [sys.executable, "-c", WORKER],
        cwd=root,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    last = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    try:
        return json.loads(last)
    except Exception:
        print("WORKER FAILED:", out.stdout[-2000:], out.stderr[-2000:])
        raise


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--b", required=True)
    p.add_argument("--a", default="/root/repo")
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()
    res: dict[str, dict[str, list]] = {
        q: {"a": [], "b": []} for q in ("flat", "skew")
    }
    for rnd in range(args.rounds):
        for side, root in (("a", args.a), ("b", args.b)):
            r = run_side(root)
            for q in ("flat", "skew"):
                res[q][side].append(r[q])
            print(f"round {rnd} side {side}: {r}", flush=True)
    print(json.dumps(res))
    for q in ("flat", "skew"):
        a, b = res[q]["a"], res[q]["b"]
        print(f"{q}: A best {min(a):.3f} | B best {min(b):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
