#!/usr/bin/env python
"""Interleaved fresh-process A/B for the curate e2e entries (bench.py's
_bench_curate, which is not a registry query). Same protocol as
tools/r15_ab.py: alternate sides, fresh Spark process per run (cwd +
PYTHONPATH at the checkout root so Python workers import that tree's
package), min-of-ITERATIONS inside each process, several rounds.

Usage:
  python tools/r15_curate_ab.py --b /tmp/repo_r13 [--rounds 3] [--full]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys
import bench
from ct_mapreduce_spark.session import get_spark
spark = get_spark("curate-ab")
times, walls = bench._bench_curate(spark, full=(sys.argv[1] == "full"))
print(json.dumps({"min": min(times), "times": times, "walls": walls}))
"""


def run_side(root: str, full: bool) -> dict:
    env = {**os.environ, "PYTHONPATH": root}
    out = subprocess.run(
        [sys.executable, "-c", WORKER, "full" if full else "crawl"],
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
    p.add_argument("--full", action="store_true")
    args = p.parse_args()
    res: dict[str, list] = {"a": [], "b": []}
    walls: dict[str, dict] = {}
    for rnd in range(args.rounds):
        for side, root in (("a", args.a), ("b", args.b)):
            r = run_side(root, args.full)
            res[side].append(r["min"])
            walls[side] = r["walls"]
            print(f"round {rnd} side {side}: min {r['min']:.3f} "
                  f"times {r['times']}", flush=True)
    print(json.dumps({"mins": res, "last_walls": walls}))
    print(
        f"A best {min(res['a']):.3f} | B best {min(res['b']):.3f} "
        f"({'full' if args.full else 'crawl'})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
