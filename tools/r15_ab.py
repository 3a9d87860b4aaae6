#!/usr/bin/env python
"""Interleaved fresh-process A/B for bench queries (BASELINE.md r9
protocol of record): run the named queries in TWO repo checkouts,
alternating A/B/A/B..., one fresh Spark process per run, min-of-N
within each process, several rounds. Prints per-round mins and the
cross-round min for each side.

Usage:
  python tools/r15_ab.py --queries q1,q2 [--rounds 3] [--iters 3]
                         [--a /root/repo] [--b /root/repo-old]
                         [--sf /root/testdata/sf0.1] [--cpus 32]

Each run shells out to `python tools/r15_ab_worker.py <queries>` with
cwd at the checkout root, so each side executes ITS OWN package code.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path


def run_side(root: str, queries: list[str], iters: int, sf: str, cpus: str):
    env = dict(
        SPARK_GRAFT_SF_DIR=sf,
        SPARK_GRAFT_CPUS=cpus,
    )
    import os

    full_env = {**os.environ, **env}
    out = subprocess.run(
        [sys.executable, "tools/r15_ab_worker.py", ",".join(queries), str(iters)],
        cwd=root,
        env=full_env,
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
    p.add_argument("--queries", required=True)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--a", default="/root/repo")
    p.add_argument("--b", required=True)
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--cpus", default="32")
    args = p.parse_args()
    queries = args.queries.split(",")
    results: dict[str, dict[str, list[float]]] = {
        q: {"a": [], "b": []} for q in queries
    }
    for rnd in range(args.rounds):
        for side, root in (("a", args.a), ("b", args.b)):
            r = run_side(root, queries, args.iters, args.sf, args.cpus)
            for q in queries:
                results[q][side].append(r.get(q, float("nan")))
            print(f"round {rnd} side {side}: {r}", flush=True)
    print(json.dumps(results))
    for q in queries:
        a, b = results[q]["a"], results[q]["b"]
        print(
            f"{q}: A mins {['%.3f' % x for x in a]} (best {min(a):.3f}) | "
            f"B mins {['%.3f' % x for x in b]} (best {min(b):.3f})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
