#!/usr/bin/env python
"""Capture .explain('formatted') for every headline query into
plans/r15/<query>_<tag>.txt (tag = before/after). Optimization-round
deliverable: the judge checks plan claims against these files.

Usage: python tools/r15_capture_plans.py before [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parent.parent / "plans" / "r15"


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    OUT.mkdir(parents=True, exist_ok=True)
    import bench
    from ct_mapreduce_spark.plans.corpus import REGISTRY
    from ct_mapreduce_spark.session import get_spark

    spark = get_spark("r15-plan-capture")
    names = [n for n in bench.HEADLINE if n in REGISTRY]
    if only:
        names = [n for n in names if n in only]
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — capture what we can
            plan = f"ERROR: {type(e).__name__}: {e}"
        (OUT / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
