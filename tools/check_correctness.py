#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run every queries() entry
via Spark and its oracle_sql() via DuckDB on the same parquet, compare
row count, schema (column names), and order-insensitive values.

Usage: python tools/check_correctness.py [query_name ...] [--sf DIR]
                                         [--json OUT.json]

--json writes a per-query artifact (the full-registry round record the
driver's fixed 50-query gate doesn't cover — r5 verdict task 1). Every
query is individually fault-isolated, and the file is written even if
the run dies mid-sweep (try/finally), so one bad query can't blank the
artifact — bench.py's posture.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<null>"
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(canon(x) for x in v) + "]"
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return str(v)

    out = df.apply(lambda col: col.map(canon))
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    else:
        sf_dir = SF_DIR
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]

    import __spark_entry__ as entrymod
    from ct_mapreduce_spark.session import get_spark
    from ct_mapreduce_spark.schemas import TESTDATA_TABLES

    spark = get_spark("check-correctness", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or sorted(queries)
    n_pass = n_fail = n_rows_only = 0
    record: dict[str, dict] = {}
    try:
        for name in names:
            try:
                sdf = queries[name](spark, sf_dir).toPandas()
            except Exception as e:
                print(f"FAIL {name}: spark error: {e}")
                record[name] = {
                    "status": "fail",
                    "detail": f"spark error: {type(e).__name__}: {e}"[:300],
                }
                n_fail += 1
                continue
            if name not in oracles:
                print(f"ROWS-ONLY {name}: {len(sdf)} rows (no oracle)")
                record[name] = {"status": "rows_only", "rows": len(sdf)}
                n_rows_only += 1
                continue
            try:
                odf = con.execute(oracles[name]).df()
            except Exception as e:
                print(f"FAIL {name}: duckdb error: {e}")
                record[name] = {
                    "status": "fail",
                    "detail": f"duckdb error: {type(e).__name__}: {e}"[:300],
                }
                n_fail += 1
                continue
            problems = []
            if len(sdf) != len(odf):
                problems.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
            if sorted(sdf.columns) != sorted(odf.columns):
                problems.append(f"schema spark={sorted(sdf.columns)} duck={sorted(odf.columns)}")
            if not problems:
                ns, no = normalize(sdf), normalize(odf)
                if not ns.equals(no):
                    diff_cols = [
                        c for c in ns.columns if not ns[c].equals(no[c])
                    ]
                    mask = (ns != no).any(axis=1)
                    ex = pd.concat(
                        [ns[mask].head(3).add_prefix("s_"), no[mask].head(3).add_prefix("o_")],
                        axis=1,
                    )
                    problems.append(f"values differ in {diff_cols}\n{ex.to_string()}")
            if problems:
                print(f"FAIL {name}: " + "; ".join(problems))
                record[name] = {"status": "fail", "detail": "; ".join(problems)[:500]}
                n_fail += 1
            else:
                print(f"PASS {name} ({len(sdf)} rows)")
                record[name] = {"status": "pass", "rows": len(sdf)}
                n_pass += 1
    finally:
        if json_out:
            import json

            with open(json_out, "w") as f:
                json.dump(
                    {
                        "sf_dir": sf_dir,
                        "n_queries": len(names),
                        "n_pass": n_pass,
                        "n_fail": n_fail,
                        "n_rows_only": n_rows_only,
                        "queries": record,
                    },
                    f,
                    indent=1,
                    sort_keys=True,
                )
                f.write("\n")
            print(f"wrote {json_out}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
