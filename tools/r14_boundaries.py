#!/usr/bin/env python
"""Round-14 boundary rungs (r13 verdict task 5): the two hand-picked
constants that gate plan shape on the ANN serve paths, measured ON the
boundary instead of far from it.

A. _PROBE_FANOUT_MIN_CELLS = 256 (similarity._assign_probes): below it
   a query batch keeps its input partitioning through the probe
   crossJoin (pinned 16-cell serves stay exchange-free); at or above it
   the batch is fan_out'd first. Rung: the SAME serve at n_cells = 255
   vs 256 — a pinned-sized batch (40 queries, walls must be comparable:
   the added exchange cannot cliff the small serve) and a big one-file
   batch (2048 queries in ONE parquet file, the r13 straggler shape:
   the fanned 256 side must not be slower than the unfanned 255 side).

B. _LUT_BROADCAST_BYTES = 64 MB (similarity._pq_adc_rank): above this
   estimated LUT payload (n_queries x m_sub x n_codes x 8 x n_probe)
   the broadcast hint is dropped and AQE picks the join. At the default
   16x256 geometry with n_probe=4 the flip sits at 512 queries. Rung:
   480 queries (hinted, ~60 MB) vs 544 (unhinted, ~68 MB) against the
   same store — walls must be comparable (no transport cliff at the
   flip; r13 proved the hint HURTS far above it, this proves dropping
   it doesn't hurt just past it).

Walls are min-of-2 (cold JVM noise). One JSON line; findings land in
BASELINE.md, raw artifact in tools/artifacts/.
"""

from __future__ import annotations

import json
import math
import random
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIM = 64
N_CLUSTERS = 480
PER = 125


def main_lutsweep() -> None:
    """--lutsweep: relocate the LUT broadcast cap by measurement. The
    boundary rung found the forced broadcast ~1.6x slower per query
    just UNDER the 64 MB cap — so where DOES the hint stop helping?
    Same store, batch sizes from 32 to 512 queries (payloads 4-67 MB at
    the 16x256 x 4-probe geometry), each served twice with the cap
    monkeypatched to force the hint ON and OFF (a measurement-harness
    move; the constant itself is the deliverable). min-of-2 walls."""
    import random as _random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import similarity
    from ct_mapreduce_spark.session import get_spark

    spark = get_spark("r14-lutsweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    path = f"/tmp/ctspark_centq_{N_CLUSTERS}x{PER}_d{DIM}"
    corpus = spark.read.parquet(path)
    n_rows = corpus.count()
    root = tempfile.mkdtemp(prefix="ctspark_r14_lutsweep_")
    m_sub, n_codes, n_probe = 16, 256, 4
    lut_bytes = m_sub * n_codes * 8
    idx = f"{root}/pq_ivf"
    similarity.pq_ivf_build_index(
        corpus, idx, n_cells=117, m_sub=m_sub, n_codes=n_codes
    )
    results: dict = {"lut_bytes_per_query_probe": lut_bytes * n_probe}
    cap0 = similarity._LUT_BROADCAST_BYTES
    try:
        for n_q in (32, 64, 128, 256, 512):
            bp = f"{root}/batch_{n_q}"
            corpus.where(F.col("vec_id") % (n_rows // n_q) == 0).limit(
                n_q
            ).coalesce(1).write.mode("overwrite").parquet(bp)
            batch = spark.read.parquet(bp)
            row: dict = {
                "est_payload_mb": round(n_q * lut_bytes * n_probe / 1e6, 1)
            }
            for mode, cap in (("hinted", 1 << 60), ("unhinted", 0)):
                similarity._LUT_BROADCAST_BYTES = cap
                times = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    similarity.pq_ivf_topk_indexed(
                        spark, idx, batch, k=5, n_probe=n_probe
                    ).count()
                    times.append(time.perf_counter() - t0)
                row[mode + "_s"] = round(min(times), 2)
            row["hint_speedup"] = round(
                row["unhinted_s"] / max(row["hinted_s"], 1e-9), 2
            )
            results[f"q{n_q}"] = row
            print(f"q{n_q}: {row}", file=sys.stderr)
    finally:
        similarity._LUT_BROADCAST_BYTES = cap0
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


def main() -> None:
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import similarity
    from ct_mapreduce_spark.session import get_spark

    spark = get_spark("r14-boundaries")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # centroid_quality's planted corpus (same cached /tmp artifact)
    path = f"/tmp/ctspark_centq_{N_CLUSTERS}x{PER}_d{DIM}"
    try:
        spark.read.parquet(path).head(1)
    except Exception:
        rng = random.Random(7)
        rows = []
        vid = 0
        for _c in range(N_CLUSTERS):
            center = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
            nrm = math.sqrt(sum(x * x for x in center))
            center = [x / nrm for x in center]
            for _ in range(PER):
                v = [x + rng.gauss(0.0, 0.08) for x in center]
                rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))
                vid += 1
        spark.createDataFrame(rows).repartition(32).write.mode(
            "overwrite"
        ).parquet(path)
    corpus = spark.read.parquet(path)
    n_rows = corpus.count()
    results: dict = {"corpus_rows": n_rows}
    root = tempfile.mkdtemp(prefix="ctspark_r14_boundaries_")

    def _one_file_batch(n: int) -> str:
        p = f"{root}/batch_{n}"
        corpus.where(F.col("vec_id") % (n_rows // n) == 0).limit(
            n
        ).coalesce(1).write.mode("overwrite").parquet(p)
        return p

    def _wall(fn) -> float:
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return round(min(times), 2)

    # ---------------- boundary A: probe fan-out ----------------
    fanout_min = similarity._PROBE_FANOUT_MIN_CELLS
    assert fanout_min == 256, fanout_min  # rung geometry assumes it
    stores = {}
    for n_cells in (fanout_min - 1, fanout_min):
        idx = f"{root}/ivf_{n_cells}"
        similarity.ivf_build_index(corpus, idx, n_cells=n_cells)
        stores[n_cells] = idx
    probe_a: dict = {}
    for label, n_q in (("small_40q", 40), ("onefile_2048q", 2048)):
        bp = _one_file_batch(n_q)
        walls = {}
        for n_cells, idx in stores.items():
            batch = spark.read.parquet(bp)
            walls[str(n_cells)] = _wall(
                lambda: similarity.ivf_topk_indexed(
                    spark, idx, batch, k=5, n_probe=4
                ).count()
            )
        probe_a[label] = walls
    results["probe_fanout_boundary"] = probe_a
    # gates: no cliff in either direction at the flip
    small = probe_a["small_40q"]
    big = probe_a["onefile_2048q"]
    assert small["256"] <= max(3.0 * small["255"], small["255"] + 2.0), probe_a
    assert big["256"] <= 1.5 * big["255"] + 1.0, probe_a
    print(f"probe_fanout_boundary: {probe_a}", file=sys.stderr)

    # ---------------- boundary B: LUT broadcast cap ----------------
    # store kept BELOW the probe-fanout boundary so boundary A's flip
    # stays out of this measurement
    m_sub, n_codes, n_probe = 16, 256, 4
    lut_bytes = m_sub * n_codes * 8
    flip_q = similarity._LUT_BROADCAST_BYTES // (lut_bytes * n_probe)
    results["lut_flip_queries"] = flip_q  # 512 at the default geometry
    idx = f"{root}/pq_ivf"
    similarity.pq_ivf_build_index(
        corpus, idx, n_cells=117, m_sub=m_sub, n_codes=n_codes
    )
    probe_b: dict = {}
    for label, n_q in (
        ("under_cap", int(flip_q * 0.9375)),  # 480 -> ~60 MB, hinted
        ("over_cap", int(flip_q * 1.0625)),  # 544 -> ~68 MB, unhinted
    ):
        bp = _one_file_batch(n_q)
        batch = spark.read.parquet(bp)
        est_mb = round(n_q * lut_bytes * n_probe / 1e6, 1)
        probe_b[label] = {
            "n_queries": n_q,
            "est_payload_mb": est_mb,
            "wall_s": _wall(
                lambda: similarity.pq_ivf_topk_indexed(
                    spark, idx, batch, k=5, n_probe=n_probe
                ).count()
            ),
        }
    results["lut_broadcast_boundary"] = probe_b
    assert (
        probe_b["over_cap"]["wall_s"]
        <= 2.0 * probe_b["under_cap"]["wall_s"] + 1.0
    ), probe_b
    print(f"lut_broadcast_boundary: {probe_b}", file=sys.stderr)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    if "--lutsweep" in sys.argv:
        main_lutsweep()
    else:
        main()
