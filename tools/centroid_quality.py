#!/usr/bin/env python
"""Centroid quality as a measured choice (r12, r11 verdict task 2).

_ivf_centroid_frame picks centroids by deterministic hash — a sampled
MEMBER, not a mean. ivf_refine_centroids (Lloyd on a hash-sample) exists
and the refined compositions are pinned, but the BUILD DEFAULT for
ivf_build_index / pq_ivf_build_index is unrefined. This measures what
refinement is worth on a corpus with real neighborhood structure
(planted clusters — the fixture family the recall pytests use, at x10
scale: 60k vectors, 480 clusters) under the build/serve split: build
wall (hash-pick vs +2 Lloyd iterations on a 1/4 sample) vs serve
recall@5 against exact brute-force cosine top-k.

Variants measured, all at n_cells = rows/512, n_probe = 4:
- ivf: full-vector IVF store (ivf_build_index + ivf_topk_indexed)
- pq_ivf raw: IVFADC codes store, codebooks over raw vectors
- pq_ivf residual: codebooks over x - centroid(cell(x)) — the tier whose
  premise (spend the codebook on the within-cell part) depends most on
  centroids being means, so refinement should move it most
PQ variants served bare (ADC-ranked), with exact re-rank of a 4x
shortlist (the pinned bench query's shape), and with a cluster-sized
25x shortlist. On this fixture the 125 near-duplicate co-members are
ADC-indistinguishable (their exact cosines differ in the noise), so
small-shortlist recall measures PQ RESOLUTION, not the coarse
quantizer; the direct centroid-quality number is `coverage` — the
fraction of true top-5 neighbors whose stored cell is among the
query's n_probe probed cells (the quantity refinement can move).

Prints one JSON line; the recall table and the default decision land in
BASELINE.md.
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
PER = 125  # 60k vectors — ~x10 the sf0.1 embeddings table
N_QUERIES = 64
K = 5
N_PROBE = 4


def main_16k() -> None:
    """r14 (r13 verdict task 2): push the distributed-refinement evidence
    past the budget boundary. r13 measured coverage parity only at
    n_cells = 4097 (one over the budget); this rung rebuilds the same
    comparison at 16384 cells on a 2M-vector planted corpus (4096
    clusters x 512 members, noise 0.05 so true neighbors are co-cluster
    members with a wide margin), where the two-level E-step's
    approximation has 4x more cells to mis-assign across and the refiner
    runs 2 distributed Lloyd iterations on a 1/4 sample.

    Gates (the r13 rung's, re-asserted at 4x the boundary scale):
    - driver model rows <= isqrt(n_cells) (=128) through build + refine;
    - refined-distributed coverage under EXACT probes within ~2 points
      of the one-level driver-side Lloyd control (budget raised only as
      a measurement harness);
    - the number the store SERVES with (two-level probes) improves over
      unrefined hash-pick.
    Everything corpus-sized stays distributed: generation, the exact
    top-k oracle (within-cluster candidates — inter-cluster cosine max
    ~0.7 vs co-member ~0.87, so the true top-5 is in-cluster), and the
    coverage join (no 2M-row collect)."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from ct_mapreduce_spark.operators import similarity
    from ct_mapreduce_spark.session import get_spark

    spark = get_spark("centroid-quality-16k")
    dim, n_clusters, per = 64, 4096, 512
    n_rows = n_clusters * per
    n_cells = 16384  # rows // 128
    k = 5
    # two probe depths: 8 covers a planted cluster's ~4-cell span with
    # slack (the serve-realistic depth), 3 under-covers it so probed-cell
    # coverage actually DISCRIMINATES centroid quality — at depth 8 the
    # first x16k run saturated every variant at ~1.0 (hashpick included)
    # and the refined-beats-hashpick gate had nothing to measure. Gates
    # run at the stressed depth; both are recorded.
    n_probe, probe_stress = 8, 3
    sqrt_cap = max(16, math.isqrt(n_cells))

    path = f"/tmp/ctspark_centq16k_{n_clusters}x{per}_d{dim}"
    try:
        spark.read.parquet(path).head(1)
    except Exception:
        rng = random.Random(11)
        crows = []
        for c in range(n_clusters):
            center = [rng.gauss(0.0, 1.0) for _ in range(dim)]
            nrm = math.sqrt(sum(x * x for x in center))
            crows.append(Row(cluster_id=c, center=[x / nrm for x in center]))
        centers = spark.createDataFrame(crows)
        members = spark.range(per).select(F.col("id").alias("m"))
        (
            centers.crossJoin(members)
            .repartition(64)
            .select(
                (F.col("cluster_id") * per + F.col("m")).alias("vec_id"),
                "cluster_id",
                F.array(
                    *[
                        (
                            F.element_at("center", j + 1)
                            + F.randn(1000 + j) * F.lit(0.05)
                        ).cast("float")
                        for j in range(dim)
                    ]
                ).alias("embedding"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    corpus_full = spark.read.parquet(path)
    corpus = corpus_full.select("vec_id", "embedding")
    queries = corpus_full.where(
        F.col("vec_id") % (n_rows // N_QUERIES) == 0
    ).localCheckpoint(eager=True)

    # exact top-k oracle, distributed: candidates restricted to the
    # query's own planted cluster (see docstring for the margin argument)
    qside = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("cluster_id").alias("qc"),
        F.col("embedding").alias("qvec"),
    )
    cand = corpus_full.join(
        F.broadcast(qside), F.col("cluster_id") == F.col("qc")
    ).where(F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(
            "embedding", "qvec", lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    scored = cand.withColumn(
        "cos", dot / (nrm(F.col("embedding")) * nrm(F.col("qvec")))
    )
    topw = W.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    exact = (
        scored.withColumn("rank", F.row_number().over(topw))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    print(
        f"corpus={n_rows} cells={n_cells} exact pairs={n_exact}",
        file=sys.stderr,
    )
    results: dict = {
        "corpus_rows": n_rows,
        "n_cells": n_cells,
        "n_probe": n_probe,
        "exact_pairs": n_exact,
    }

    def _coverage(idx: str, qa) -> float:
        # (exact pair -> neighbor's stored cell) x (query's probed
        # cells): two joins over model-sized frames + the codes scan,
        # nothing corpus-sized collects
        ncell = (
            spark.read.parquet(idx + "/codes")
            .select(F.col("vec_id").alias("neighbor_id"), "cell")
            .join(F.broadcast(exact), "neighbor_id")
        )
        hit = ncell.join(
            F.broadcast(qa.select("query_id", "cell")),
            ["query_id", "cell"],
            "left_semi",
        )
        return round(hit.count() / n_exact, 4)

    def _recall_rerank(idx: str) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.pq_ivf_topk_indexed(
                spark, idx, queries, k=k, n_probe=n_probe,
                rerank_corpus=corpus, rerank_factor=4,
            ).collect()
        }
        ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        return round(len(ex & got) / len(ex), 4)

    def _exact_cov(idx, cents, n) -> float:
        return _coverage(
            idx,
            similarity._assign_probes(
                queries, cents, "vec_id", "embedding", "query", n
            ),
        )

    def _served_cov(idx, cents, n) -> float:
        return _coverage(
            idx,
            similarity._two_level_assign(
                queries, cents, n_cells, "vec_id", "embedding", "query", t=n
            ),
        )

    for tag, refine in (("x16k_hashpick", 0), ("x16k_refined_distributed", 2)):
        idx = tempfile.mkdtemp(prefix=f"ctspark_centq_{tag}_")
        t0 = time.perf_counter()
        similarity.pq_ivf_build_index(
            corpus, idx, n_cells=n_cells, refine_iters=refine,
            refine_sample_mod=4,
        )
        build_s = round(time.perf_counter() - t0, 2)
        model_rows = similarity._LAST_DRIVER_MODEL_ROWS
        assert model_rows <= sqrt_cap, (tag, model_rows, sqrt_cap)
        cents = spark.read.parquet(idx + "/_centroids")
        results[tag] = {
            "build_s": build_s,
            "driver_model_rows": model_rows,
            "coverage_exact_probes": _exact_cov(idx, cents, n_probe),
            "coverage_served": _served_cov(idx, cents, n_probe),
            f"coverage_exact_probes_p{probe_stress}": _exact_cov(
                idx, cents, probe_stress
            ),
            f"coverage_served_p{probe_stress}": _served_cov(
                idx, cents, probe_stress
            ),
            "recall_rerank4": _recall_rerank(idx),
        }
        print(f"{tag}: {results[tag]}", file=sys.stderr)
        shutil.rmtree(idx, ignore_errors=True)

    # one-level Lloyd control (raised budget — harness only)
    budget = similarity._DRIVER_MODEL_CELL_BUDGET
    idx = tempfile.mkdtemp(prefix="ctspark_centq_x16k_ctrl_")
    similarity._DRIVER_MODEL_CELL_BUDGET = 10**9
    try:
        t0 = time.perf_counter()
        similarity.pq_ivf_build_index(
            corpus, idx, n_cells=n_cells, refine_iters=2,
            refine_sample_mod=4,
        )
        build_s = round(time.perf_counter() - t0, 2)
        cents = spark.read.parquet(idx + "/_centroids")
        results["x16k_refined_onelevel_control"] = {
            "build_s": build_s,
            "coverage_exact_probes": _exact_cov(idx, cents, n_probe),
            f"coverage_exact_probes_p{probe_stress}": _exact_cov(
                idx, cents, probe_stress
            ),
        }
    finally:
        similarity._DRIVER_MODEL_CELL_BUDGET = budget
    print(
        f"x16k_refined_onelevel_control: "
        f"{results['x16k_refined_onelevel_control']}",
        file=sys.stderr,
    )
    shutil.rmtree(idx, ignore_errors=True)

    # gates at the STRESSED depth (the discriminating measurement)
    key = f"coverage_exact_probes_p{probe_stress}"
    gap = abs(
        results["x16k_refined_distributed"][key]
        - results["x16k_refined_onelevel_control"][key]
    )
    results["x16k_refined_coverage_gap"] = round(gap, 4)
    skey = f"coverage_served_p{probe_stress}"
    gate_fail = []
    if gap > 0.03:
        gate_fail.append(f"refined-vs-control gap {gap}")
    if (
        results["x16k_refined_distributed"][skey]
        < results["x16k_hashpick"][skey]
    ):
        gate_fail.append("refined served coverage below hashpick")
    print(json.dumps(results))
    if gate_fail:
        raise AssertionError("; ".join(gate_fail))


def main() -> None:
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import similarity
    from ct_mapreduce_spark.session import get_spark

    spark = get_spark("centroid-quality")

    # planted clusters (tests/test_llm_ops.py:_planted_cluster_corpus
    # rule at x10): unit-norm centers, members at gaussian noise 0.08 —
    # true top-k neighbors are co-cluster members.
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
    n_cells = max(16, n_rows // 512)
    queries = corpus.where(F.col("vec_id") % (n_rows // N_QUERIES) == 0)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(corpus, queries, k=K).collect()
    }
    print(f"corpus={n_rows} cells={n_cells} exact pairs={len(exact)}",
          file=sys.stderr)

    def recall(df) -> float:
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return round(len(exact & got) / len(exact), 4)

    results: dict[str, dict] = {
        "corpus_rows": n_rows,
        "n_cells": n_cells,
        "n_queries": queries.count(),
    }
    ob_only = "--ob-only" in sys.argv
    for refine in () if ob_only else (0, 2):
        tag = "refined" if refine else "hashpick"
        # full-vector IVF store
        idx = tempfile.mkdtemp(prefix=f"ctspark_centq_ivf_{tag}_")
        t0 = time.perf_counter()
        similarity.ivf_build_index(
            corpus, idx, n_cells=n_cells, refine_iters=refine,
            refine_sample_mod=4,
        )
        build_s = round(time.perf_counter() - t0, 2)
        r = recall(
            similarity.ivf_topk_indexed(
                spark, idx, queries, k=K, n_probe=N_PROBE
            )
        )
        results[f"ivf_{tag}"] = {"build_s": build_s, "recall": r}
        shutil.rmtree(idx, ignore_errors=True)
        # IVFADC stores
        for residual in (False, True):
            rtag = "residual" if residual else "raw"
            idx = tempfile.mkdtemp(prefix=f"ctspark_centq_pq_{rtag}_{tag}_")
            t0 = time.perf_counter()
            similarity.pq_ivf_build_index(
                corpus, idx, n_cells=n_cells, residual=residual,
                refine_iters=refine, refine_sample_mod=4,
            )
            build_s = round(time.perf_counter() - t0, 2)
            bare = recall(
                similarity.pq_ivf_topk_indexed(
                    spark, idx, queries, k=K, n_probe=N_PROBE
                )
            )
            rerank = recall(
                similarity.pq_ivf_topk_indexed(
                    spark, idx, queries, k=K, n_probe=N_PROBE,
                    rerank_corpus=corpus, rerank_factor=4,
                )
            )
            rerank25 = recall(
                similarity.pq_ivf_topk_indexed(
                    spark, idx, queries, k=K, n_probe=N_PROBE,
                    rerank_corpus=corpus, rerank_factor=25,
                )
            )
            # probed-cell coverage: is the true neighbor's cell probed?
            cents = spark.read.parquet(idx + "/_centroids")
            qa = similarity._assign_probes(
                queries, cents, "vec_id", "embedding", "query", N_PROBE
            )
            probes = {(r.query_id, r.cell) for r in qa.collect()}
            cellmap = {
                r.vec_id: r.cell
                for r in spark.read.parquet(idx + "/codes")
                .select("vec_id", "cell")
                .collect()
            }
            coverage = round(
                sum(1 for q, n in exact if (q, cellmap[n]) in probes)
                / len(exact),
                4,
            )
            results[f"pqivf_{rtag}_{tag}"] = {
                "build_s": build_s,
                "recall_bare": bare,
                "recall_rerank4": rerank,
                "recall_rerank25": rerank25,
                "coverage": coverage,
            }
            shutil.rmtree(idx, ignore_errors=True)
        print(f"{tag}: " + json.dumps(
            {k: v for k, v in results.items() if tag in k}
        ), file=sys.stderr)

    # --- r13 (r12 verdict task 1): distributed refinement ABOVE the
    # budget. The exact regime that needs >4096 cells was locked to
    # hash-pick centroids (refine_iters raised); now it refines through
    # ivf_refine_centroids_distributed. Measured at the REAL budget
    # boundary (n_cells = budget + 1 = 4097) on the same planted-cluster
    # corpus: probed-cell coverage for (a) unrefined hash-pick, (b) the
    # distributed refiner, (c) the one-level driver-side Lloyd control
    # (budget temporarily raised — a measurement-harness move, never a
    # production path). Done-gate: (b) within ~2 points of (c), and the
    # driver model stays sqrt-sized during (a)/(b). Coverage for (a)/(b)
    # uses the two-level SERVE probes (what an over-budget store actually
    # runs); (c) uses the literal probes its raised budget serves with.
    # n_probe scaled to 8: at 4097 cells each 125-member planted cluster
    # spans ~8 cells, so 4 probes would floor coverage for every variant
    # and hide the quantizer difference this rung measures. ---
    budget = similarity._DRIVER_MODEL_CELL_BUDGET
    n_cells_ob = budget + 1
    ob_probe = 8
    sqrt_cap = max(16, math.isqrt(n_cells_ob))
    results["ob_n_cells"] = n_cells_ob
    results["ob_n_probe"] = ob_probe

    def _ob_coverage(idx: str, two_level: bool) -> dict:
        # coverage under EXACT probes isolates CENTROID QUALITY (the
        # quantity this rung gates — same probe transport for every
        # variant; collecting the 4097-row model here is a harness move,
        # never a production path). coverage_served adds the two-level
        # probe transport on top — the number an over-budget store
        # actually serves with, recorded but gated only against its own
        # hashpick baseline (the transport's recall is the two-level
        # tier's own gated contract, not this rung's).
        cents = spark.read.parquet(idx + "/_centroids")
        cellmap = {
            r.vec_id: r.cell
            for r in spark.read.parquet(idx + "/codes")
            .select("vec_id", "cell")
            .collect()
        }

        def _cov(qa) -> float:
            probes = {(r.query_id, r.cell) for r in qa.collect()}
            return round(
                sum(1 for q, n in exact if (q, cellmap[n]) in probes)
                / len(exact),
                4,
            )

        out = {
            "coverage_exact_probes": _cov(
                similarity._assign_probes(
                    queries, cents, "vec_id", "embedding", "query", ob_probe
                )
            )
        }
        if two_level:
            out["coverage_served"] = _cov(
                similarity._two_level_assign(
                    queries, cents, n_cells_ob, "vec_id", "embedding",
                    "query", t=ob_probe,
                )
            )
        out["recall_rerank4"] = recall(
            similarity.pq_ivf_topk_indexed(
                spark, idx, queries, k=K, n_probe=ob_probe,
                rerank_corpus=corpus, rerank_factor=4,
            )
        )
        return out

    for tag, refine in (("ob_hashpick", 0), ("ob_refined_distributed", 2)):
        idx = tempfile.mkdtemp(prefix=f"ctspark_centq_{tag}_")
        t0 = time.perf_counter()
        similarity.pq_ivf_build_index(
            corpus, idx, n_cells=n_cells_ob, refine_iters=refine,
            refine_sample_mod=4,
        )
        build_s = round(time.perf_counter() - t0, 2)
        model_rows = similarity._LAST_DRIVER_MODEL_ROWS
        assert model_rows <= sqrt_cap, (tag, model_rows, sqrt_cap)
        results[tag] = {
            "build_s": build_s,
            "driver_model_rows": model_rows,
            **_ob_coverage(idx, two_level=True),
        }
        print(f"{tag}: {results[tag]}", file=sys.stderr)
        shutil.rmtree(idx, ignore_errors=True)

    # one-level Lloyd control at the same n_cells (raised budget)
    idx = tempfile.mkdtemp(prefix="ctspark_centq_ob_ctrl_")
    similarity._DRIVER_MODEL_CELL_BUDGET = 10**9
    try:
        t0 = time.perf_counter()
        similarity.pq_ivf_build_index(
            corpus, idx, n_cells=n_cells_ob, refine_iters=2,
            refine_sample_mod=4,
        )
        build_s = round(time.perf_counter() - t0, 2)
        cov = _ob_coverage(idx, two_level=False)
    finally:
        similarity._DRIVER_MODEL_CELL_BUDGET = budget
    results["ob_refined_onelevel_control"] = {"build_s": build_s, **cov}
    print(f"ob_refined_onelevel_control: "
          f"{results['ob_refined_onelevel_control']}", file=sys.stderr)
    shutil.rmtree(idx, ignore_errors=True)
    # centroid-quality gate: same (exact) probe transport on both
    # refined stores — the distributed refiner's means must be within
    # ~2 points of the driver-side Lloyd control's
    gap = abs(
        results["ob_refined_distributed"]["coverage_exact_probes"]
        - results["ob_refined_onelevel_control"]["coverage_exact_probes"]
    )
    results["ob_refined_coverage_gap"] = round(gap, 4)
    assert gap <= 0.03, results
    # and the refinement must actually help the number the store SERVES
    # with (two-level probes), vs the unrefined hash-pick baseline
    assert (
        results["ob_refined_distributed"]["coverage_served"]
        > results["ob_hashpick"]["coverage_served"]
    ), results

    print(json.dumps(results))


if __name__ == "__main__":
    if "--x16k" in sys.argv:
        main_16k()
    else:
        main()
