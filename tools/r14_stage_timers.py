#!/usr/bin/env python
"""Per-step wall timing of the expensive bench entries (guide §1: measure
first). Times each internal step of the heavy builds/serves with
perf_counter around real actions, so the optimization targets the step
that actually costs, not the one that looks expensive.

Usage: python tools/r14_stage_timers.py [fold|pqivf|pqbuild|pqserve|ingest|all]
Prints a JSON dict of step walls. Run on a quiet box.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self) -> None:
        self.walls: dict[str, float] = {}
        self._t = time.perf_counter()

    def mark(self, name: str) -> None:
        now = time.perf_counter()
        self.walls[name] = round(now - self._t, 3)
        self._t = now


def time_fold(spark) -> dict:
    """minhash_index_build split into its three writes."""
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import dedup_fuzzy
    from ct_mapreduce_spark.operators.util import fan_out
    from ct_mapreduce_spark.plans.corpus import _t as load_t

    docs = load_t(spark, SF_DIR, "documents")
    out: dict[str, float] = {}
    for it in range(2):
        t = T()
        sigs = dedup_fuzzy.minhash_signatures(fan_out(docs)).localCheckpoint(
            eager=True
        )
        t.mark("sign")
        path = tempfile.mkdtemp(prefix="r14_fold_")
        banded = dedup_fuzzy._banded_frame(sigs, 64, 16).withColumn(
            "pfx", F.substring("bucket", 1, 2)
        )
        banded.repartition(F.col("pfx")).write.mode("overwrite").partitionBy(
            "pfx"
        ).parquet(path + "/banded")
        t.mark("write_banded")
        sigs.write.mode("overwrite").parquet(path + "/sigs")
        t.mark("write_sigs")
        dedup_fuzzy._write_hash_store(sigs, path, mode="overwrite")
        t.mark("write_hashes")
        n_files = sum(len(fs) for _, _, fs in os.walk(path))
        shutil.rmtree(path, ignore_errors=True)
        out = dict(t.walls, n_files=n_files)
    return out


def time_pqivf(spark) -> dict:
    """pq_ivf_build_index split into its internal steps."""
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import similarity as S
    from ct_mapreduce_spark.plans.corpus import _t as load_t

    emb = load_t(spark, SF_DIR, "embeddings")
    out: dict[str, float] = {}
    for it in range(2):
        path = tempfile.mkdtemp(prefix="r14_pqivf_")
        t = T()
        cents = S._ivf_centroid_frame(emb, 16, "vec_id", "embedding", 42)
        cent_rows = cents.collect()
        t.mark("centroids_collect")
        assigned = S._assign_nearest(emb, cent_rows, "vec_id", "embedding", "v").select(
            F.col("v_id").alias("vec_id"), F.col("v_vec").alias("embedding"), "cell"
        )
        books = S.pq_codebooks(emb, 8, 16, "vec_id", "embedding", 42)
        t.mark("codebooks")
        enc = S.pq_encode(assigned, books, "vec_id", "embedding", keep=("cell",))
        (
            enc.select("vec_id", "codes", "cell")
            .repartition(F.col("cell"))
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(path + "/codes")
        )
        t.mark("encode_write_codes")
        cents.write.mode("overwrite").parquet(path + "/_centroids")
        t.mark("write_centroids")
        # sidecar writes exactly as the real builder does them (r14:
        # a re-implementation with spark.createDataFrame(<list>) here
        # measured the OLD pickled-relation path, 5-6 s each, that
        # pq_ivf_build_index no longer takes)
        from ct_mapreduce_spark.operators.util import local_frame

        rows = [
            (j, c, [float(x) for x in vec])
            for j, book in enumerate(books)
            for c, vec in enumerate(book)
        ]
        local_frame(
            spark, rows, "j int, code int, cvec array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(path + "/_codebooks")
        t.mark("write_codebooks")
        local_frame(
            spark, [(False, 42)], "residual boolean, seed int"
        ).coalesce(1).write.mode("overwrite").parquet(path + "/_meta")
        t.mark("write_meta")
        # and the real builder end-to-end (its sinks run in parallel;
        # the step walls above serialize them)
        path2 = tempfile.mkdtemp(prefix="r14_pqivf_e2e_")
        shutil.rmtree(path2, ignore_errors=True)
        S.pq_ivf_build_index(
            emb, path2, n_cells=16, m_sub=8, n_codes=16
        )
        t.mark("builder_e2e")
        n_files = sum(len(fs) for _, _, fs in os.walk(path))
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path2, ignore_errors=True)
        out = dict(t.walls, n_files=n_files)
    return out


def time_pqserve(spark) -> dict:
    """emb_pq_rerank_topk (inline pq_topk + rerank) step split."""
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import similarity as S
    from ct_mapreduce_spark.plans.corpus import _t as load_t

    emb = load_t(spark, SF_DIR, "embeddings")
    out: dict[str, float] = {}
    for it in range(2):
        t = T()
        books = S.pq_codebooks(emb, 8, 16, "vec_id", "embedding", 42)
        t.mark("codebooks")
        codes = S.pq_encode(emb, books, "vec_id", "embedding").select(
            F.col("vec_id").alias("neighbor_id"), "codes"
        )
        res = S._pq_adc_rank(
            codes,
            emb.where(F.col("vec_id") < 8),
            books,
            5,
            "vec_id",
            "embedding",
            rerank_corpus=emb,
            rerank_factor=4,
        )
        t.mark("plan_build")
        res.write.format("noop").mode("overwrite").save()
        t.mark("adc_exec")
        out = dict(t.walls)
    return out


def time_ingest(spark) -> dict:
    """ingest write split: pipeline exec vs partitioned write commit."""
    import datetime as dt

    from ct_mapreduce_spark.plans.ingest import ingest_batch, write_store
    from ct_mapreduce_spark.sources.certificates import synthetic_certificates

    src = "/tmp/ctspark_bench_certs_20k_w055"
    try:
        certs = spark.read.parquet(src)
        certs.head(1)
    except Exception:  # noqa: BLE001
        synthetic_certificates(spark, n=20000, hot_issuer_weight=0.55).write.mode(
            "overwrite"
        ).parquet(src)
        certs = spark.read.parquet(src)
    now = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)
    out: dict[str, float] = {}
    for it in range(2):
        t = T()
        deduped = ingest_batch(certs, now=now)
        deduped.write.format("noop").mode("overwrite").save()
        t.mark("pipeline_noop")
        wd = tempfile.mkdtemp(prefix="r14_ingest_")
        write_store(ingest_batch(certs, now=now), wd)
        t.mark("pipeline_plus_write")
        n_files = sum(len(fs) for _, _, fs in os.walk(wd))
        n_dirs = sum(len(ds) for _, ds, _ in os.walk(wd))
        shutil.rmtree(wd, ignore_errors=True)
        out = dict(t.walls, n_files=n_files, n_dirs=n_dirs)
    return out


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from ct_mapreduce_spark.session import get_spark

    spark = get_spark("r14-stage-timers")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    res: dict[str, dict] = {}
    if which in ("fold", "all"):
        res["fold"] = time_fold(spark)
    if which in ("pqivf", "all"):
        res["pqivf"] = time_pqivf(spark)
    if which in ("pqserve", "all"):
        res["pqserve"] = time_pqserve(spark)
    if which in ("ingest", "all"):
        res["ingest"] = time_ingest(spark)
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
