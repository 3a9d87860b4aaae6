#!/usr/bin/env python
"""ANN serving-tier walkthrough (operators/similarity.py, also exposed
as `cli ann [--pq]`): the three tiers of the same corpus, cheapest
probe last —

  exact cosine top-k         (the baseline every tier is measured against)
  IVF index                  (full vectors, probes read n_probe/n_cells)
  IVF-PQ index               (8-byte codes per row in the probed cells:
                              the two prunings multiplied — Jégou et al.
                              2011 IVFADC — plus exact re-rank of the
                              shortlist)

  python examples/ann_serving.py [sf_dir]

The script builds both materialized indexes over the testdata embedding
table, serves the same queries from each, reports recall@5 against the
exact answer and the fraction of corpus ROWS each probe admitted, then
exercises the maintenance loop: append a second batch under the STORED
model, compact, and show the served answer is bit-identical across the
compaction (the pytest-asserted contract).

Which tier to ship: IVF-PQ (`cli ann --pq`) is the default serving
recommendation — it is the only tier whose probe cost is flat in corpus
size (cell pruning) AND whose storage is codes, not vectors (32x at
dim=64 fp32); pair it with --rerank-factor for exact re-ranking.
Exhaustive cosine and the flat exhaustive-ADC store
(similarity.pq_topk_indexed) are the explicit small-corpus choices;
full-vector IVF is the middle tier when vectors must stay servable
(e.g. the rerank corpus itself). A running crawl keeps the store fresh
with `cli ann stream --pq --compact-every N` (streaming/ann_stream.py)."""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
_root = str(Path(__file__).resolve().parent.parent)
os.environ["PYTHONPATH"] = _root + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)


def main() -> int:
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import similarity
    from ct_mapreduce_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-serving-example", shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_rows = emb.count()
    queries = emb.where(F.col("vec_id") < 8)
    print(f"corpus: {n_rows} vectors; 8 queries; k=5")

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }

    root = tempfile.mkdtemp(prefix="ann_serving_")
    ivf, pqivf = f"{root}/ivf", f"{root}/pqivf"
    first = emb.where(F.col("vec_id") % 2 == 0)
    second = emb.where(F.col("vec_id") % 2 == 1)

    # build on the first half, append the second under the STORED model
    similarity.ivf_build_index(first, ivf)
    similarity.ivf_index_append(second, ivf)
    similarity.pq_ivf_build_index(first, pqivf)
    similarity.pq_ivf_index_append(second, pqivf)

    got_ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk_indexed(
            spark, ivf, queries, k=5, n_probe=4
        ).collect()
    }
    pq_rows = similarity.pq_ivf_topk_indexed(
        spark, pqivf, queries, k=5, n_probe=4,
        rerank_corpus=emb, rerank_factor=4,
    ).collect()
    got_pq = {(r.query_id, r.neighbor_id) for r in pq_rows}

    # probed fraction: rows in the probed cells / corpus rows
    cents = spark.read.parquet(pqivf + "/_centroids")
    qa = similarity._assign_probes(queries, cents, "vec_id", "embedding", "q", 4)
    cells = [r["cell"] for r in qa.select("cell").distinct().collect()]
    probed = (
        spark.read.parquet(pqivf + "/codes")
        .where(F.col("cell").isin(cells))
        .count()
    )
    print(f"IVF    recall@5 = {len(exact & got_ivf) / len(exact):.2f}")
    print(
        f"IVF-PQ recall@5 = {len(exact & got_pq) / len(exact):.2f} "
        f"(ADC over {probed}/{n_rows} = {probed / n_rows:.2f} of the "
        "corpus, 8-byte code rows, exact re-rank of the k*4 shortlist)"
    )
    print(
        "note: the testdata embeddings are near-uniform, so absolute "
        "recall measures the data; the pytest recall bars (>= 0.9) run "
        "on a planted-cluster fixture where neighborhoods exist."
    )

    # maintenance: compaction folds append history, serve bit-identical
    before = sorted(map(tuple, pq_rows))
    nb, na = similarity.pq_ivf_index_compact(spark, pqivf)
    after = sorted(
        tuple(r)
        for r in similarity.pq_ivf_topk_indexed(
            spark, pqivf, queries, k=5, n_probe=4,
            rerank_corpus=emb, rerank_factor=4,
        ).collect()
    )
    assert before == after, "probe changed across compaction"
    print(f"compacted codes: {nb} -> {na} files; served answer unchanged")

    # streaming maintenance (r9): a running crawl keeps the serving
    # index fresh with the ANN daemon — per-trigger encode under the
    # STORED model into batch-keyed increments, auto-compacted in-band.
    # Same as `cli ann stream --pq --compact-every 4`.
    import glob
    import shutil

    from ct_mapreduce_spark.streaming.ann_stream import (
        start_ann_ingest_stream,
    )

    # a genuinely NEW batch (fresh ids — the index already holds the
    # whole corpus): a later crawl drop arriving on the stream
    stream_batch = emb.where(F.col("vec_id") % 4 == 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    src = f"{root}/stream_src"
    stage = f"{root}/stage"
    stream_batch.coalesce(1).write.parquet(stage)
    os.makedirs(src, exist_ok=True)
    shutil.copyfile(
        glob.glob(stage + "/part-*.parquet")[0], src + "/b0.parquet"
    )
    n_before = spark.read.parquet(pqivf + "/codes").count()
    q = start_ann_ingest_stream(
        spark, source_path=src, index_path=pqivf,
        checkpoint=f"{root}/ckpt", store="pq", compact_every=4,
    )
    q.awaitTermination(120)
    served = similarity.pq_ivf_topk_indexed(
        spark, pqivf, queries, k=5, n_probe=4,
        rerank_corpus=emb, rerank_factor=4,
    )
    inc = f"{pqivf}/codes/_inc"
    n_inc = (
        spark.read.parquet(inc).count() if os.path.isdir(inc) else 0
    )
    print(
        f"PQ daemon: streamed {stream_batch.count()} vectors into the "
        f"serving index ({n_before} base + {n_inc} increment code rows); "
        f"probe over base ∪ increments: {served.count()} rows"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
