"""Streaming IVF index maintenance (streaming/ann_stream.py): per-batch
increment folds under the stored centroids, probe-over-base∪increments
equality with the batch append path, replay idempotence of the
batch-keyed dynamic-overwrite writes, and compaction folding the
increment trees away."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ct_mapreduce_spark.fsutil import count_parquet_files
from ct_mapreduce_spark.operators import similarity
from ct_mapreduce_spark.streaming.ann_stream import (
    start_ann_ingest_stream,
    write_cells,
    write_codes,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


def _one_file(df, src_dir: str, name: str, mtime: float) -> None:
    tmp = src_dir + "_stage_" + name
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(tmp + "/part-*.parquet")[0]
    os.makedirs(src_dir, exist_ok=True)
    dst = os.path.join(src_dir, name + ".parquet")
    shutil.copyfile(part, dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp, ignore_errors=True)


def _probe(spark, idx, queries, k=5):
    return sorted(
        tuple(r)
        for r in similarity.ivf_topk_indexed(spark, idx, queries, k=k).collect()
    )


def test_increment_probe_matches_batch_append(spark, emb, tmp_path):
    """A probe over base ∪ increments must be bit-identical to a probe
    over the same vectors folded in via the batch append path (both
    assign under the SAME stored centroids)."""
    base = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    queries = emb.where(F.col("vec_id") < 8)

    idx_inc = str(tmp_path / "inc")
    similarity.ivf_build_index(base, idx_inc)
    write_cells(rest, idx_inc, batch_tag="0")

    idx_app = str(tmp_path / "app")
    similarity.ivf_build_index(base, idx_app)
    similarity.ivf_index_append(rest, idx_app)

    assert _probe(spark, idx_inc, queries) == _probe(spark, idx_app, queries)


def test_write_cells_replay_idempotent(spark, emb, tmp_path):
    """A replayed batch tag overwrites exactly its own increment
    partition: writing the same batch twice changes nothing, and a
    different tag's partition is untouched."""
    base = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    queries = emb.where(F.col("vec_id") < 8)
    idx = str(tmp_path / "idx")
    similarity.ivf_build_index(base, idx)
    write_cells(b1, idx, batch_tag="0")
    write_cells(b2, idx, batch_tag="1")
    want = _probe(spark, idx, queries)
    n_rows = spark.read.parquet(idx + "/_inc").count()
    write_cells(b1, idx, batch_tag="0")  # crash replay of batch 0
    assert spark.read.parquet(idx + "/_inc").count() == n_rows
    assert _probe(spark, idx, queries) == want


def test_compact_folds_increments(spark, emb, tmp_path):
    """ivf_index_compact folds the increment trees into the cell-
    clustered base (one file per cell, _inc gone) with the probe
    bit-identical; a crash leftover _inc (swap done, delete missed)
    re-compacts to the same store because the fold full-row-dedups."""
    base = emb.where(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "idx")
    similarity.ivf_build_index(base, idx)
    for i, part in enumerate(
        [emb.where(F.col("vec_id") % 3 == j) for j in (1, 2)]
    ):
        write_cells(part, idx, batch_tag=str(i))
    queries = emb.where(F.col("vec_id") < 8)
    want = _probe(spark, idx, queries)
    similarity.ivf_index_compact(spark, idx)
    assert not os.path.exists(idx + "/_inc")
    cells = spark.read.parquet(idx).select("cell").distinct().count()
    assert count_parquet_files(spark, idx) == cells
    assert _probe(spark, idx, queries) == want
    # simulate the crash window: the folded rows ALSO still present as
    # an increment tree; re-running compact must converge, not double
    write_cells(emb.where(F.col("vec_id") % 3 == 1), idx, batch_tag="0")
    similarity.ivf_index_compact(spark, idx)
    assert _probe(spark, idx, queries) == want
    assert spark.read.parquet(idx).count() == emb.count()


def test_ann_ingest_stream_end_to_end(spark, emb, tmp_path):
    """File-source stream -> per-trigger increment folds: after the
    availableNow run drains both files, a probe answers over the full
    corpus, identically to a batch-appended index; a restart from the
    same checkpoint with no new files is a no-op."""
    base = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1).select("vec_id", "embedding")
    b2 = emb.where(F.col("vec_id") % 3 == 2).select("vec_id", "embedding")
    idx = str(tmp_path / "idx")
    similarity.ivf_build_index(base, idx)
    src = str(tmp_path / "src")
    _one_file(b1, src, "b0", 1_000_000.0)
    _one_file(b2, src, "b1", 1_000_100.0)
    ckpt = str(tmp_path / "ckpt")
    q = start_ann_ingest_stream(
        spark, source_path=src, index_path=idx, checkpoint=ckpt
    )
    q.awaitTermination(120)
    # two triggers (maxFilesPerTrigger=1) => two increment partitions
    tags = {
        r["ingest_batch"]
        for r in spark.read.parquet(idx + "/_inc")
        .select("ingest_batch")
        .distinct()
        .collect()
    }
    assert len(tags) == 2
    queries = emb.where(F.col("vec_id") < 8)
    idx_app = str(tmp_path / "app")
    similarity.ivf_build_index(base, idx_app)
    similarity.ivf_index_append(
        b1.unionByName(b2), idx_app
    )
    assert _probe(spark, idx, queries) == _probe(spark, idx_app, queries)
    n_rows = spark.read.parquet(idx + "/_inc").count()
    q2 = start_ann_ingest_stream(
        spark, source_path=src, index_path=idx, checkpoint=ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(idx + "/_inc").count() == n_rows


def _pq_probe(spark, idx, queries, k=5):
    return sorted(
        tuple(r)
        for r in similarity.pq_ivf_topk_indexed(
            spark, idx, queries, k=k
        ).collect()
    )


def test_pq_increment_probe_matches_batch_append(spark, emb, tmp_path):
    """PQ mode: a probe over codes ∪ code-increments must be
    bit-identical to one over the same vectors folded in via
    pq_ivf_index_append (both encode under the SAME stored centroids +
    codebooks — the stored-model rule), and a replayed batch tag
    overwrites exactly its own increment partition."""
    base = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    queries = emb.where(F.col("vec_id") < 8)

    idx_inc = str(tmp_path / "inc")
    similarity.pq_ivf_build_index(base, idx_inc)
    write_codes(b1, idx_inc, batch_tag="0")
    write_codes(b2, idx_inc, batch_tag="1")

    idx_app = str(tmp_path / "app")
    similarity.pq_ivf_build_index(base, idx_app)
    similarity.pq_ivf_index_append(b1.unionByName(b2), idx_app)

    want = _pq_probe(spark, idx_app, queries)
    assert _pq_probe(spark, idx_inc, queries) == want

    # crash replay of batch 0: same rows, same probe
    n_rows = spark.read.parquet(idx_inc + "/codes/_inc").count()
    write_codes(b1, idx_inc, batch_tag="0")
    assert spark.read.parquet(idx_inc + "/codes/_inc").count() == n_rows
    assert _pq_probe(spark, idx_inc, queries) == want

    # compact folds the increments into the cell-partitioned base (one
    # swap covers base + _inc: the tree lives INSIDE /codes), probe
    # bit-identical, and a crash-leftover increment re-converges
    similarity.pq_ivf_index_compact(spark, idx_inc)
    assert not os.path.exists(idx_inc + "/codes/_inc")
    assert _pq_probe(spark, idx_inc, queries) == want
    write_codes(b1, idx_inc, batch_tag="0")  # folded rows ALSO as inc
    similarity.pq_ivf_index_compact(spark, idx_inc)
    assert _pq_probe(spark, idx_inc, queries) == want
    assert spark.read.parquet(idx_inc + "/codes").count() == emb.count()


def test_pq_ann_stream_end_to_end_residual_autocompact(spark, emb, tmp_path):
    """The PQ-IVF daemon (store='pq') on a RESIDUAL index with
    auto-compaction: after the availableNow run drains 4 files at
    compact_every=2, the increment tree is bounded, a probe answers
    identically to the batch-append control, and a checkpoint restart
    with no new files is a no-op."""
    base = emb.where(F.col("vec_id") % 5 == 0)
    batches = [emb.where(F.col("vec_id") % 5 == m + 1) for m in range(4)]
    src = str(tmp_path / "src")
    for m, b in enumerate(batches):
        _one_file(
            b.select("vec_id", "embedding"), src, f"b{m}", 1_000_000.0 + 100 * m
        )

    idx = str(tmp_path / "idx")
    similarity.pq_ivf_build_index(base, idx, residual=True)
    ckpt = str(tmp_path / "ckpt")
    q = start_ann_ingest_stream(
        spark, source_path=src, index_path=idx, checkpoint=ckpt,
        store="pq", compact_every=2,
    )
    q.awaitTermination(240)

    inc_p = idx + "/codes/_inc"
    inc_tags = (
        [n for n in os.listdir(inc_p) if n.startswith("ingest_batch=")]
        if os.path.isdir(inc_p)
        else []
    )
    assert len(inc_tags) <= 2, inc_tags

    idx_app = str(tmp_path / "app")
    similarity.pq_ivf_build_index(base, idx_app, residual=True)
    for b in batches:
        similarity.pq_ivf_index_append(b, idx_app)
    queries = emb.where(F.col("vec_id") < 8)
    got = _pq_probe(spark, idx, queries)
    assert got == _pq_probe(spark, idx_app, queries) and len(got) == 40

    # restart from the same checkpoint: no new files -> nothing written
    def _code_rows(p):
        out = {
            (r["vec_id"], r["cell"])
            for r in spark.read.parquet(p + "/codes")
            .select("vec_id", "cell")
            .collect()
        }
        if os.path.isdir(p + "/codes/_inc"):
            out |= {
                (r["vec_id"], r["cell"])
                for r in spark.read.parquet(p + "/codes/_inc")
                .select("vec_id", "cell")
                .collect()
            }
        return out

    before = _code_rows(idx)
    q2 = start_ann_ingest_stream(
        spark, source_path=src, index_path=idx, checkpoint=ckpt,
        store="pq", compact_every=2,
    )
    q2.awaitTermination(240)
    assert _code_rows(idx) == before == _code_rows(idx_app)


@pytest.mark.parametrize("store", ["ivf", "pq"])
def test_ann_stream_checkpoint_loss_auto_heals(spark, emb, tmp_path, store):
    """Checkpoint LOSS (fresh checkpoint, same source) re-delivers every
    tag; tags already folded into the base come back as duplicate
    increments that dynamic overwrite cannot make idempotent — r13
    characterized this as double ingestion healed only by a MANUAL
    compact. r14: compactions record every folded tag in a _folded_tags
    sidecar, and a trigger whose batch id is already in that manifest
    ends with a full fold — the store must converge (probes AND row
    multiset) by the end of the re-ingest run, with no operator step."""
    base = emb.where(F.col("vec_id") % 5 == 0)
    batches = [
        emb.where(F.col("vec_id") % 5 == m + 1).select("vec_id", "embedding")
        for m in range(4)
    ]
    src = str(tmp_path / "src")
    for m, b in enumerate(batches):
        _one_file(b, src, f"b{m}", 1_000_000.0 + 100 * m)

    idx = str(tmp_path / "idx")
    if store == "pq":
        similarity.pq_ivf_build_index(base, idx, residual=True)
        probe, data_root = _pq_probe, idx + "/codes"
    else:
        similarity.ivf_build_index(base, idx)
        probe, data_root = _probe, idx

    def _row_count():
        n = spark.read.parquet(data_root).count()
        inc = data_root + "/_inc"
        if os.path.isdir(inc) and glob.glob(inc + "/*/*.parquet"):
            n += spark.read.parquet(inc).count()
        return n

    q = start_ann_ingest_stream(
        spark, source_path=src, index_path=idx, checkpoint=str(tmp_path / "c1"),
        store=store, compact_every=2,
    )
    q.awaitTermination(240)
    queries = emb.where(F.col("vec_id") < 8)
    want = probe(spark, idx, queries)
    n_want = _row_count()
    # compactions ran (compact_every=2 over 4 triggers), so the manifest
    # exists and names the folded tags
    folded = similarity._folded_tags_read(spark, idx)
    assert folded, "auto-compaction recorded no folded tags"

    # checkpoint loss: fresh checkpoint over the SAME drained source
    q2 = start_ann_ingest_stream(
        spark, source_path=src, index_path=idx, checkpoint=str(tmp_path / "c2"),
        store=store, compact_every=2,
    )
    q2.awaitTermination(240)
    # converged WITHOUT a manual compact: same probes, same row multiset
    assert probe(spark, idx, queries) == want
    assert _row_count() == n_want


def test_ann_stream_requires_seeded_index(spark, tmp_path):
    """The ANN daemon has no cold start (the stored model defines every
    probe): starting a stream against a missing index must fail at
    daemon START with the seeding fix named, not mid-trigger with a raw
    parquet error — for both stores."""
    for store in ("ivf", "pq"):
        with pytest.raises(ValueError, match="build"):
            start_ann_ingest_stream(
                spark,
                source_path=str(tmp_path / "src"),
                index_path=str(tmp_path / f"missing_{store}"),
                checkpoint=str(tmp_path / f"ckpt_{store}"),
                store=store,
            )


def test_ann_stream_pq_rejects_full_vector_index(spark, tmp_path):
    """A PQ daemon pointed at a FULL-VECTOR IVF index (has _centroids,
    no _codebooks) must fail at daemon start naming the mismatch — not
    mid-first-trigger with a raw parquet error from _pq_read_books
    (r9 ADVICE)."""
    from ct_mapreduce_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf_only")
    similarity.ivf_build_index(emb, idx, n_cells=4)
    with pytest.raises(ValueError, match="_codebooks"):
        start_ann_ingest_stream(
            spark,
            source_path=str(tmp_path / "src"),
            index_path=idx,
            checkpoint=str(tmp_path / "ckpt_pqguard"),
            store="pq",
        )


def test_ann_stream_auto_compaction_bounded(spark, tmp_path):
    """compact_every=N on the ANN ingest daemon: the increment tree
    stays bounded while the stream runs, probes over the auto-compacted
    index return exactly the same neighbors as over an uncompacted
    control index, and the excluded in-flight partition's replay
    contract holds (its tag still exists as a partition dir or has been
    folded by a later cycle — never duplicated)."""
    from ct_mapreduce_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 7 == 0)
    n_batches = 6
    batches = [
        emb.where(F.col("vec_id") % 7 == m + 1) for m in range(n_batches)
    ]
    src = str(tmp_path / "src")
    for m, b in enumerate(batches):
        _one_file(b, src, f"b{m}", 1_000_000.0 + 100 * m)

    idxs = {}
    for tag, every in (("auto", 3), ("ctl", None)):
        idx = str(tmp_path / f"idx_{tag}")
        similarity.ivf_build_index(base, idx)
        q = start_ann_ingest_stream(
            spark,
            source_path=src,
            index_path=idx,
            checkpoint=str(tmp_path / f"ckpt_{tag}"),
            compact_every=every,
        )
        q.awaitTermination(240)
        idxs[tag] = idx

    inc_tags = [
        n
        for n in os.listdir(f"{idxs['auto']}/_inc")
        if n.startswith("ingest_batch=")
    ] if os.path.isdir(f"{idxs['auto']}/_inc") else []
    assert len(inc_tags) <= 3, inc_tags
    queries = emb.where(F.col("vec_id") < 8)
    got = sorted(
        tuple(r)
        for r in similarity.ivf_topk_indexed(
            spark, idxs["auto"], queries, k=5
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in similarity.ivf_topk_indexed(
            spark, idxs["ctl"], queries, k=5
        ).collect()
    )
    assert got == want and len(got) == 40
    # full-index row sets identical (base ∪ inc, no doubles, no loss)
    def rows(idx):
        out = {
            (r["vec_id"], r["cell"])
            for r in spark.read.parquet(idx).select("vec_id", "cell").collect()
        }
        inc_p = idx + "/_inc"
        if os.path.isdir(inc_p):
            try:
                out |= {
                    (r["vec_id"], r["cell"])
                    for r in spark.read.parquet(inc_p)
                    .select("vec_id", "cell")
                    .collect()
                }
            except Exception:
                pass
        return out

    assert rows(idxs["auto"]) == rows(idxs["ctl"])


def test_ann_stream_above_budget_two_level(spark, emb, tmp_path, monkeypatch):
    """r12 (r11 verdict task 1, streaming corner): a store past
    _DRIVER_MODEL_CELL_BUDGET streams its folds through the two-level
    tier — the model never collects (driver rows sqrt-sized) — and the
    increments stay bit-identical to the batch append path, which
    dispatches through the same deterministic tier. The residual PQ
    mode exercises the frame-join base path (no broadcast hint)."""
    monkeypatch.setattr(similarity, "_DRIVER_MODEL_CELL_BUDGET", 8)
    base = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    queries = emb.where(F.col("vec_id") < 8)

    # IVF mode: stream fold == batch append, probe-for-probe
    idx_inc = str(tmp_path / "inc_ob")
    similarity.ivf_build_index(base, idx_inc, n_cells=16)
    write_cells(rest, idx_inc, batch_tag="0")
    assert similarity._LAST_DRIVER_MODEL_ROWS == 8
    idx_app = str(tmp_path / "app_ob")
    similarity.ivf_build_index(base, idx_app, n_cells=16)
    similarity.ivf_index_append(rest, idx_app)
    assert _probe(spark, idx_inc, queries) == _probe(spark, idx_app, queries)

    # PQ residual mode
    pq_inc = str(tmp_path / "pqinc_ob")
    similarity.pq_ivf_build_index(base, pq_inc, n_cells=16, residual=True)
    write_codes(rest, pq_inc, batch_tag="0")
    assert similarity._LAST_DRIVER_MODEL_ROWS == 8
    pq_app = str(tmp_path / "pqapp_ob")
    similarity.pq_ivf_build_index(base, pq_app, n_cells=16, residual=True)
    similarity.pq_ivf_index_append(rest, pq_app)

    def _pq_probe(idx):
        return sorted(
            tuple(r)
            for r in similarity.pq_ivf_topk_indexed(
                spark, idx, queries, k=5
            ).collect()
        )

    assert _pq_probe(pq_inc) == _pq_probe(pq_app)
