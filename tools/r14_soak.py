#!/usr/bin/env python
"""Round-14 evidence rungs (r13 verdict tasks 1, 3, 6).

1. CURATE (tasks 1 + 6): the r13 x100 rung measured the within-batch
   banded pairing at 207.9 s = 95% of the drop-1 dedup wall (219.0 s),
   and the cap sweep proved the est>=0.9 drop set byte-identical from
   cap 4096 down to 64. r14 ships the fraction-aware template cap
   (saturated buckets holding >1% of the corpus drop to cap 256) plus
   the min-id anchor star. This rung re-runs the FULL x100 curate and
   asserts the drop-1 dedup wall is cut >=5x vs the r13 recording; the
   RECALL rung re-derives the within-tier drop set under the new
   default (template cap) and under the conservative flat-4096 cap IN
   THE SAME WINDOW and asserts byte-identity — the honest in-window
   wall ratio comes from that pair. Task 6: drop-2 is re-run min-of-3
   on the pre-materialized, pre-warmed "b" crawl so the steady-state
   incremental cost has a stable number (the two r13 readings
   disagreed 5x: 24.4 vs 122.5 on a cold crawl in a dirty window).

2. ANNSTREAM (task 3): the r13 rung characterized checkpoint LOSS as
   double ingestion healed only by a MANUAL compact. r14's daemon
   auto-heals (folded-tag manifest -> full fold on re-delivered tags).
   Same rung, real over-budget n_cells, but the manual-compact step is
   GONE: probes must equal the control immediately after the fresh-
   checkpoint re-ingest drains.

Prints one JSON line; findings land in BASELINE.md and the raw JSON in
tools/artifacts/.
"""

from __future__ import annotations

import gzip
import json
import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CURATE_MULT = 100
# r13 recordings this rung compares against (tools/artifacts/
# r13_soak_r13.json, curate_full_x100_subwalls — the sub-stage run)
R13_DROP1_DEDUP_WALL_S = 218.979
R13_DROP1_WITHIN_WALL_S = 207.872


def main() -> None:
    from pyspark.sql import functions as F

    from ct_mapreduce_spark.operators import dedup_fuzzy, similarity
    from ct_mapreduce_spark.session import get_spark

    spark = get_spark("r14-soak")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results: dict[str, dict] = {}
    only = sys.argv[1] if len(sys.argv) > 1 else None

    # ================= rung 1: curate x100 under the template cap ====
    if only in (None, "curate"):
        from ct_mapreduce_spark.operators.text import (
            html_to_text,
            strip_http_headers,
        )
        from ct_mapreduce_spark.plans.curate import curate_crawl
        from ct_mapreduce_spark.sources.text_source import (
            encode_warc,
            read_warc,
            synthetic_html_body,
        )

        def _crawl_path(mult: int, tag: str) -> str:
            # scale_soak's generator, same cached /tmp layout as r13 so
            # the corpus is BIT-IDENTICAL to the one the r13 walls and
            # cap sweep were recorded on
            path = f"/tmp/ctspark_soak_crawl_x{mult}_{tag}"
            n_seg, per = 8 * mult, 250
            if not os.path.exists(f"{path}/seg-{n_seg - 1:03d}.warc.gz"):
                os.makedirs(path, exist_ok=True)
                for seg in range(n_seg):
                    recs = [
                        {
                            "warc_type": "response",
                            "url": f"https://crawl.example/page/{seg * per + i}",
                            "date": "2026-01-01T00:00:00Z",
                            "record_id": f"<urn:uuid:{tag}{seg * per + i:07d}>",
                            "content_type": "application/http; msgtype=response",
                            "body": synthetic_html_body(seg * per + i),
                        }
                        for i in range(per)
                    ]
                    payload = encode_warc(recs)
                    with open(f"{path}/seg-{seg:03d}.warc.gz", "wb") as f:
                        f.write(gzip.compress(payload))
            return path

        gen_t0 = time.perf_counter()
        crawl_a = _crawl_path(CURATE_MULT, "a")
        crawl_b = _crawl_path(CURATE_MULT, "b")
        gen_s = round(time.perf_counter() - gen_t0, 2)
        wd = tempfile.mkdtemp(prefix=f"ctspark_r14_curate_x{CURATE_MULT}_")
        suite_dir = os.path.join(wd, "suite")
        os.makedirs(suite_dir)
        raw = read_warc(spark, crawl_a).where(F.col("warc_type") == "response")
        leak_rows = (
            raw.select(
                html_to_text(strip_http_headers(F.col("body"))).alias("text")
            )
            .where(F.length("text") > 100)
            .limit(5)
            .collect()
        )
        with open(os.path.join(suite_dir, "bench.jsonl"), "w") as f:
            for i, r in enumerate(leak_rows):
                f.write(json.dumps({"doc_id": i, "text": r["text"]}) + "\n")

        t0 = time.perf_counter()
        s1 = curate_crawl(
            spark, crawl_a, wd, eval_suite=suite_dir, pii_redact=True
        )
        drop1_s = round(time.perf_counter() - t0, 2)
        pre = s1.get("after_lm", s1["quality_survivors"])
        assert s1["after_decontam"] <= pre - 5, f"x{CURATE_MULT} leaks kept: {s1}"
        dedup_wall = s1["stage_walls"]["dedup"]
        cut = round(R13_DROP1_DEDUP_WALL_S / dedup_wall, 1)
        print(
            f"drop1 stage walls: {s1['stage_walls']}", file=sys.stderr
        )  # recorded BEFORE any gate fires — a failed gate must not
        # destroy the walls that explain it (the first r14 run did)
        gates: list[str] = []
        if not dedup_wall < R13_DROP1_DEDUP_WALL_S / 5:
            gates.append(
                f"drop-1 dedup wall {dedup_wall}s is not a 5x cut vs the "
                f"r13 recording {R13_DROP1_DEDUP_WALL_S}s"
            )

        # ----- task 6: steady-state drop-2, pre-warmed, min-of-3 -----
        # Pre-warm: one full parse pass over the (pre-materialized) "b"
        # crawl so the first timed iteration doesn't pay cold page-cache
        # reads — the r13 cold reading (122.5 s) was dominated by that.
        read_warc(spark, crawl_b).where(
            F.col("warc_type") == "response"
        ).count()
        drop2_runs = []
        drop2_walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            s2 = curate_crawl(
                spark, crawl_b, wd, eval_suite=suite_dir, pii_redact=True
            )
            drop2_runs.append(round(time.perf_counter() - t0, 2))
            drop2_walls.append(s2["stage_walls"])
            assert s2["after_dedup"] == 0, (
                f"x{CURATE_MULT} re-crawl not deduped: {s2}"
            )
        drop2_min = min(drop2_runs)
        best = drop2_walls[drop2_runs.index(drop2_min)]

        results[f"curate_full_x{CURATE_MULT}"] = {
            "gen_s": gen_s,
            "drop1_s": drop1_s,
            "drop1_dedup_wall_s": dedup_wall,
            "r13_drop1_dedup_wall_s": R13_DROP1_DEDUP_WALL_S,
            "drop1_dedup_cut_x": cut,
            "extracted": s1["extracted"],
            "drop1_kept": s1["after_dedup"],
            "drop1_stage_walls": s1["stage_walls"],
            "drop2_runs_s": drop2_runs,
            "drop2_steady_s": drop2_min,
            "drop2_stage_walls_best": best,
        }
        print(
            f"curate x{CURATE_MULT}: drop1={drop1_s}s dedup={dedup_wall}s "
            f"(cut {cut}x vs r13) drop2 min-of-3={drop2_min}s "
            f"runs={drop2_runs}",
            file=sys.stderr,
        )
        shutil.rmtree(wd, ignore_errors=True)

        # ----- task 1 recall rung: kept-set invariance, in-window -----
        # Same within-tier frame curate saw: extracted docs, signed
        # once, exact-within reps removed; then the banded drop set
        # under the NEW default (template cap 256 + anchor star) vs the
        # conservative flat 4096 cap (still with anchor star). The r13
        # sweep proved flat-cap invariance 4096->64; this proves the
        # shipped fraction-aware default preserves the drop set while
        # recording the honest same-window wall ratio.
        docs = (
            raw.select(
                F.xxhash64("record_id").alias("doc_id"),
                html_to_text(strip_http_headers(F.col("body"))).alias("text"),
            )
            .where(F.length("text") > 0)
            .localCheckpoint(eager=True)
        )
        from ct_mapreduce_spark.operators.util import fan_out

        sigs = dedup_fuzzy.minhash_signatures(fan_out(docs)).localCheckpoint(
            eager=True
        )
        wexact = dedup_fuzzy.exact_within_drops(sigs, hash_col="sig_hash")
        novel = docs.join(F.broadcast(wexact), "doc_id", "left_anti")
        novel_sigs = sigs.join(F.broadcast(wexact), "doc_id", "left_anti")

        def _drop_set(**params) -> tuple[float, frozenset]:
            t0 = time.perf_counter()
            dropped = frozenset(
                r["doc_id"]
                for r in dedup_fuzzy.minhash_lsh_pairs(
                    novel, sigs=novel_sigs, **params
                )
                .where(F.col("est_jaccard") >= 0.9)
                .select(
                    F.greatest("doc_a", "doc_b").alias("doc_id")
                )
                .distinct()
                .collect()
            )
            return round(time.perf_counter() - t0, 2), dropped

        fast_s, fast_drop = _drop_set()  # shipped r14 default (256/64)
        # conservative control: the r13 flat 4096 cap, no template tier
        cons_s, cons_drop = _drop_set(
            max_bucket_width=4096, template_bucket_frac=None
        )
        results["within_tier_recall_x100"] = {
            "n_docs": novel.count(),
            "default_cap_wall_s": fast_s,
            "flat_4096_wall_s": cons_s,
            "in_window_ratio": round(cons_s / max(fast_s, 1e-9), 1),
            "n_dropped_default": len(fast_drop),
            "n_dropped_4096": len(cons_drop),
            "drop_set_identical": fast_drop == cons_drop,
        }
        print(
            f"recall rung: default-cap {fast_s}s vs flat-4096 {cons_s}s "
            f"({results['within_tier_recall_x100']['in_window_ratio']}x), "
            f"identical={fast_drop == cons_drop} "
            f"({len(fast_drop)} vs {len(cons_drop)} dropped)",
            file=sys.stderr,
        )
        if fast_drop != cons_drop:
            gates.append(
                f"drop sets differ: {len(fast_drop)} vs {len(cons_drop)}; "
                f"diff sample {sorted(fast_drop ^ cons_drop)[:10]}"
            )
        if gates:
            print(json.dumps(results))  # partial artifact survives
            raise AssertionError("; ".join(gates))

    # ================= rung 2: checkpoint-loss auto-heal =============
    if only in (None, "annstream"):
        from ct_mapreduce_spark.sources.tables import load_table
        from ct_mapreduce_spark.streaming.ann_stream import (
            start_ann_ingest_stream,
        )

        def _emb_path(mult: int) -> str:
            # scale_soak's replicated embeddings, same cached /tmp layout
            # as r13 (identical generator => identical artifact)
            path = f"/tmp/ctspark_soak_emb_x{mult}"
            try:
                spark.read.parquet(path).head(1)
            except Exception:
                base = load_table(spark, "embeddings", "/root/testdata/sf0.1")
                reps = spark.range(mult).withColumnRenamed("id", "_rep")
                scaled = base.crossJoin(reps).select(
                    (F.col("vec_id") * mult + F.col("_rep")).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x: (
                            x + (F.col("_rep") % 97).cast("float") * F.lit(1e-4)
                        ).cast("float"),
                    ).alias("embedding"),
                )
                scaled.write.mode("overwrite").parquet(path)
            return path

        emb = spark.read.parquet(_emb_path(100))
        n_rows = emb.count()
        n_cells_ob = max(similarity._DRIVER_MODEL_CELL_BUDGET + 1, n_rows // 128)
        base = emb.where(F.col("vec_id") % 4 != 3)
        rest = emb.where(F.col("vec_id") % 4 == 3)
        queries = emb.where(F.col("vec_id") < 8)
        root = tempfile.mkdtemp(prefix="ctspark_r14_annstream_")
        src = f"{root}/src"
        n_triggers = 6
        for i in range(n_triggers):
            rest.where(F.col("vec_id") % 24 == 3 + 4 * i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            time.sleep(1.1)  # distinct mtimes => deterministic batch order

        idx_stream = f"{root}/idx_stream"
        idx_ctrl = f"{root}/idx_ctrl"
        t0 = time.perf_counter()
        similarity.pq_ivf_build_index(
            base, idx_stream, n_cells=n_cells_ob, residual=True
        )
        build_s = round(time.perf_counter() - t0, 2)
        shutil.copytree(idx_stream, idx_ctrl)
        sqrt_cap = max(16, math.isqrt(n_cells_ob))
        assert similarity._LAST_DRIVER_MODEL_ROWS <= sqrt_cap

        t0 = time.perf_counter()
        q = start_ann_ingest_stream(
            spark, src, idx_stream, f"{root}/ckpt1",
            store="pq", compact_every=4,
        )
        q.awaitTermination()
        stream_s = round(time.perf_counter() - t0, 2)
        assert similarity._LAST_DRIVER_MODEL_ROWS <= sqrt_cap

        similarity.pq_ivf_index_append(rest, idx_ctrl)

        def _probe(idx):
            return sorted(
                tuple(r)
                for r in similarity.pq_ivf_topk_indexed(
                    spark, idx, queries, k=5, n_probe=4
                ).collect()
            )

        p_stream = _probe(idx_stream)
        assert p_stream == _probe(idx_ctrl), "stream fold != batch append"
        folded = similarity._folded_tags_read(spark, idx_stream)
        assert folded, "auto-compaction recorded no folded tags"

        # in-flight replay (the CRASH contract) still moves nothing
        from ct_mapreduce_spark.streaming.ann_stream import write_codes

        last_batch = rest.where(
            F.col("vec_id") % 24 == 3 + 4 * (n_triggers - 1)
        )
        write_codes(last_batch, idx_stream, batch_tag=str(n_triggers - 1))
        assert _probe(idx_stream) == p_stream, "in-flight replay moved probes"

        # checkpoint LOSS: fresh checkpoint over the SAME drained
        # source. r13: probes moved until a MANUAL compact. r14: the
        # folded-tag manifest triggers in-band full folds, so the store
        # must equal the control as soon as the re-ingest drains — NO
        # manual compact below.
        t0 = time.perf_counter()
        q = start_ann_ingest_stream(
            spark, src, idx_stream, f"{root}/ckpt2",
            store="pq", compact_every=4,
        )
        q.awaitTermination()
        reingest_s = round(time.perf_counter() - t0, 2)
        assert _probe(idx_stream) == p_stream, (
            "checkpoint-loss re-ingest did NOT auto-heal"
        )

        results["annstream_ckpt_loss_autoheal"] = {
            "rows": n_rows,
            "n_cells": n_cells_ob,
            "triggers": n_triggers,
            "build_s": build_s,
            "stream_s": stream_s,
            "reingest_s": reingest_s,
            "folded_tags": sorted(folded),
            "converged_without_manual_compact": True,
        }
        print(
            f"annstream: {results['annstream_ckpt_loss_autoheal']}",
            file=sys.stderr,
        )
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
