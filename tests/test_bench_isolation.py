"""bench.py must degrade per-query: one broken query records an error and
the JSON line is still emitted with every other timing (the r4 failure mode
was one AnalysisException discarding a whole round's measurements).

r10 contract: the FINAL stdout line is compact (mins + gate verdicts only —
the driver's tail capture truncated the old single-line-everything artifact
three rounds running); the full audit trail (per-iteration lists, sentinel
readings, error details) lives in the bench_detail.json sidecar."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_broken_query_does_not_discard_timings(
    spark, monkeypatch, capsys, tmp_path
):
    import bench
    from ct_mapreduce_spark.plans.corpus import REGISTRY, Query

    def boom(spark, sf_dir):
        raise RuntimeError("deliberately broken")

    monkeypatch.setitem(REGISTRY, "zz_broken", Query(fn=boom, sql=None, tags=()))
    monkeypatch.setattr(
        bench, "HEADLINE", ["o3_topk", "zz_broken", "s4_point_lookup"]
    )
    monkeypatch.setattr(bench, "ITERATIONS", 1)
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "DETAIL_PATH", tmp_path / "bench_detail.json")
    # keep the harness fast: skip the ingest/curate benches too
    monkeypatch.setattr(bench, "_bench_ingest", lambda *a, **k: [0.0])
    monkeypatch.setattr(bench, "_bench_curate", lambda *a, **k: ([0.0], {}))
    monkeypatch.setenv("SPARK_GRAFT_SKIP_LOAD_GATE", "1")
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)  # must be parseable no matter what
    # compact line: error NAMES only; the broken query never pollutes the
    # timing map or the total
    assert "zz_broken" in out["error_queries"]
    assert "o3_topk" in out["queries"] and "s4_point_lookup" in out["queries"]
    assert "zz_broken" not in out["queries"]
    assert out["value"] == pytest.approx(
        sum(out["queries"].values()), abs=1e-6
    )
    # self-adjudication fields present even in a degraded sweep: the two
    # pinned sentinels ran at every probe site, so window_ratio is a number
    assert out["window_ratio"] is not None
    assert "over_2x_raw" in out and "over_2x_window_adjusted" in out
    # sidecar: full audit trail, including the error detail
    detail = json.loads((tmp_path / "bench_detail.json").read_text())
    assert "deliberately broken" in detail["errors"]["zz_broken"]
    assert detail["iterations"]["o3_topk"]
    # r11 probe sites: start + after the ingest/curate preambles + end
    # (every-8 in-sweep probes need >=9 headliners; only 3 here)
    assert {r["at"] for r in detail["sentinel_readings"]} == {
        "start", "after_ingest", "after_curate", "end"
    }
    # r11 nearest-sentinel adjudication: every timed query carries the
    # ratio of its nearest probe site on the measurement timeline
    for name in out["queries"]:
        assert name in detail["nearest_sentinel_ratio"]


def test_artifact_backed_build_serve_split(
    spark, monkeypatch, capsys, tmp_path
):
    """r11 contract: an artifact-backed headliner records an explicit
    *_build entry (cold run right after artifact_reset) and its serve
    entry is measured with the artifact guaranteed warm — train/index
    cost can no longer be booked against the serve baseline."""
    import bench
    from ct_mapreduce_spark.plans import corpus

    monkeypatch.setattr(bench, "HEADLINE", ["docs_bpe_token_stats"])
    monkeypatch.setattr(bench, "ITERATIONS", 1)
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "DETAIL_PATH", tmp_path / "bench_detail.json")
    monkeypatch.setattr(bench, "_bench_ingest", lambda *a, **k: [0.0])
    monkeypatch.setattr(bench, "_bench_curate", lambda *a, **k: ([0.0], {}))
    monkeypatch.setenv("SPARK_GRAFT_SKIP_LOAD_GATE", "1")
    # pre-warm the cache so the test proves the reset (not a cold env)
    corpus._bpe_merges(spark, "/root/testdata/sf0.001")
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "docs_bpe_token_stats_build" in out["queries"]
    assert "docs_bpe_token_stats" in out["queries"]
    # the build ran cold: the reset cleared the in-process merge cache,
    # so the build wall includes training and dominates the warm serve
    assert (
        out["queries"]["docs_bpe_token_stats_build"]
        >= out["queries"]["docs_bpe_token_stats"]
    )


def test_artifact_reset_disk_backed(spark):
    """artifact_reset must remove the exact /tmp path the query caches
    under (shared _artifact_path — no prefix drift possible)."""
    import os

    from ct_mapreduce_spark.plans import corpus

    sf = "/root/testdata/sf0.001"
    corpus.REGISTRY["docs_incremental_dedup"].fn(spark, sf).write.format(
        "noop"
    ).mode("overwrite").save()
    p = corpus._artifact_path("docs_incremental_dedup", sf)
    assert os.path.exists(p + "/sigs/_SUCCESS")
    corpus.artifact_reset("docs_incremental_dedup", sf)
    assert not os.path.exists(p)


def test_bench_load_gate(monkeypatch):
    """r13 (r12 verdict task 5): bench refuses to sweep into a hot
    window — it spin-waits (bounded) until the 1-min load drops under
    the threshold, and ALWAYS records the observed pre-run load so the
    artifact adjudicates itself. Skip env bypasses the wait but still
    records."""
    import os

    import bench

    loads = iter([9.0, 4.0, 0.4])
    monkeypatch.setattr(os, "getloadavg", lambda: (next(loads), 0.0, 0.0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.delenv("SPARK_GRAFT_SKIP_LOAD_GATE", raising=False)
    got = bench._await_quiet_window(threshold=1.5, timeout_s=60, poll_s=15)
    assert got["load_gate"] == "quiet"
    assert got["pre_run_load_1min"] == 0.4
    assert got["load_gate_waited_sec"] == 30.0

    # bounded: a never-quiet window times out but the sweep proceeds
    monkeypatch.setattr(os, "getloadavg", lambda: (9.9, 0.0, 0.0))
    ticks = iter([0.0, 30.0, 61.0, 92.0])
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(ticks))
    got = bench._await_quiet_window(threshold=1.5, timeout_s=60, poll_s=15)
    assert got["load_gate"] == "timeout"
    assert got["pre_run_load_1min"] == 9.9

    # skip env: no wait, load still recorded
    monkeypatch.setenv("SPARK_GRAFT_SKIP_LOAD_GATE", "1")
    got = bench._await_quiet_window(threshold=1.5, timeout_s=60)
    assert got["load_gate"] == "skipped"
    assert got["pre_run_load_1min"] == 9.9


def test_evict_stale_tagged_bounds_tmp_generations(tmp_path):
    """r12 (r11 verdict task 4): fingerprint-tagged artifact dirs are
    bounded on disk — building a new generation removes all but the
    _TMP_TAG_KEEP most-recent tagged siblings, and never touches dirs
    that don't carry a 12-hex tag under the same prefix."""
    import os
    import time

    from ct_mapreduce_spark.plans import corpus

    tags = [f"{i:012x}" for i in range(5)]
    live = str(tmp_path / f"ctspark_fake_{tags[-1]}")
    for i, t in enumerate(tags):
        p = str(tmp_path / f"ctspark_fake_{t}")
        os.makedirs(p)
        # staggered mtimes past the age gate: tags[0] oldest ... newest
        stamp = (
            time.time()
            - corpus._TMP_TAG_MIN_AGE_S
            - (len(tags) - i) * 100
        )
        os.utime(p, (stamp, stamp))
    # a stale-generation sibling touched RECENTLY is protected by the
    # age gate (r12 advice: a concurrent process may be mid-serve on it)
    young = str(tmp_path / f"ctspark_fake_{99:012x}")
    os.makedirs(young)
    unrelated = str(tmp_path / "ctspark_fake_notahexdigittag")
    os.makedirs(unrelated)

    corpus._evict_stale_tagged(live)
    left = sorted(
        d for d in os.listdir(tmp_path) if d.startswith("ctspark_fake_")
    )
    # live + (KEEP-1) newest aged siblings + the young sibling + the
    # unrelated dir survive. The young dir is newest, so it occupies the
    # keep slot; the newest AGED sibling survives only via... nothing —
    # it is past the keep count and past the age gate, so it goes.
    want = sorted(
        [f"ctspark_fake_{tags[-1]}", f"ctspark_fake_{99:012x}"]
        + ["ctspark_fake_notahexdigittag"]
    )
    assert left == want

    # a non-tagged path is a no-op (never glob-deletes siblings)
    corpus._evict_stale_tagged(unrelated)
    assert sorted(
        d for d in os.listdir(tmp_path) if d.startswith("ctspark_fake_")
    ) == want
