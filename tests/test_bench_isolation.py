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
