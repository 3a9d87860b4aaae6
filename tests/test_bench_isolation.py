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
    # pinned sentinels ran at start/mid/end, so window_ratio is a number
    assert out["window_ratio"] is not None
    assert "over_2x_raw" in out and "over_2x_window_adjusted" in out
    # sidecar: full audit trail, including the error detail
    detail = json.loads((tmp_path / "bench_detail.json").read_text())
    assert "deliberately broken" in detail["errors"]["zz_broken"]
    assert detail["iterations"]["o3_topk"]
    assert {r["at"] for r in detail["sentinel_readings"]} == {
        "start", "mid", "end"
    }
