"""bench.py must degrade per-query: one broken query records an error and
the JSON line is still emitted with every other timing (the r4 failure mode
was one AnalysisException discarding a whole round's measurements)."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_broken_query_does_not_discard_timings(spark, monkeypatch, capsys):
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
    # keep the harness fast: skip the ingest benches too
    monkeypatch.setattr(bench, "_bench_ingest", lambda *a, **k: [0.0])
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)  # must be parseable no matter what
    assert "zz_broken" in out["errors"]
    assert "deliberately broken" in out["errors"]["zz_broken"]
    assert "o3_topk" in out["queries"] and "s4_point_lookup" in out["queries"]
    assert "zz_broken" not in out["queries"]
    assert out["value"] == pytest.approx(
        sum(out["queries"].values()), abs=1e-6
    )
