"""Tests for operators/selection.py: DSIR importance weights/scores and
token-budget selection. The score test re-derives the answer with a
DELIBERATELY DIFFERENT algorithm (pure-Python hashlib md5 + dict
counting — no Spark expressions) so an engine-side hashing or smoothing
bug cannot self-confirm."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.selection import (
    dsir_score,
    dsir_weights,
    select_token_budget,
)

SF = "/root/testdata/sf0.001"
N_BUCKETS = 64


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    df.cache().count()
    return df


def _py_grams(text: str) -> list[str]:
    # explicit ASCII whitespace class: Java's default \s (what Spark
    # split compiles) is ASCII-only, while Python's \s is unicode-aware
    toks = [
        t
        for t in re.split(r"[ \t\n\x0b\f\r]+", text.strip(" \t\n\x0b\f\r"))
        if t != ""
    ]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16) % N_BUCKETS


def _py_model(rows):
    """Independent weight model: (bucket -> micro weight) plus totals."""
    t_cnt: dict[int, int] = {}
    r_cnt: dict[int, int] = {}
    for lang, text in rows:
        for g in _py_grams(text):
            b = _py_bucket(g)
            r_cnt[b] = r_cnt.get(b, 0) + 1
            if lang == "en":
                t_cnt[b] = t_cnt.get(b, 0) + 1
    t_tot, r_tot = sum(t_cnt.values()), sum(r_cnt.values())
    w = {}
    for b in range(N_BUCKETS):
        ratio = ((t_cnt.get(b, 0) + 1.0) * (r_tot + float(N_BUCKETS))) / (
            (r_cnt.get(b, 0) + 1.0) * (t_tot + float(N_BUCKETS))
        )
        # round-half-away-from-zero like both engines' round()
        x = math.log(ratio) * 1e6
        w[b] = int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)
    return w, t_cnt, r_cnt


def test_weights_match_independent_model(spark, docs):
    rows = [(r["lang"], r["text"]) for r in docs.select("lang", "text").collect()]
    w_py, t_cnt, r_cnt = _py_model(rows)
    got = dsir_weights(
        docs.where(F.col("lang") == "en"), docs, n_buckets=N_BUCKETS
    ).collect()
    assert len(got) == N_BUCKETS
    for r in got:
        b = r["bucket"]
        assert r["target_n"] == t_cnt.get(b, 0)
        assert r["raw_n"] == r_cnt.get(b, 0)
        assert r["weight_micro"] == w_py[b], f"bucket {b}"


def test_scores_match_independent_model(spark, docs):
    rows = {
        r["doc_id"]: (r["lang"], r["text"])
        for r in docs.select("doc_id", "lang", "text").collect()
    }
    w_py, _, _ = _py_model(list(rows.values()))
    expect = {
        did: sum(w_py[_py_bucket(g)] for g in _py_grams(text))
        for did, (_, text) in rows.items()
    }
    w = dsir_weights(docs.where(F.col("lang") == "en"), docs, n_buckets=N_BUCKETS)
    got = dsir_score(docs, w, n_buckets=N_BUCKETS).collect()
    assert len(got) == len(rows)
    for r in got:
        assert r["dsir_score_micro"] == expect[r["doc_id"]], r["doc_id"]
        assert r["n_grams"] == len(_py_grams(rows[r["doc_id"]][1]))


def test_budget_is_greedy_prefix(spark, docs):
    """Kept set == the exact greedy prefix of the (score DESC, id ASC)
    order whose inclusive cumsum fits the budget — via brute force."""
    w = dsir_weights(docs.where(F.col("lang") == "en"), docs, n_buckets=N_BUCKETS)
    scored = dsir_score(docs, w, n_buckets=N_BUCKETS)
    frame = (
        docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
        )
        .join(scored.select("doc_id", "dsir_score_micro"), "doc_id")
        .localCheckpoint()
    )
    budget = 3000
    rows = frame.collect()
    order = sorted(rows, key=lambda r: (-r["dsir_score_micro"], r["doc_id"]))
    expect, acc = {}, 0
    for r in order:
        acc += r["n_tokens"]
        if acc > budget:
            break
        expect[r["doc_id"]] = acc
    got = select_token_budget(
        frame, budget, "dsir_score_micro", count_col="n_tokens", n_buckets=8
    ).collect()
    assert {r["doc_id"]: r["cum_tokens"] for r in got} == expect
    assert all(r["cum_tokens"] <= budget for r in got)


def test_budget_plan_has_no_global_window(spark, docs):
    """The 100 TB contract: the running sum must be windowed PER BUCKET,
    never a single-partition global sort (the packing module's plan
    assertion, replayed here for the selection path)."""
    frame = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        (F.col("doc_id") % 7).cast("long").alias("s"),
    )
    out = select_token_budget(
        frame, 10_000, "s", count_col="n_tokens", n_buckets=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # physical Window node prints its partition spec; a global
            # window would carry an empty partition list
            assert "_bucket" in plan
    # the window's exchange must hash-partition on _bucket, not be a
    # SinglePartition exchange
    assert "SinglePartition" not in plan


def test_budget_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id bigint, s bigint, n bigint")
    got = select_token_budget(empty, 100, "s", count_col="n", n_buckets=4)
    assert got.count() == 0


def test_per_stratum_budget_matches_brute_force(spark, docs):
    """Per-stratum selection == the per-stratum greedy prefix; an int
    budget == the explicit map over observed strata; a stratum missing
    from an explicit map is dropped entirely."""
    from ct_mapreduce_spark.operators.selection import (
        select_token_budget_per_stratum,
    )

    frame = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        (F.xxhash64("doc_id") % 1000).alias("s"),
    ).localCheckpoint()
    budget = 800
    rows = frame.collect()
    expect = {}
    for lang in {r["lang"] for r in rows}:
        acc = 0
        for r in sorted(
            (r for r in rows if r["lang"] == lang),
            key=lambda r: (-r["s"], r["doc_id"]),
        ):
            acc += r["n_tokens"]
            if acc > budget:
                break
            expect[r["doc_id"]] = (lang, acc)
    got = select_token_budget_per_stratum(
        frame, budget, "s", "lang", count_col="n_tokens", n_buckets=8
    ).collect()
    assert {r["doc_id"]: (r["lang"], r["cum_tokens"]) for r in got} == expect

    langs = sorted({r["lang"] for r in rows})
    as_map = select_token_budget_per_stratum(
        frame,
        {l: budget for l in langs},
        "s",
        "lang",
        count_col="n_tokens",
        n_buckets=8,
    ).collect()
    assert {r["doc_id"] for r in as_map} == {r["doc_id"] for r in got}

    # drop one language from the map -> none of its docs survive
    partial = select_token_budget_per_stratum(
        frame,
        {l: budget for l in langs[1:]},
        "s",
        "lang",
        count_col="n_tokens",
        n_buckets=8,
    ).collect()
    assert all(r["lang"] != langs[0] for r in partial)
    assert {r["doc_id"] for r in partial} == {
        r["doc_id"] for r in got if r["lang"] != langs[0]
    }


def test_flagged_weights_match_two_frame_form(spark, docs):
    """dsir_weights_flagged(docs, pred) must be bit-identical to
    dsir_weights(docs.where(pred), docs) — same integer counts, same
    micro-weights, one corpus scan instead of two."""
    from ct_mapreduce_spark.operators.selection import dsir_weights_flagged

    two = dsir_weights(
        docs.where(F.col("lang") == "en"), docs, n_buckets=N_BUCKETS
    ).collect()
    one = dsir_weights_flagged(
        docs, F.col("lang") == "en", n_buckets=N_BUCKETS
    ).collect()
    key = lambda r: r["bucket"]
    assert sorted(
        ((r["bucket"], r["target_n"], r["raw_n"], r["weight_micro"]) for r in two)
    ) == sorted(
        ((r["bucket"], r["target_n"], r["raw_n"], r["weight_micro"]) for r in one)
    )


def test_scored_flagged_matches_separate_calls(spark, docs):
    """dsir_scored_flagged (one gram pass, r15) must be bit-identical to
    dsir_weights_flagged + dsir_score composed, including n_grams and
    the with_tokens token counts (the token-budget frame)."""
    from ct_mapreduce_spark.operators.selection import (
        dsir_scored_flagged,
        dsir_weights_flagged,
    )
    from ct_mapreduce_spark.operators.text import tokens as _tokens

    pred = F.col("lang") == "en"
    w = dsir_weights_flagged(docs, pred, n_buckets=N_BUCKETS)
    sep = {
        r["doc_id"]: (r["dsir_score_micro"], r["n_grams"])
        for r in dsir_score(docs, w, n_buckets=N_BUCKETS).collect()
    }
    toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(_tokens("text")).cast("long").alias("n")
        ).collect()
    }
    fused = dsir_scored_flagged(
        docs, pred, n_buckets=N_BUCKETS, with_tokens=True
    ).collect()
    assert len(fused) == len(sep)
    for r in fused:
        assert (r["dsir_score_micro"], r["n_grams"]) == sep[r["doc_id"]]
        assert r["n_tokens"] == toks[r["doc_id"]]


def test_token_budget_bounded_job_structure(spark):
    """The DSIR selection pipeline's driver-action structure is bounded
    and the scoring pipeline runs ONCE (localCheckpointed): the final
    pass reads the checkpoint, not the corpus, and the whole query
    executes in a bounded number of Spark jobs (AQE stage
    materializations included — a re-executed scoring pipeline would
    roughly double this)."""
    from ct_mapreduce_spark.plans.corpus import REGISTRY

    fn = REGISTRY["docs_token_budget"].fn
    # warm once: artifact caches + codegen
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None) or [])
    out = fn(spark, "/root/testdata/sf0.001")
    out.write.format("noop").mode("overwrite").save()
    after = set(st.getJobIdsForGroup(None) or [])
    n_jobs = len(after - before)
    assert n_jobs <= 16, f"docs_token_budget ran {n_jobs} Spark jobs"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower(), plan  # reads the checkpoint
