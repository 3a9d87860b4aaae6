"""Unigram LM perplexity filter (operators/lm.py): training math against
a hand-computed model, OOV folding, scoring exactness, and the
pure-codegen / broadcast plan contract."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.lm import (
    lm_filter,
    lm_score,
    lm_train_unigram,
)


def _micro(p: float) -> int:
    return int(round(math.log(p) * 1_000_000.0))


def test_lm_train_matches_hand_model(spark):
    """corpus: 'a a a b b c' -> counts a=3 b=2 c=1; min_count=2 keeps
    {a, b} (V=2), folds c into OOV (D=1), T=6, denom=T+V+1=9."""
    df = spark.createDataFrame([Row(doc_id=1, text="a a a b b c")])
    lm = {r.token: r for r in lm_train_unigram(df, min_count=2).collect()}
    assert set(lm) == {"a", "b", ""}
    assert lm["a"].n == 3 and lm["b"].n == 2 and lm[""].n == 1
    assert lm["a"].logp_micro == _micro(4 / 9)
    assert lm["b"].logp_micro == _micro(3 / 9)
    assert lm[""].logp_micro == _micro(2 / 9)
    # smoothed distribution normalizes exactly: (3+1)+(2+1)+(1+1) == 9
    total_mass = (4 + 3 + 2) / 9
    assert abs(total_mass - 1.0) < 1e-12


def test_lm_score_exact_integer_sums(spark):
    train = spark.createDataFrame([Row(doc_id=1, text="a a a b b c")])
    model = lm_train_unigram(train, min_count=2)
    docs = spark.createDataFrame(
        [
            Row(doc_id=10, text="a b"),        # in-vocab only
            Row(doc_id=11, text="a zzz"),      # one OOV hit
            Row(doc_id=12, text=""),           # empty -> (0, 0, 0)
        ]
    )
    got = {r.doc_id: r for r in lm_score(docs, model).collect()}
    la, lb, loov = _micro(4 / 9), _micro(3 / 9), _micro(2 / 9)
    assert got[10].n_tokens == 2
    assert got[10].logp_total_micro == la + lb
    assert got[10].xent_micro == (-(la + lb)) // 2
    assert got[11].logp_total_micro == la + loov
    assert got[12].n_tokens == 0
    assert got[12].logp_total_micro == 0 and got[12].xent_micro == 0


def test_lm_filter_keeps_reference_like_docs(spark):
    """Docs made of reference tokens must score lower xent than docs of
    unseen tokens, and the threshold separates them."""
    ref_text = "the cat sat on the mat and the dog ran off"
    train = spark.createDataFrame(
        [Row(doc_id=i, text=ref_text) for i in range(5)]
    )
    model = lm_train_unigram(train, min_count=1)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog"),
            Row(doc_id=2, text="zyx wvu tsr qpo nml"),
        ]
    )
    scores = {r.doc_id: r.xent_micro for r in lm_score(docs, model).collect()}
    assert scores[1] < scores[2]
    cut = (scores[1] + scores[2]) // 2
    kept = lm_filter(docs, model, max_xent_micro=cut).collect()
    assert [r.doc_id for r in kept] == [1]
    assert {"n_tokens", "xent_micro"} <= set(kept[0].asDict())


def test_lm_plan_is_codegen_and_broadcast(spark):
    """The 100 TB contract: no Python evaluation in the scoring plan, and
    the model join is a broadcast (the corpus side never shuffles for
    it)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = lm_train_unigram(docs, min_count=2)
    plan = (
        lm_score(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_bigram_train_matches_hand_model(spark):
    """corpus: 'a b a b c' -> pairs (a,b)=2 (b,a)=1 (b,c)=1; contexts
    a=2 b=2. min_count=2 keeps only (a,b); logs = ln(2/2) = 0. Context
    totals use ALL pairs (pre-filter), so kept scores are true relative
    frequencies, never renormalized over survivors."""
    from ct_mapreduce_spark.operators.lm import lm_train_bigram

    df = spark.createDataFrame([Row(doc_id=1, text="a b a b c")])
    full = {
        (r.w1, r.w2): r for r in lm_train_bigram(df, min_count=1).collect()
    }
    assert set(full) == {("a", "b"), ("b", "a"), ("b", "c")}
    assert full[("a", "b")].n == 2 and full[("a", "b")].logs_micro == _micro(1.0)
    assert full[("b", "a")].logs_micro == _micro(1 / 2)
    assert full[("b", "c")].logs_micro == _micro(1 / 2)
    kept = {
        (r.w1, r.w2): r for r in lm_train_bigram(df, min_count=2).collect()
    }
    assert set(kept) == {("a", "b")}
    assert kept[("a", "b")].logs_micro == 0


def test_backoff_score_exact_integer_sums(spark):
    """Every token position hits exactly one of the three scoring arms:
    first token -> unigram; known pair -> bigram relative frequency;
    unknown pair -> alpha + unigram (OOV folds into the unigram arm)."""
    from ct_mapreduce_spark.operators.lm import (
        BACKOFF_ALPHA_MICRO,
        lm_score_backoff,
        lm_train_bigram,
        lm_train_unigram,
    )

    train = spark.createDataFrame([Row(doc_id=1, text="a b a b c")])
    uni = lm_train_unigram(train, min_count=1)
    bi = lm_train_bigram(train, min_count=1)
    docs = spark.createDataFrame(
        [
            Row(doc_id=10, text="a b"),    # first=uni(a), then bigram hit
            Row(doc_id=11, text="b b"),    # (b,b) unseen -> backoff
            Row(doc_id=12, text="c zzz"),  # backoff into the OOV row
            Row(doc_id=13, text=""),       # empty -> (0, 0, 0)
        ]
    )
    got = {r.doc_id: r for r in lm_score_backoff(docs, uni, bi).collect()}
    # unigram: T=5, counts a=2 b=2 c=1 (all kept), V=3, denom=9, D=0
    ua, ub, uc, uoov = _micro(3 / 9), _micro(3 / 9), _micro(2 / 9), _micro(1 / 9)
    assert got[10].logp_total_micro == ua + _micro(1.0)
    assert got[11].logp_total_micro == ub + BACKOFF_ALPHA_MICRO + ub
    assert got[12].logp_total_micro == uc + BACKOFF_ALPHA_MICRO + uoov
    assert got[13].n_tokens == 0 and got[13].xent_micro == 0
    assert got[10].xent_micro == (-(ua + _micro(1.0))) // 2


def test_backoff_plan_is_codegen_and_broadcast(spark):
    """Both model joins broadcast; no Python evaluation anywhere in the
    scoring plan — the corpus side never shuffles for the models."""
    from ct_mapreduce_spark.operators.lm import (
        lm_score_backoff,
        lm_train_bigram,
        lm_train_unigram,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    uni = lm_train_unigram(docs, min_count=2)
    bi = lm_train_bigram(docs, min_count=2)
    plan = (
        lm_score_backoff(docs, uni, bi)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_token_drift_ranks_planted_shift(spark):
    """A token exclusive to the target slice dominates the KL report; a
    token with identical usage on both sides contributes ~zero."""
    rows = [Row(doc_id=i, text="common words here " + ("targetonly " * 5 if i < 5 else "restonly "), lang=("en" if i < 5 else "de")) for i in range(10)]
    df = spark.createDataFrame(rows)
    from ct_mapreduce_spark.operators.lm import token_drift

    rep = token_drift(df, F.col("lang") == "en", top_k=10).collect()
    assert rep[0].token == "targetonly"
    assert rep[0].n_a > 0 and rep[0].n_b == 0
    by_tok = {r.token: r.kl_nano for r in rep}
    # balanced tokens drift less than the planted one by orders of magnitude
    for tok in ("common", "words", "here"):
        if tok in by_tok:
            assert by_tok[tok] < rep[0].kl_nano / 10
    # deterministic tie-break: re-run produces the identical frame
    rep2 = token_drift(df, F.col("lang") == "en", top_k=10).collect()
    assert rep == rep2


def test_lm_terciles_split_and_approx_tier(spark):
    """Exact tier splits the corpus into ~equal thirds; the
    approx-sketch tier (the 100 TB path) agrees with it on nearly every
    document."""
    from ct_mapreduce_spark.operators.lm import (
        lm_score,
        lm_terciles,
        lm_train_unigram,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = lm_train_unigram(docs.where(F.col("lang") == "en"), min_count=2)
    scores = lm_score(docs, model).localCheckpoint()
    n = scores.count()
    exact = {r.doc_id: r.ppl_bucket for r in lm_terciles(scores, exact=True).collect()}
    sizes = {b: list(exact.values()).count(b) for b in ("head", "middle", "tail")}
    for b, c in sizes.items():
        assert abs(c - n / 3) <= n * 0.1, (b, sizes)
    approx = {r.doc_id: r.ppl_bucket for r in lm_terciles(scores).collect()}
    agree = sum(1 for k in exact if approx[k] == exact[k]) / n
    assert agree >= 0.9, agree


def test_joint_trainer_bit_identical_to_separate(spark):
    """lm_train_joint (ONE corpus scan — r10) must produce bit-identical
    unigram and bigram models to the separate two-scan trainers, on real
    corpus data including empty/whitespace documents and the min_count
    OOV fold."""
    from ct_mapreduce_spark.operators.lm import (
        lm_train_bigram,
        lm_train_joint,
        lm_train_unigram,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).unionByName(
        spark.createDataFrame(
            [(90001, ""), (90002, "   "), (90003, "solo")],
            "doc_id long, text string",
        ),
        allowMissingColumns=True,
    )
    uni_sep = sorted(tuple(r) for r in lm_train_unigram(docs, min_count=2).collect())
    bi_sep = sorted(tuple(r) for r in lm_train_bigram(docs, min_count=2).collect())
    uni_j, bi_j = lm_train_joint(docs, min_count=2)
    assert sorted(tuple(r) for r in uni_j.collect()) == uni_sep
    assert sorted(tuple(r) for r in bi_j.collect()) == bi_sep


def test_joint_trainer_scans_corpus_once(spark):
    """Both models must derive from the ONE checkpointed pair-count
    pass: downstream plans read the checkpoint RDD, never the corpus
    files — the r10 one-scan contract (previously unigram and bigram
    each paid a full corpus scan)."""
    from ct_mapreduce_spark.operators.lm import lm_train_joint

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    uni, bi = lm_train_joint(docs, min_count=2)
    for name, frame in (("unigram", uni), ("bigram", bi)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "parquet" not in plan.lower(), (name, plan)
        assert "ExistingRDD" in plan, (name, plan)
