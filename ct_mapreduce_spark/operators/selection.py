"""Data selection: DSIR-style importance weighting + token-budget picks.

Two curation-side selection tools a training-data pipeline runs after
cleaning and dedup:

1. **Hashed n-gram importance weights (DSIR-style).** Following the
   published importance-resampling recipe (Xie et al. 2023, "Data
   Selection for Language Models via Importance Resampling"): hash every
   unigram and bigram of a TARGET corpus (the distribution you want more
   of) and of the RAW corpus into `n_buckets` buckets, smooth the two
   bucket-frequency profiles (add-one over buckets), and give each
   bucket the log-likelihood ratio log(p_target / p_raw). A document's
   importance score is the sum of its grams' bucket weights — high when
   the document's n-gram profile looks like the target.

   Determinism contract (the repo-wide exact-arithmetic rule): bucket
   ids come from the md5-prefix integer both engines share (the
   `mixture_rebalance` device), and the per-bucket log-ratio is rounded
   ONCE to an integer micro-weight (`round(ln(...) * 1e6)` as BIGINT).
   Document scores are then pure integer sums — order-independent, so
   the Spark plan and the DuckDB oracle hash-match bit-for-bit no matter
   how either engine schedules the aggregation. Floats never survive
   past the model-sized weight table.

2. **Token-budget selection.** "Fill a 10B-token training budget with
   the best documents": order by a score (descending, doc id tiebreak)
   and keep every document whose inclusive running token total still
   fits the budget. The running total is the packing module's two-phase
   distributed prefix sum (bucket totals -> driver prefix of model-sized
   subtotals -> per-bucket windows) — never a global single-partition
   ORDER BY window, which is the plan that dies at 100 TB.

Scale posture: gram hashing and bucket assignment are codegen-side
(md5/conv/%); the weight table is `n_buckets` rows — model parameters,
broadcastable; scoring is explode -> broadcast join -> map-side-combined
groupBy(doc) whose shuffle carries ONE narrow row per document (the
exploded gram rows collapse locally before the exchange); budget
selection shuffles one (id, score, n_tokens) triple per row.

No reference analog (jcjones/ct-mapreduce has no corpus-selection
concept); extends the LLM-pipeline suite the way packing/sampling do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.packing import _bucket_offsets
from ct_mapreduce_spark.operators.text import gram_stream, tokens
from ct_mapreduce_spark.operators.util import local_frame


def dsir_grams(text_col: str = "text") -> Column:
    """The hashed-feature gram stream: every unigram plus every bigram,
    in document order, duplicates kept (frequencies are the feature).
    Empty-text documents contribute nothing (split yields [''], which
    the unigram filter drops and the bigram guard never reaches)."""
    uni = F.array_remove(tokens(text_col), "")
    return F.concat(uni, gram_stream(text_col, 2))


def gram_bucket(gram: Column, n_buckets: int) -> Column:
    """Hash a gram to a bucket id shared exactly with the SQL oracle:
    first 8 hex chars of md5 as an integer, mod n_buckets. Non-negative
    (the 32-bit prefix is), so % and pmod agree across engines."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    ).cast("long")


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, out_col: str
) -> DataFrame:
    return (
        df.select(F.explode(dsir_grams(text_col)).alias("_g"))
        .select(gram_bucket(F.col("_g"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(out_col))
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """The learned importance model: one row per bucket with the target
    and raw gram counts and the integer micro-weight
    `round(ln(((t+1)*(R+B)) / ((r+1)*(T+B))) * 1e6)` (add-one smoothing
    over B buckets; T, R are total gram counts). `n_buckets` rows —
    model parameters. The whole-frame window that derives T and R runs
    over this bounded frame (the mixture_rebalance pattern), never the
    corpus.

    The ratio is computed as ONE product-over-product division so both
    engines evaluate the identical IEEE expression tree; ln is the only
    libm-vs-JVM 1-ulp surface and sits behind a 1e-6 rounding grid."""
    spark = target.sparkSession
    spine = spark.range(int(n_buckets)).select(
        F.col("id").cast("long").alias("bucket")
    )
    joined = (
        spine.join(
            _bucket_counts(target, text_col, n_buckets, "target_n"),
            "bucket",
            "left",
        )
        .join(_bucket_counts(raw, text_col, n_buckets, "raw_n"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("target_n", F.lit(0)).cast("long").alias("target_n"),
            F.coalesce("raw_n", F.lit(0)).cast("long").alias("raw_n"),
        )
    )
    # Single-task window over the n_buckets spine (bounded, model-sized
    # by construction); Spark 4.1 folds the constant lit(0) spec away
    # (EliminateWindowPartitions) — the lit is a source-level intent
    # marker only; boundedness is covered by the plan audit's
    # bounded-window allowlist over checkpoint-hidden stages too.
    whole = W.partitionBy(F.lit(0))
    b = float(int(n_buckets))
    t_tot = F.sum("target_n").over(whole).cast("double")
    r_tot = F.sum("raw_n").over(whole).cast("double")
    ratio = (
        (F.col("target_n").cast("double") + F.lit(1.0)) * (r_tot + F.lit(b))
    ) / ((F.col("raw_n").cast("double") + F.lit(1.0)) * (t_tot + F.lit(b)))
    return joined.select(
        "bucket",
        "target_n",
        "raw_n",
        F.round(F.log(ratio) * F.lit(1_000_000.0)).cast("long").alias(
            "weight_micro"
        ),
    )


def dsir_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Per-document importance score: the integer sum of the document's
    gram bucket micro-weights (exact — no float accumulation), plus the
    gram count. Documents with no grams (empty text) score 0.

    Plan: explode_outer grams (a gramless document keeps one null row,
    so no second corpus-sized join is needed to resurrect it) -> codegen
    bucket hash -> broadcast LEFT join against the model-sized weight
    table -> groupBy(id) whose map-side combine collapses each
    document's gram rows locally, so the shuffle carries one row per
    document. ONE corpus exchange total."""
    g = docs.select(
        F.col(id_col), F.explode_outer(dsir_grams(text_col)).alias("_g")
    ).select(id_col, gram_bucket(F.col("_g"), n_buckets).alias("bucket"))
    return (
        g.join(
            F.broadcast(weights.select("bucket", "weight_micro")),
            "bucket",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("weight_micro"), F.lit(0))
            .cast("long")
            .alias("dsir_score_micro"),
            F.count("bucket").cast("long").alias("n_grams"),
        )
    )


def select_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    id_col: str = "doc_id",
    count_col: str | None = None,
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Keep the highest-`score_col` rows whose inclusive running token
    total fits `budget`, ordering by (score DESC, id ASC). Returns
    (id, score, n_tokens, cum_tokens) for the kept rows — cum_tokens is
    the running total including the row itself, so max(cum_tokens) is
    the budget actually spent.

    `count_col`: a precomputed per-row token count; default whitespace
    tokenization of `text_col` (the pack_sequences convention).

    The running total is the two-phase distributed prefix sum from
    operators/packing.py over the order key `-score` (ascending negated
    score == descending score; equal scores share a bucket by
    construction, and the within-bucket window breaks ties on id) —
    bucket totals visit the driver as model parameters, the corpus-side
    sort is per-bucket. Pure integer arithmetic: the kept set is a
    deterministic function of the data and an ordinary window cumsum
    reproduces it bit-for-bit.

    The input frame is evaluated up to three times (min/max + bucket
    totals driver actions, then the final pass) — localCheckpoint an
    expensive upstream (e.g. a full scoring pipeline) before calling."""
    ntok = (
        F.col(count_col).cast("long")
        if count_col is not None
        else F.size(tokens(text_col)).cast("long")
    )
    base = df.select(
        F.col(id_col),
        F.col(score_col),
        ntok.alias("n_tokens"),
    ).withColumn("_ord", -F.col(score_col).cast("double"))
    bucket, off_df = _bucket_offsets(base, "_ord", "n_tokens", n_buckets)
    w = (
        W.partitionBy("_bucket")
        .orderBy("_ord", id_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    staged = (
        base.withColumn("_bucket", bucket)
        .join(F.broadcast(off_df), "_bucket")
        .withColumn(
            "cum_tokens",
            (F.sum("n_tokens").over(w) + F.col("_bucket_off")).cast("long"),
        )
    )
    return staged.where(F.col("cum_tokens") <= int(budget)).select(
        id_col, score_col, "n_tokens", "cum_tokens"
    )


def select_token_budget_per_stratum(
    df: DataFrame,
    budgets: dict | int,
    score_col: str,
    stratum_col: str,
    id_col: str = "doc_id",
    count_col: str | None = None,
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-stratum token budgets — "fill N tokens per language": within
    each stratum, keep the highest-`score_col` rows whose inclusive
    running token total fits that stratum's budget. `budgets` is either
    one int applied to every observed stratum or a {stratum: budget}
    map; mirroring mixture_rebalance's contract, a stratum observed in
    the data but absent from an explicit map gets budget 0 and is
    dropped. The stratum column must be a string (the offset/budget
    frames are built with string keys). Returns (id, stratum, score,
    n_tokens, cum_tokens).

    The running sum generalizes the two-phase prefix sum: ONE
    map-side-combined groupBy((stratum, score-range bucket)) computes
    subtotals — n_strata x n_buckets rows, model parameters (the same
    bounded-strata contract mixture_rebalance documents) — the driver
    prefixes them WITHIN each stratum, and the corpus-side window is
    partitioned by (stratum, bucket). No stratum ever sorts on a single
    task, and strata don't serialize behind each other. An ordinary
    per-stratum window cumsum reproduces the integer result exactly."""
    ntok = (
        F.col(count_col).cast("long")
        if count_col is not None
        else F.size(tokens(text_col)).cast("long")
    )
    base = df.select(
        F.col(id_col),
        F.col(stratum_col),
        F.col(score_col),
        ntok.alias("n_tokens"),
    ).withColumn("_ord", -F.col(score_col).cast("double"))
    spark = base.sparkSession
    lo_hi = base.agg(F.min("_ord").alias("lo"), F.max("_ord").alias("hi")).first()
    if lo_hi["lo"] is None:
        return base.select(
            id_col, stratum_col, score_col, "n_tokens"
        ).withColumn("cum_tokens", F.lit(0).cast("long")).where(F.lit(False))
    lo, hi = float(lo_hi["lo"]), float(lo_hi["hi"])
    width = max((hi - lo) / n_buckets, 1e-9)
    bucket = F.least(
        F.floor((F.col("_ord") - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(int(n_buckets) - 1),
    )
    totals = (
        base.groupBy(
            F.col(stratum_col).alias("_s"), bucket.alias("_bucket")
        )
        .agg(F.sum("n_tokens").alias("_tot"))
        .collect()
    )
    by_stratum: dict = {}
    for row in totals:
        by_stratum.setdefault(row["_s"], []).append(row)
    offs = []
    for s, rows in by_stratum.items():
        acc = 0
        for row in sorted(rows, key=lambda r: r["_bucket"]):
            offs.append((s, row["_bucket"], acc))
            acc += row["_tot"]
    off_df = local_frame(
        spark, offs, "_s string, _bucket bigint, _bucket_off bigint"
    ).withColumnRenamed("_s", stratum_col)
    if isinstance(budgets, int):
        strata = sorted(by_stratum)
        budgets = {s: int(budgets) for s in strata}
    budget_df = F.broadcast(
        local_frame(
            spark,
            [(s, int(b)) for s, b in budgets.items()],
            f"{stratum_col} string, _budget bigint",
        )
    )
    w = (
        W.partitionBy(stratum_col, "_bucket")
        .orderBy("_ord", id_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    staged = (
        base.withColumn("_bucket", bucket)
        .join(F.broadcast(off_df), [stratum_col, "_bucket"])
        .join(budget_df, stratum_col, "left")
        .withColumn(
            "cum_tokens",
            (F.sum("n_tokens").over(w) + F.col("_bucket_off")).cast("long"),
        )
    )
    # null _budget (stratum absent from an explicit map) fails the
    # comparison -> dropped, the documented contract; made explicit:
    return staged.where(
        F.col("cum_tokens") <= F.coalesce("_budget", F.lit(0))
    ).select(id_col, stratum_col, score_col, "n_tokens", "cum_tokens")


def dsir_scored_flagged(
    docs: DataFrame,
    is_target,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    with_tokens: bool = False,
) -> DataFrame:
    """dsir_weights_flagged + dsir_score composed, with the caller's
    token-count pass FUSED into the scoring aggregation: `with_tokens`
    carries size(tokens(text)) per row into the score groupBy (a
    first() over the per-doc group), so the (id, score, n_tokens)
    token-budget frame costs two gram passes and NO third text scan or
    doc_id join (r15, guide §1.2).

    A full one-explosion fusion through a per-(doc, bucket) rollup was
    measured and REJECTED (r15 A/B, 3 interleaved rounds: 7.09 vs
    3.14 s at sf0.1): the rollup's high-cardinality partial aggregation
    plus its materialization cost more than the saved gram scan at any
    local scale — the classic guide §1.1 "ideal plan" gotcha. The
    two-pass form keeps both aggregations map-side-combinable to
    model-sized (weights) / one-row-per-doc (scores) shuffles.

    The token count is projected from a PRE-SPLIT token array below the
    generator (text.gram_stream_from_tokens): referencing
    size(tokens(text)) next to the explode lands the split in the
    post-Generate projection — re-tokenizing the document once per gram
    row, measured 3x on this pipeline (r15).

    Integer-identical to the separate calls (tier-equality pytest).
    Returns ({id_col}, dsir_score_micro, n_grams[, n_tokens])."""
    from ct_mapreduce_spark.operators.text import gram_stream_from_tokens

    weights = dsir_weights_flagged(docs, is_target, text_col, n_buckets)
    tk = docs.select(F.col(id_col), tokens(text_col).alias("_tk"))
    grams = F.concat(
        F.array_remove(F.col("_tk"), ""),
        gram_stream_from_tokens(F.col("_tk"), 2),
    )
    ntok_cols = (
        [F.size("_tk").cast("long").alias("_ntok")] if with_tokens else []
    )
    g = tk.select(
        F.col(id_col),
        *ntok_cols,
        F.explode_outer(grams).alias("_g"),
    ).select(
        id_col,
        *(["_ntok"] if with_tokens else []),
        gram_bucket(F.col("_g"), n_buckets).alias("bucket"),
    )
    out_extra = (
        [F.first("_ntok").cast("long").alias("n_tokens")]
        if with_tokens
        else []
    )
    return (
        g.join(
            F.broadcast(weights.select("bucket", "weight_micro")),
            "bucket",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("weight_micro"), F.lit(0))
            .cast("long")
            .alias("dsir_score_micro"),
            F.count("bucket").cast("long").alias("n_grams"),
            *out_extra,
        )
    )


def dsir_weights_flagged(
    docs: DataFrame,
    is_target,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """dsir_weights for the common target-is-a-slice-of-raw case
    (`is_target` a boolean Column over `docs`): ONE gram explosion with
    a conditional count computes both profiles, instead of two full
    corpus scans for dsir_weights(docs.where(pred), docs). Identical
    integer counts -> bit-identical weights (tier-equality pytest)."""
    g = docs.select(
        is_target.alias("_is_t"), F.explode(dsir_grams(text_col)).alias("_g")
    ).select("_is_t", gram_bucket(F.col("_g"), n_buckets).alias("bucket"))
    counts = g.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
        .cast("long")
        .alias("target_n"),
        F.count(F.lit(1)).cast("long").alias("raw_n"),
    )
    spark = docs.sparkSession
    spine = spark.range(int(n_buckets)).select(
        F.col("id").cast("long").alias("bucket")
    )
    joined = spine.join(counts, "bucket", "left").select(
        "bucket",
        F.coalesce("target_n", F.lit(0)).cast("long").alias("target_n"),
        F.coalesce("raw_n", F.lit(0)).cast("long").alias("raw_n"),
    )
    # Single-task window over the n_buckets spine (bounded, model-sized
    # by construction); Spark 4.1 folds the constant lit(0) spec away
    # (EliminateWindowPartitions) — the lit is a source-level intent
    # marker only; boundedness is covered by the plan audit's
    # bounded-window allowlist over checkpoint-hidden stages too.
    whole = W.partitionBy(F.lit(0))
    b = float(int(n_buckets))
    t_tot = F.sum("target_n").over(whole).cast("double")
    r_tot = F.sum("raw_n").over(whole).cast("double")
    ratio = (
        (F.col("target_n").cast("double") + F.lit(1.0)) * (r_tot + F.lit(b))
    ) / ((F.col("raw_n").cast("double") + F.lit(1.0)) * (t_tot + F.lit(b)))
    return joined.select(
        "bucket",
        "target_n",
        "raw_n",
        F.round(F.log(ratio) * F.lit(1_000_000.0)).cast("long").alias(
            "weight_micro"
        ),
    )
