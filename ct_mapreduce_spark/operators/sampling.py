"""Deterministic sampling for training-data pipelines.

`df.sample()` / `sampleBy()` are seed-dependent AND partitioning-
dependent — rerun the job with different file splits and the sample
changes, which poisons train/val/test hygiene. Everything here derives
membership from a content hash of a stable key, so the assignment is a
pure function of the data: reproducible across engines (the DuckDB
oracle computes the identical buckets), across retries, and across
repartitioning. This is how production corpus splits stay stable while
the corpus itself grows.

Hash = first 8 hex chars of md5(key) as an integer (md5 agrees across
every engine; 32 bits is plenty for bucket assignment), bucket = value
mod `buckets`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Stable [0, buckets) assignment from md5 of the key's string form."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def hash_uniform(key: Column | str) -> Column:
    """Stable uniform draw in [0, 1) from md5 of the key's string form.

    32 hash bits / 2^32 — the division is exact in IEEE double (numerator
    < 2^32, power-of-two denominator), so Spark and the DuckDB oracle
    compute bit-identical values and membership decisions agree exactly.
    """
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        / F.lit(float(1 << 32))
    )


def weighted_sample(df: DataFrame, key: str, weight: Column) -> DataFrame:
    """Keep each row independently with probability min(1, weight),
    deterministically: row survives iff hash_uniform(key) < weight.

    The curation use-case is quality-weighted downsampling — high-quality
    documents kept at (or near) full rate, low-quality ones thinned — with
    the same reproducibility contract as hash_split: membership is a pure
    function of (key, weight), stable under retries, repartitioning, and
    corpus growth, and replayable by any engine with md5. Expected kept
    fraction = E[min(1, weight)]; no shuffle (a scan-local filter that
    Catalyst pushes toward the source)."""
    return df.where(hash_uniform(key) < F.least(F.lit(1.0), weight))


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, int],
    buckets: int = 100,
) -> DataFrame:
    """Assign each row to a named split by hash-bucket ranges.

    splits = {"train": 80, "val": 10, "test": 10} (percent of buckets,
    must sum to `buckets`). Adding rows later never moves an existing
    row between splits — membership depends only on the row's own key.
    """
    assert sum(splits.values()) == buckets, "split weights must cover buckets"
    b = hash_bucket(key, buckets)
    expr = None
    lo = 0
    for name, width in splits.items():
        cond = (b >= lo) & (b < lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn("split", expr)


def mixture_rebalance(
    df: DataFrame,
    stratum_col: str,
    key: str,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministically downsample to a target stratum mixture — the
    data-mixing step of a training pipeline (e.g. rebalance a web crawl
    to uniform-over-languages before tokenization).

    Given per-stratum counts n_s and target shares t_s (default
    uniform), the largest corpus honoring the mixture with keep-prob
    <= 1 everywhere has N' = min_s(n_s / t_s) rows; each stratum keeps
    rows with probability p_s = t_s * N' / n_s. Membership is the
    hash_uniform draw (pure function of the key), so the kept set is
    engine/partitioning/growth-stable and the DuckDB oracle replays it
    exactly. Expected result shares = t_s (exact up to hash
    granularity); the binding stratum keeps everything.

    Plan: one map-side-combined count per stratum (model-parameter-sized
    frame), broadcast join of the per-stratum keep-prob, scan-local
    filter. The corpus never shuffles.

    Contract for explicit target_shares: observed strata absent from the
    map get share 0.0 and are DROPPED (keep_p = 0) — list a stratum with
    share 0.0 and omitting it are equivalent. Shares only set relative
    proportions (they need not sum to 1).
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    # Windows over the counts frame are single-task by design but over a
    # MODEL-PARAMETER-sized input (one row per stratum), which is what
    # makes them safe; boundedness is asserted by the plan audit's
    # bounded-window allowlist (tools/plan_audit.py), which now also
    # sees checkpoint-hidden stages. Spark 4.1's
    # EliminateWindowPartitions folds the constant lit(0) partitionSpec
    # away (the executed plan shows an unpartitioned WindowExec and may
    # warn "No Partition Defined" — expected here); the lit(0) is kept
    # only as a source-level marker of intent. The agg+crossJoin
    # alternative would re-derive the corpus-sized groupBy on both
    # branches, so the window form stays.
    whole = W.partitionBy(F.lit(0))
    if target_shares is None:
        shared = counts.withColumn(
            "_t", F.lit(1.0) / F.count(F.lit(1)).over(whole)
        )
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target_shares.items() for x in kv]
        )
        # Contract: a stratum observed in the data but ABSENT from
        # target_shares gets share 0.0 — its rows are dropped (keep_p =
        # 0), explicitly rather than via a null keep_p silently failing
        # the filter. The N' min below guards the 0 divisor so covered
        # strata are unaffected.
        shared = counts.withColumn(
            "_t",
            F.coalesce(
                F.element_at(mapping, F.col(stratum_col)), F.lit(0.0)
            ),
        )
    # when() guard: _t = 0.0 (uncovered stratum) must not divide — ANSI
    # mode makes a zero divisor a hard error, not Infinity; min() skips
    # the null, so uncovered strata never bind N'.
    n_prime = F.min(
        F.when(F.col("_t") > 0.0, F.col("_n") / F.col("_t"))
    ).over(whole)
    # _t == 0 short-circuits to keep_p = 0: 0 * n_prime can be 0 * Inf =
    # NaN when no observed stratum is covered, and NaN compares greater
    # than everything in least().
    probs = shared.withColumn(
        "_keep_p",
        F.when(F.col("_t") == 0.0, F.lit(0.0)).otherwise(
            F.least(F.lit(1.0), F.col("_t") * n_prime / F.col("_n"))
        ),
    ).select(stratum_col, "_keep_p")
    return (
        df.join(F.broadcast(probs), stratum_col)
        .where(hash_uniform(key) < F.col("_keep_p"))
        .drop("_keep_p")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key: str,
    n_per_stratum: int,
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rank rows inside each
    stratum by (md5 hash, key) and keep the first n. Unlike sampleBy
    (probabilistic, partitioning-sensitive), the selected set is a pure
    function of the data — and the per-stratum window is the same
    shuffle a grouped aggregate would pay."""
    h = F.md5(F.col(key).cast("string"))
    w = W.partitionBy(stratum_col).orderBy(h, F.col(key))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def seeded_shuffle(
    df: DataFrame,
    key: str,
    seed: int = 42,
    n_shards: int = 64,
    out_shard: str = "shard",
    out_pos: str = "pos",
) -> DataFrame:
    """Deterministic seeded global shuffle into ordered shards — the
    "shuffle the corpus before training" step, as a pure function of
    (seed, key) rather than of Spark's partitioning.

    Every row gets rank = md5(seed || ':' || key): `shard` is the top 32
    rank bits mod n_shards, `pos` the 0-based position within the shard
    ordered by (rank, key) — the key tiebreak makes the order total even
    under md5 collisions. Rerunning with the same seed on any engine or
    any partitioning reproduces the identical permutation (the DuckDB
    oracle replays it exactly); changing the seed is a fresh independent
    permutation.

    Scale posture: md5 spreads rows uniformly, so the n_shards window
    partitions are balanced by construction — no skew, AQE not needed.
    Choose n_shards ~ corpus_size / desired_shard_size: the per-shard
    sort IS the sort a writer must pay to emit ordered shards anyway
    (repartition(n_shards, shard) + sortWithinPartitions is the same
    exchange), so the plan carries exactly one shuffle. A GLOBAL
    orderBy(rank) — the naive formulation — would funnel the corpus
    through a single range-partitioned sort; this never does."""
    rank = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string"))
    )
    df = df.withColumn("_shuffle_rank", rank).withColumn(
        out_shard,
        (
            F.conv(F.substring("_shuffle_rank", 1, 8), 16, 10).cast("long")
            % n_shards
        ),
    )
    w = W.partitionBy(out_shard).orderBy("_shuffle_rank", key)
    return df.withColumn(
        out_pos, (F.row_number().over(w) - 1).cast("long")
    ).drop("_shuffle_rank")
