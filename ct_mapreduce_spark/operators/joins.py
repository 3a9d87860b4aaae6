"""Join operators beyond plain equi-joins (SURVEY §2.5: the reference has
no general join executor; the engine provides the family anyway).

- asof_join:  for each left row, the most recent right row at-or-before
  its timestamp, per key. Spark lacks a native as-of join; the scalable
  composition here is union + last_value(ignorenulls) window — one shuffle
  on (key, time), no range explosion, no per-group Python. (The
  pd.merge_asof/applyInPandas alternative shuffles full groups into
  Python; this stays JVM-side.)
- range_join: band/bucket join of a fact column into interval dims.
  Broadcast non-equi join; with many intervals, bucketize first so the
  join is equi on bucket id (avoids the O(n*m) nested loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + columns of the matched right row per `on` key:
    direction='backward' (default) matches the LATEST right row with
    right_time <= left_time; direction='forward' matches the EARLIEST
    right row with right_time >= left_time (pandas merge_asof parity).

    Plan: tag both inputs, union, single window sorted by (time, side) —
    right rows sort before left rows at equal times so exact-tie matches
    are included — then last_value(ignorenulls) carries the nearest
    right values onto each left row. Forward is the same scan over the
    reversed time order; either way one shuffle on the key, no range
    explosion, no per-group Python.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    # The right-side payload struct carries right_time under a reserved
    # name so the tolerance check compares against the actual time column,
    # not positionally against right_cols[0].
    r_struct = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_time).alias("__asof_t")
    )
    lt = F.col(left_time)
    l_tagged = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(r_struct.alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        W.partitionBy("_k")
        .orderBy(t_order, F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        gap = F.col("_t").cast("double") - F.col("_match.__asof_t").cast("double")
        if direction == "forward":
            gap = -gap
        out = out.withColumn(
            "_match", F.when(gap <= tolerance_seconds, F.col("_match"))
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """fact rows joined to the interval [lo, hi) containing value_col.
    Ranges side is broadcast (interval dims are small by nature)."""
    return fact.join(
        F.broadcast(ranges),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "left",
    )
