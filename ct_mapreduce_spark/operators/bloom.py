"""Bloom-filter membership prefilter (broadcast-literal form).

At 100 TB the dominant cost of "which incoming keys are already known?" —
the reference's set-membership primitive (SISMEMBER,
storage/rediscache.go:74-78; gating dedup storage/knowncertificates.go:36-55)
— is shuffling the probe side for the exact join. A bloom filter built over
the known-key set turns that into a scan-local filter: each task tests its
own rows against an in-memory bit array and only the (tiny) surviving
fraction reaches the exact semi-join that removes false positives. The
final answer is exact; the bloom only prunes.

Spark's internal `bloom_filter_agg` expression is not registered for SQL/
DataFrame use, so the filter is built from public primitives and stays
engine-portable:

- build: each key contributes k = `k_hashes` bit positions
  pmod(xxhash64(key, seed_i), m). One map-side-combined groupBy over the
  word index ORs the per-key masks into at most m/64 longs — partial
  aggregation means executors combine locally and the shuffle moves at
  most m/64 rows per task, independent of key count.
- serve: the dense word array (m/64 longs; 16 KiB per 2^17 bits) is
  collected once — a bounded model parameter, the centroid-literal
  pattern of operators/similarity.py — and embedded as a single array
  literal. Membership unrolls to k codegen'd element_at + bitwiseAND
  checks: no join, no shuffle, no Python.

For filters too big to inline (billions of keys at ~10 bits/key), keep
`bloom_words` as a table and probe via a broadcast join on word_idx
instead of the literal; the build side is identical.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """The k seeded bit positions of a key: pmod(xxhash64(key, i), m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k_hashes)
    ]


def bloom_words(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    k_hashes: int = 5,
) -> DataFrame:
    """Build the filter as a (word_idx, bits) table: bit_or of the per-key
    masks, grouped by 64-bit word. At most m_bits/64 rows regardless of
    key count; the groupBy partial-aggregates map-side."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k_hashes))).alias(
            "pos"
        )
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_literal(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    k_hashes: int = 5,
) -> list[int]:
    """Collect the filter into a dense Python word array (m_bits/64 longs
    — bounded by the m_bits parameter, not by data size)."""
    dense = [0] * (m_bits // 64)
    for r in bloom_words(keys, key_col, m_bits, k_hashes).collect():
        dense[int(r.word_idx)] = int(r.bits)
    return dense


def _sql_long_array(vals: list[int]) -> Column:
    """The word array as ONE parsed SQL literal. `F.lit(<list>)` expands
    to array(lit(v), ...) — one py4j round-trip per element, measured
    1.8-2.2 s of pure driver time per serve for the default 2048-word
    filter (r15; the similarity._sql_double_array disease, guide §5).
    Long literals render exactly, so the parsed expression is
    bit-identical to the Column form."""
    return F.expr("array(%s)" % ",".join("%dL" % int(v) for v in vals))


def might_contain(
    key: Column, words: list[int], m_bits: int, k_hashes: int
) -> Column:
    """Membership test against an inlined word array: k unrolled
    element_at + bitwiseAND checks (whole-stage codegen; no lambda, no
    join). False positives possible, false negatives not."""
    arr = _sql_long_array(words)
    checks = []
    for pos in _positions(key, m_bits, k_hashes):
        word = F.element_at(arr, ((pos / 64).cast("long") + 1).cast("int"))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    return functools.reduce(lambda a, b: a & b, checks)


def bloom_prefilter_semi_join(
    probe: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    k_hashes: int = 5,
) -> DataFrame:
    """Exact semi-join accelerated by a bloom prefilter: probe rows that
    cannot be in `keys` are dropped scan-locally; survivors (matches +
    the ~fpp false-positive sliver) go through the exact semi-join. The
    result equals `probe.join(keys, key_col, 'left_semi')` bit-for-bit —
    the bloom changes the physical plan, never the answer."""
    words = bloom_literal(keys, key_col, m_bits, k_hashes)
    pre = probe.where(might_contain(F.col(key_col), words, m_bits, k_hashes))
    return pre.join(
        keys.select(key_col).distinct(), key_col, "left_semi"
    )
