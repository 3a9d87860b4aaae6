"""Near-duplicate detection for training-data pipelines (north-star surface).

Four tiers, all shuffle-conscious:

- exact_dedup:        hash-groupBy on md5(text). One shuffle on a short key.
- ngram_jaccard_pairs: exact Jaccard over word-shingle sets via a
                      shingle-inverted-index self-join. Quadratic in the
                      worst case — the *verification* tier, run on candidate
                      buckets, not the whole corpus, at scale.
- minhash_lsh_pairs:  MinHash signatures + banded LSH. The 100 TB tier: one
                      explode of b bands per doc, groupBy band-signature,
                      pairs only within buckets. All built-in expressions —
                      no Python in the loop.
- simhash_pairs:      64-bit SimHash + hamming-radius candidate pairs.

MinHash math: h_i(S) = min_{x in S} hash_i(x) with an independent uniform
hash per slot; P[h_i(A)=h_i(B)] = J(A,B). Banding with r rows x b bands
flags pairs with J >~ (1/b)^(1/r).
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG = logging.getLogger(__name__)

from ct_mapreduce_spark.operators.text import shingles
from ct_mapreduce_spark.operators.util import fan_out

def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: canonical row = min doc_id (same
    first-seen-wins contract as operators/dedup.py)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_table(docs: DataFrame, text_col: str, k: int) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(shingles(text_col, k)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard similarity >= threshold over word k-gram shingle sets.

    Plan: shingle inverted index -> self-join on shingle (co-occurrence
    counts = |A∩B|) -> join per-doc sizes -> J = inter / (|A|+|B|-inter).
    The division's operands are exact integers, so J is bit-identical
    across engines.
    """
    sh = _shingle_table(docs, text_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    # No broadcast hint on the sizes table: it has one row per document, so
    # forcing a broadcast is a driver/executor OOM at corpus scale. AQE
    # broadcasts it when the (filtered) build side is genuinely small and
    # falls back to a shuffle join otherwise.
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", "inter", "n_a", "n_b", F.round("jaccard", 6).alias("jaccard"))


MERSENNE_P = (1 << 61) - 1


def minhash_signatures_expr(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Pure-expression MinHash (no Python anywhere): h_i(s) =
    xxhash64(base_hash(s), i, seed). Use when Python workers are
    unavailable/undesired; ~3x slower than the vectorized default because
    higher-order array functions are interpreted, not codegen'd."""
    base = F.transform(shingles(text_col, k), lambda s: F.xxhash64(s))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(base, lambda h: F.xxhash64(h, i, F.lit(seed)))
        ),
    )
    return docs.select("doc_id", sig.alias("minhash"))


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """doc_id -> array<long> of num_hashes MinHash values.

    Arrow-batched pandas UDF with the hot loop in numpy uint64. The hash
    family is h_i(x) = ((a_i * x + b_i) mod 2^64) mod (2^61 - 1): numpy
    uint64 arithmetic wraps the product mod 2^64 *before* the mod-p, so
    this is NOT the textbook universal family (a*x+b) mod p — the strict
    P[h(A)=h(B)] = J(A,B) guarantee holds only approximately. It is
    deterministic, well-mixed in practice (recall >= 0.9 vs exact Jaccard
    in tests), and one vectorized (num_hashes x n_shingles) broadcast per
    doc; exact mod-p would need 128-bit splitting for no measured recall
    gain. Measured
    ~3x faster than the pure-expression form at sf0.1 (interpreted
    higher-order functions vs numpy) — the sanctioned use of the Python
    path: vectorized, no per-row overhead.

    Shingle base hash = keyed blake2b-64, NOT Python's hash(): builtin
    hash is salted per process (PYTHONHASHSEED), which would make task
    retries non-deterministic.

    No shuffle: per-row computation; callers repartition for CPU balance.
    """
    rng = np.random.default_rng(seed)
    p = np.uint64(MERSENNE_P)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    key = seed.to_bytes(8, "big")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _mh(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                toks = (t or "").strip().split()
                if len(toks) < k:
                    out.append([0] * num_hashes)
                    continue
                shs = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                h = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.blake2b(
                                sh.encode(), digest_size=8, key=key
                            ).digest(),
                            "big",
                        )
                        for sh in shs
                    ),
                    dtype=np.uint64,
                    count=len(shs),
                ) & p
                v = (a[:, None] * h[None, :] + b[:, None]) % p
                out.append(v.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return docs.select("doc_id", _mh(text_col).alias("minhash"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket_width: int | None = 4096,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    r = num_hashes/bands rows per band; a pair collides if any band's
    sub-signature matches exactly. Scale shape: explode -> groupBy band
    bucket -> per-bucket pairing.

    Hot buckets (boilerplate-heavy corpora put millions of docs in one
    bucket, making the pairing quadratic) are capped at `max_bucket_width`
    members by a deterministic top-N-by-hash truncation: members ranked by
    xxhash64(doc_id, seed) keep their slot, the tail is dropped from that
    band only (the doc still pairs through its other bands). The number of
    saturated buckets is logged after materialization; pass
    max_bucket_width=None to disable.

    Output: (doc_a, doc_b, n_bands_matched, est_jaccard) where est_jaccard
    is the signature-agreement fraction (unbiased J estimate).
    """
    r = num_hashes // bands
    # Signature computation is CPU-dense per-row work: fan out first.
    sigs = minhash_signatures(fan_out(docs), text_col, k, num_hashes, seed)
    banded = sigs.select(
        "doc_id",
        "minhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.sha1(
                        F.concat_ws(",", F.slice("minhash", i * r + 1, r))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "minhash", "bb.band", "bb.bucket")
    if max_bucket_width is not None:
        # Deterministic truncation: rank within (band, bucket) by a seeded
        # hash of doc_id (ties broken by doc_id) so retries and engines
        # agree on which members survive. The window's hash partitioning on
        # (band, bucket) is the same clustering the self-join needs, so
        # this costs no extra exchange.
        w = Window.partitionBy("band", "bucket").orderBy(
            F.xxhash64("doc_id", F.lit(seed)), "doc_id"
        )
        banded = banded.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= max_bucket_width
        )
    # The banded frame feeds both sides of the self-join; without a
    # materialization point the narrow signature computation (the expensive
    # part) would execute twice — the two join sides don't canonicalize to
    # a reusable exchange. localCheckpoint rather than persist(): blocks
    # are owned by the RDD and freed by the ContextCleaner when the result
    # is garbage collected, instead of leaking a CacheManager entry per
    # invocation in a long-lived session.
    banded = banded.localCheckpoint(eager=True)
    if max_bucket_width is not None:
        n_sat = banded.where(F.col("_rn") == max_bucket_width).count()
        if n_sat:
            _LOG.warning(
                "minhash_lsh_pairs: %d band-buckets hit max_bucket_width=%d; "
                "tail members beyond the cap were dropped from those bands",
                n_sat,
                max_bucket_width,
            )
        banded = banded.drop("_rn")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_bands_matched"),
            F.first(
                F.size(
                    F.filter(
                        F.zip_with(
                            F.col("a.minhash"), F.col("b.minhash"), lambda x, y: x == y
                        ),
                        lambda eq: eq,
                    )
                )
            ).alias("n_hash_agree"),
        )
        .withColumn(
            "est_jaccard",
            F.round(F.col("n_hash_agree").cast("double") / num_hashes, 6),
        )
    )
    return pairs.select("doc_a", "doc_b", "n_bands_matched", "est_jaccard")


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc, materialized as four 16-bit chunk columns
    c0..c3 (all integer arithmetic — no 64-bit-in-double precision traps).

    Plan: explode distinct tokens -> xxhash64 -> one groupBy(doc_id) with
    64 conditional-sum aggregates (sign counts per bit), then chunk
    assembly is a pure projection. One shuffle keyed by doc_id; map-side
    partial aggregation keeps the shuffle narrow.
    """
    toks = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
    tok_tbl = docs.select(
        "doc_id", F.explode(F.transform(toks, lambda t: F.xxhash64(t))).alias("h")
    )
    aggs = []
    for b in range(64):
        bit = F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))
        aggs.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"b{b}"))
    sums = tok_tbl.groupBy("doc_id").agg(*aggs)
    chunk_cols = []
    for i in range(4):
        expr = F.lit(0)
        for j in range(16):
            expr = expr + F.when(F.col(f"b{i * 16 + j}") > 0, F.lit(1 << j)).otherwise(0)
        chunk_cols.append(expr.cast("long").alias(f"c{i}"))
    return sums.select("doc_id", *chunk_cols)


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup candidates within a hamming radius.

    Blocking: candidates must share at least one exact 16-bit chunk
    (pigeonhole-complete for hamming <= 3; standard recall/cost trade for
    radius 8). Hamming distance = sum of per-chunk xor popcounts —
    integer-exact.
    """
    sigs = simhash_signatures(docs, text_col)
    chunks = sigs.select(
        "doc_id",
        "c0",
        "c1",
        "c2",
        "c3",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("chunk"), F.col(f"c{i}").alias("ckey"))
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "c0", "c1", "c2", "c3", "cc.chunk", "cc.ckey")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.c{i}").alias(f"a_c{i}") for i in range(4)],
            *[F.col(f"b.c{i}").alias(f"b_c{i}") for i in range(4)],
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.lit(0)
    for i in range(4):
        ham = ham + F.bit_count(F.col(f"a_c{i}").bitwiseXOR(F.col(f"b_c{i}")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
