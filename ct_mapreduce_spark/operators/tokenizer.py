"""Learned BPE tokenizer: distributed frequency estimation, driver-side
merge training on the model-sized frequency table, distributed encoding.

This is the classic byte-pair-encoding pipeline (Sennrich et al. 2016;
the GPT-2 encoder's merge-application shape) arranged the way a 100 TB
corpus forces:

- **word_frequencies** is the only corpus-sized pass: one map-side-combined
  groupBy on the whitespace word, optionally capped to the top-V words
  (TakeOrderedAndProject — per-partition partial top-k, driver merge of
  V-sized heads, never a global sort). Real tokenizer trainers operate on
  exactly this frequency-capped word table, not on raw text.
- **bpe_train** runs on the collected frequency table — bounded at top_v
  rows by contract, i.e. model-sized like the IVF centroid matrices, NOT
  a corpus collect. Incremental pair-statistics updates (only words
  containing the merged pair are re-counted) keep training at
  O(merges x affected-words), the standard efficient implementation.
- **bpe_encode / token_counts** are embarrassingly parallel mapInPandas
  over documents with a per-batch word->tokens memo — natural-language
  word frequency is Zipfian, so the memo turns per-word encode cost into
  ~one encode per DISTINCT word per batch.

Declared semantics (tools/independent_oracle.py re-derives these from
this spec with deliberately different algorithms — naive O(V) per-round
pair counting vs the engine's incremental updates, min-rank iterative
encode vs the engine's in-order merge application — so the pin gate
actually cross-checks the bookkeeping):

1. Words: Java `\\s+` split of `trim(text)`, empty strings dropped,
   case preserved.
2. A word's initial symbol sequence is its unicode code points followed
   by the end-of-word marker symbol `</w>`.
3. Training repeats n_merges times over {word: count}: count every
   adjacent symbol pair (overlapping positions each count, weighted by
   the word's count); pick the pair with the highest count, ties broken
   by the lexicographically smallest (left, right); stop early when the
   best count < min_count; rewrite each word by merging occurrences of
   the pair left-to-right non-overlapping (merging ("a","a") in
   "aaaa" yields ["aa","aa"], not three overlapping "aa"s).
4. Encoding a word applies the learned merges: equivalent formulations
   are (a) each merge in training order, full left-to-right pass per
   merge, and (b) repeatedly merging the present pair with the lowest
   rank — equivalent because a merge's output symbol can only
   participate in later-rank merges. The engine uses (a); the
   independent oracle uses (b).

No reference analog (jcjones/ct-mapreduce has no tokenizer); extends the
training-data-pipeline surface next to packing and dedup.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ct_mapreduce_spark.operators.text import tokens

END = "</w>"

# Java \s is ASCII-only — Python's str.split() would also split on unicode
# whitespace (\xa0 etc.) and silently diverge from the F.split('\\s+')
# words that word_frequencies trains on.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


# ---------------------------------------------------------------- corpus pass


def word_frequencies(
    docs: DataFrame, text_col: str = "text", top_v: int | None = None
) -> DataFrame:
    """(word, n) frequency table — the one corpus-sized pass of tokenizer
    training. groupBy(word) map-side-combines, so the shuffle carries one
    row per (word, task), not per occurrence; the top-V cap compiles to
    TakeOrderedAndProject (partial top-k before the driver merge).
    Ordering for the cap is (n DESC, word ASC) — fully deterministic."""
    words = docs.select(F.explode(tokens(text_col)).alias("word")).where(
        F.col("word") != ""
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if top_v is not None:
        freq = freq.orderBy(F.col("n").desc(), F.col("word").asc()).limit(top_v)
    return freq


# ------------------------------------------------------------- driver training


def _merge_seq(seq: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a+b."""
    out: list[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def bpe_train(
    freq: DataFrame | Iterable[tuple[str, int]],
    n_merges: int = 60,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn BPE merges from a word-frequency table. `freq` is either the
    word_frequencies frame (collected here — bounded at top_v rows by
    that operator's contract, model-sized like a centroid matrix) or an
    iterable of (word, count).

    Incremental statistics: a pair->count table plus a pair->word-index
    inverted index; each merge re-derives pair contributions only for
    the words that actually contained the merged pair. Deterministic:
    ties on count break to the lexicographically smallest pair, and all
    counting is exact integer arithmetic."""
    if isinstance(freq, DataFrame):
        rows = [(r["word"], int(r["n"])) for r in freq.collect()]
    else:
        rows = [(w, int(n)) for w, n in freq]
    # fixed processing order — determinism does not depend on input order
    rows.sort(key=lambda r: (-r[1], r[0]))

    seqs: list[tuple[str, ...]] = [tuple(w) + (END,) for w, _ in rows]
    counts: list[int] = [n for _, n in rows]

    def _pair_contrib(seq: tuple[str, ...], n: int, stats, index, wi) -> None:
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            stats[p] = stats.get(p, 0) + n
            index.setdefault(p, set()).add(wi)

    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (seq, n) in enumerate(zip(seqs, counts)):
        _pair_contrib(seq, n, stats, index, wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best: tuple[str, str] | None = None
        best_n = 0
        for p, n in stats.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < min_count:
            break
        merges.append(best)
        for wi in sorted(index.get(best, ())):
            old = seqs[wi]
            # retract the word's old contributions, re-add the merged ones
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                stats[p] -= counts[wi]
                if stats[p] <= 0:
                    del stats[p]
                ws = index.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del index[p]
            new = _merge_seq(old, *best)
            seqs[wi] = new
            _pair_contrib(new, counts[wi], stats, index, wi)
    return merges


# --------------------------------------------------------- distributed encode


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges in training order (formulation (a) of the module
    docstring). O(len(merges) x len(word)) worst case; callers memoize
    per distinct word."""
    seq: tuple[str, ...] = tuple(word) + (END,)
    for a, b in merges:
        if len(seq) == 1:
            break
        seq = _merge_seq(seq, a, b)
    return list(seq)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append an array<string> column of BPE tokens (whitespace words
    encoded independently, concatenated in order). mapInPandas with a
    per-batch word->tokens memo: narrow, no shuffle, Zipfian word reuse
    makes the memo hit rate ~1 for natural text."""
    out_schema = T.StructType(
        list(docs.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    mlist = list(merges)

    def run(batches: Iterator) -> Iterator:
        memo: dict[str, list[str]] = {}

        def enc_doc(text: str) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in _JAVA_WS.split(text.strip(" ")):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, mlist)
                out.extend(got)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc_doc)
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


def token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token count without materializing token arrays:
    same memoized encode, but only the per-word token COUNT leaves the
    memo — the hot path moves one int per word, not the strings."""
    out_schema = T.StructType(
        list(docs.schema.fields)
        + [T.StructField("n_bpe_tokens", T.LongType())]
    )
    mlist = list(merges)

    def run(batches: Iterator) -> Iterator:
        memo: dict[str, int] = {}

        def count_doc(text: str) -> int:
            if text is None:
                return 0
            total = 0
            for w in _JAVA_WS.split(text.strip(" ")):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = len(_encode_word(w, mlist))
                total += got
            return total

        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_bpe_tokens"] = pdf[text_col].map(count_doc).astype("int64")
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)


# ----------------------------------------------------------- model persistence


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table as one-file parquet (mrank, lhs, rhs) —
    the model artifact is merges-in-order; everything else derives."""
    from ct_mapreduce_spark.operators.util import local_frame

    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    local_frame(
        spark, rows, "mrank BIGINT, lhs STRING, rhs STRING"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Read a save_merges artifact back into training order."""
    rows = spark.read.parquet(path).orderBy("mrank").collect()
    return [(r["lhs"], r["rhs"]) for r in rows]


# ------------------------------------------------------------------ token ids


def bpe_vocab(
    merges: list[tuple[str, str]], base_symbols: Iterable[str]
) -> dict[str, int]:
    """Deterministic token->id mapping: the sorted base alphabet (single
    symbols observed at training time, including the END marker) takes
    ids [0, |alphabet|), then merged tokens in merge order. Symbols not
    in the vocabulary encode as -1 (UNK) — the contract for characters
    never seen in training."""
    vocab: dict[str, int] = {}
    for s in sorted(set(base_symbols) | {END}):
        vocab[s] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def alphabet_of(freq: DataFrame | Iterable[tuple[str, int]]) -> set[str]:
    """The base alphabet induced by a frequency table: every code point
    of every word (END is added by bpe_vocab)."""
    if isinstance(freq, DataFrame):
        words = [r["word"] for r in freq.select("word").collect()]
    else:
        words = [w for w, _ in freq]
    return {c for w in words for c in w}


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """Append an array<long> column of token ids — the training-ready
    output shape (what a dataloader consumes, with `pack_sequences`
    spans laid over it). Same memoized mapInPandas as bpe_encode; ids
    resolve through `vocab`, unknown tokens to -1."""
    out_schema = T.StructType(
        list(docs.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.LongType()))]
    )
    mlist = list(merges)
    vmap = dict(vocab)

    def run(batches: Iterator) -> Iterator:
        memo: dict[str, list[int]] = {}

        def enc_doc(text: str) -> list[int]:
            if text is None:
                return []
            out: list[int] = []
            for w in _JAVA_WS.split(text.strip(" ")):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = [
                        vmap.get(t, -1) for t in _encode_word(w, mlist)
                    ]
                out.extend(got)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc_doc)
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)
