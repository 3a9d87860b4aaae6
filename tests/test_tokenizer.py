"""BPE tokenizer: training determinism, encode/train equivalence, the
distributed frequency pass, and the mapInPandas encode tiers."""

from __future__ import annotations

from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.tokenizer import (
    END,
    _encode_word,
    _merge_seq,
    bpe_encode,
    bpe_train,
    token_counts,
    word_frequencies,
)

# The Sennrich et al. running example: merges must come out in the classic
# frequency-then-lexicographic order, identically on every run.
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_train_deterministic_and_order_invariant():
    m1 = bpe_train(SENNRICH, n_merges=10)
    m2 = bpe_train(list(reversed(SENNRICH)), n_merges=10)
    assert m1 == m2
    # first merge: ('e','s') count 9 (newest 6 + widest 3) beats all
    assert m1[0] == ("e", "s") and m1[1] == ("es", "t")
    assert len(m1) == 10


def test_train_min_count_stops_early():
    merges = bpe_train([("ab", 1)], n_merges=10, min_count=2)
    assert merges == []
    merges = bpe_train([("ab", 2)], n_merges=100, min_count=2)
    # exhausts all pairs of a 3-symbol word, then stops
    assert merges == [("a", "b"), ("ab", END)]


def test_merge_seq_left_to_right_non_overlapping():
    assert _merge_seq(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")
    assert _merge_seq(("a", "a", "a"), "a", "a") == ("aa", "a")


def test_encode_matches_training_segmentation():
    """Encoding a training word reproduces the segmentation training left
    it with — the classic BPE property, and the concatenation of any
    word's tokens reconstructs word + END exactly."""
    merges = bpe_train(SENNRICH, n_merges=50)
    for word, _ in SENNRICH:
        toks = _encode_word(word, merges)
        assert "".join(toks) == word + END
    # trained-to-exhaustion words collapse to single tokens
    assert _encode_word("newest", merges) == ["newest" + END]
    # unseen word: partial merges apply, reconstruction still exact
    toks = _encode_word("lowest", merges)
    assert "".join(toks) == "lowest" + END and len(toks) > 1


def test_word_frequencies_and_cap(spark):
    docs = spark.createDataFrame(
        [(1, "b a a"), (2, " a\tc  b "), (3, None), (4, "")],
        "doc_id BIGINT, text STRING",
    )
    rows = {
        r["word"]: r["n"] for r in word_frequencies(docs, "text").collect()
    }
    assert rows == {"a": 3, "b": 2, "c": 1}
    capped = word_frequencies(docs, "text", top_v=2).collect()
    assert sorted((r["word"], r["n"]) for r in capped) == [("a", 3), ("b", 2)]


def test_spark_encode_tiers_agree(spark):
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "widest low"), (3, None), (4, "  ")],
        "doc_id BIGINT, text STRING",
    )
    merges = bpe_train(SENNRICH, n_merges=8)
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges, "text").collect()
    }
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in token_counts(docs, merges, "text").collect()
    }
    # token_counts is the count of bpe_encode's arrays, tier-for-tier
    assert counts == {d: len(t) for d, t in enc.items()}
    assert counts[3] == 0 and counts[4] == 0
    # per-word independent encode concatenated in order
    want1 = (
        _encode_word("low", merges)
        + _encode_word("lower", merges)
        + _encode_word("newest", merges)
    )
    assert enc[1] == want1


def test_end_to_end_on_documents(spark):
    """Train on the sf0.001 documents table and encode it: every doc's
    token count is >= its word count (merges only ever shorten words from
    chars+END, never below one token per word)."""
    from ct_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    freq = word_frequencies(docs, top_v=8192)
    merges = bpe_train(freq, n_merges=40)
    assert len(merges) > 0
    out = token_counts(docs, merges).select(
        "n_bpe_tokens",
        F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != "")).alias(
            "n_words"
        ),
    )
    bad = out.where(
        (F.col("n_bpe_tokens") < F.col("n_words")) & (F.col("n_words") > 0)
    ).count()
    assert bad == 0


def test_seeded_shuffle_permutation(spark):
    """seeded_shuffle: (shard, pos) is a partitioning-invariant
    permutation — dense 0..n-1 positions per shard, balanced shards,
    different seeds give different permutations."""
    from ct_mapreduce_spark.operators.sampling import seeded_shuffle

    docs = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    out = seeded_shuffle(docs, "doc_id", seed=7, n_shards=8)
    rows = [(r["doc_id"], r["shard"], r["pos"]) for r in out.collect()]
    assert len(rows) == 400 and len({r[0] for r in rows}) == 400
    by_shard: dict[int, list[int]] = {}
    for _, s, p in rows:
        by_shard.setdefault(s, []).append(p)
    # dense per-shard positions; md5 balance keeps every shard populated
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    assert len(by_shard) == 8
    assert max(len(p) for p in by_shard.values()) < 2 * (400 // 8)
    # partitioning-invariant
    again = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in seeded_shuffle(
            docs.repartition(13), "doc_id", seed=7, n_shards=8
        ).collect()
    )
    assert again == sorted(rows)
    # a different seed is a different permutation
    other = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in seeded_shuffle(docs, "doc_id", seed=8, n_shards=8).collect()
    )
    assert other != sorted(rows)


def test_vocab_ids_and_unk(spark):
    """bpe_vocab numbers the sorted alphabet then merges in order;
    encode_ids round-trips through the inverse vocab, and unseen
    characters resolve to -1."""
    from ct_mapreduce_spark.operators.tokenizer import (
        alphabet_of,
        bpe_encode_ids,
        bpe_vocab,
    )

    merges = bpe_train(SENNRICH, n_merges=8)
    alphabet = alphabet_of(SENNRICH)
    vocab = bpe_vocab(merges, alphabet)
    # alphabet ids come first and are dense
    base = sorted(alphabet | {END})
    assert [vocab[s] for s in base] == list(range(len(base)))
    # merged tokens follow in merge order
    merged_ids = [vocab[a + b] for a, b in merges if a + b in vocab]
    assert merged_ids == sorted(merged_ids)

    docs = spark.createDataFrame(
        [(1, "low newest"), (2, "zebra?")], "doc_id BIGINT, text STRING"
    )
    enc = {
        r["doc_id"]: r["token_ids"]
        for r in bpe_encode_ids(docs, merges, vocab).collect()
    }
    inv = {i: t for t, i in vocab.items()}
    # round-trip doc 1 through the inverse vocab
    text1 = "".join(inv[i] for i in enc[1]).replace(END, " ").rstrip()
    assert text1 == "low newest"
    # 'z', 'b', 'r', 'a', '?' were never in training: UNK ids present
    assert -1 in enc[2]
