"""The golden pins are only honest if the independent (no-Spark)
re-derivation in tools/independent_oracle.py (a) bit-matches the engine on
the real parameters and (b) DIVERGES when a parameter is corrupted — i.e.
it is a real second derivation, not a mirror of the engine's plan."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import independent_oracle as io_

SF = "/root/testdata/sf0.001"


def _spark_rows(spark, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF)
    return sorted(tuple(r) for r in df.collect())


def test_ivf_matches_engine_and_catches_corruption(spark):
    engine = _spark_rows(spark, "emb_ann_ivf")
    assert [tuple(r) for r in io_.emb_ann_ivf(SF)] == engine
    # corrupt the centroid-pick seed: the independent path must diverge
    assert [tuple(r) for r in io_.emb_ann_ivf(SF, seed=43)] != engine


def test_lsh_matches_engine_and_catches_corruption(spark):
    engine = _spark_rows(spark, "emb_ann_lsh")
    assert [tuple(r) for r in io_.emb_ann_lsh(SF)] == engine
    # corrupt the banding structure (2 bands of 8 bits instead of 4 of 4):
    # candidate generation changes, the re-derivation must notice
    assert [tuple(r) for r in io_.emb_ann_lsh(SF, bands=2)] != engine


def test_minhash_matches_engine_and_catches_corruption(spark):
    engine = _spark_rows(spark, "docs_minhash_lsh_dedup")
    assert [tuple(r) for r in io_.docs_minhash_lsh_dedup(SF)] == engine
    assert [tuple(r) for r in io_.docs_minhash_lsh_dedup(SF, seed=7)] != engine


def test_mm_features_match_engine_and_catch_corruption(spark):
    engine = _spark_rows(spark, "mm_extract_features")
    assert [tuple(r) for r in io_.mm_extract_features(SF)] == engine
    # a different fixture seed changes payloads => checksums must diverge
    assert [tuple(r) for r in io_.mm_extract_features(SF, seed=1)] != engine


def test_ctlog_scan_matches_engine_and_catches_corruption(spark):
    engine = _spark_rows(spark, "s1_ctlog_scan")
    assert [tuple(r) for r in io_.s1_ctlog_scan(SF)] == engine
    assert [tuple(r) for r in io_.s1_ctlog_scan(SF, offset=400)] != engine


def test_bpe_matches_engine_and_catches_corruption(spark):
    engine = _spark_rows(spark, "docs_bpe_token_stats")
    assert [tuple(r) for r in io_.docs_bpe_token_stats(SF)] == engine
    # a shorter merge table segments words differently: counts must move
    assert [tuple(r) for r in io_.docs_bpe_token_stats(SF, n_merges=20)] != engine
    vocab = _spark_rows(spark, "docs_bpe_vocab")
    assert [tuple(r) for r in io_.docs_bpe_vocab(SF)] == vocab
    assert [tuple(r) for r in io_.docs_bpe_vocab(SF, n_merges=20)] != vocab


def test_ridge_matches_engine_and_catches_corruption(spark):
    engine = _spark_rows(spark, "docs_ridge_fit")
    assert [tuple(r) for r in io_.docs_ridge_fit(SF)] == engine
    # corrupting a moment (drop the last doc) must move the fit
    import independent_oracle as m

    real = m._ridge_rows
    try:
        m._ridge_rows = lambda sf: real(sf)[:-1]
        assert [tuple(r) for r in io_.docs_ridge_fit(SF)] != engine
    finally:
        m._ridge_rows = real
