"""Degenerate-input behavior: empty frames, null/empty/short text.
These encode the documented contracts so regressions surface as test
failures instead of production crashes at 3am."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators import dedup_fuzzy, text
from ct_mapreduce_spark.plans.ingest import ingest_batch
from ct_mapreduce_spark.operators.statistics import stats_rollup
from ct_mapreduce_spark.schemas import CERTIFICATES

NOW = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)


def _empty_certs(spark):
    return spark.createDataFrame([], schema=CERTIFICATES)


def test_ingest_empty_frame(spark):
    out = ingest_batch(_empty_certs(spark), now=NOW)
    assert out.count() == 0
    assert "exp_date" in out.columns  # derivations still present


def test_rollup_empty_input_has_no_grand_total(spark):
    """Documented Spark semantics (and a known cross-engine divergence:
    DuckDB emits a NULL grand-total row over empty input, Spark emits
    none) — oracle queries must not roll up over possibly-empty
    filters. Encoded here so the contract is visible."""
    prepared = ingest_batch(_empty_certs(spark), now=NOW)
    assert stats_rollup(prepared).count() == 0


def _weird_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=None),
            Row(doc_id=2, text=""),
            Row(doc_id=3, text="   "),
            Row(doc_id=4, text="one two"),  # shorter than shingle k=3
            Row(doc_id=5, text="the quick brown fox jumps over the lazy dog"),
        ],
        schema="doc_id long, text string",
    )


def test_text_ops_survive_null_and_short_text(spark):
    docs = _weird_docs(spark)
    stats = {r.doc_id: r for r in text.text_stats(docs).collect()}
    assert set(stats) == {1, 2, 3, 4, 5}
    assert stats[5].n_tokens == 9
    quality = {r.doc_id: r.quality for r in text.quality_score(docs).collect()}
    assert quality[5] is not None and 0.0 <= quality[5] <= 1.0
    langs = {r.doc_id: r.pred_lang for r in text.lang_id(docs).collect()}
    assert langs[5] == "en"
    assert langs[4] == "und"  # no stopword hits
    fps = {r.doc_id: r for r in text.fingerprint(docs).collect()}
    assert fps[4].n_shingles == 0 and fps[4].fp_min is None
    assert fps[5].n_shingles > 0


def test_minhash_short_docs_zero_signature_no_pairs(spark):
    docs = _weird_docs(spark)
    sigs = {
        r.doc_id: r.minhash
        for r in dedup_fuzzy.minhash_signatures(docs).collect()
    }
    # sub-k docs get the documented all-zero signature
    assert sigs[4] == [0] * 64
    # null/empty/short docs band identically but produce no *similar*
    # content; the zero-signature family buckets them together — callers
    # filter sub-k docs, which exact pairs here confirm is safe:
    pairs = dedup_fuzzy.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    assert all({p.doc_a, p.doc_b} <= {1, 2, 3, 4, 5} for p in pairs)


def test_pii_redaction_detects_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail me at jane.doe+x@example.co.uk or bob@test.org"),
            Row(doc_id=2, text="server at 192.168.1.250 and 10.0.0.1 up"),
            Row(doc_id=3, text="call +44 7911 123456 today"),
            Row(doc_id=4, text="clean text with no identifiers at all"),
        ],
        schema="doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.redact_pii(docs).collect()}
    assert out[1].n_email == 2 and out[1].n_ipv4 == 0
    assert out[2].n_ipv4 == 2
    assert out[3].n_phoneish == 1
    assert out[4].n_email == out[4].n_ipv4 == out[4].n_phoneish == 0
    # redaction changed the text where PII was found, and only there
    import hashlib

    assert out[4].redacted_md5 == hashlib.md5(
        b"clean text with no identifiers at all"
    ).hexdigest()
    assert out[1].redacted_md5 != hashlib.md5(
        b"mail me at jane.doe+x@example.co.uk or bob@test.org"
    ).hexdigest()


def test_pii_redaction_null_text_counts_zero(spark):
    """F.size is -1 on NULL input: without the coalesce guard a
    null-text row reports -1 per pattern (redact_pii) and -3 total
    (redact_pii_text), skewing curate's pii_redactions stat negative."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="ping 10.0.0.1 now")],
        schema="doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.redact_pii(docs).collect()}
    assert out[1].n_email == out[1].n_ipv4 == out[1].n_phoneish == 0
    assert out[1].redacted_md5 is None  # null text stays null
    assert out[2].n_ipv4 == 1

    out2 = {r.doc_id: r for r in text.redact_pii_text(docs).collect()}
    assert out2[1].n_pii == 0 and out2[1].text is None
    assert out2[2].n_pii == 1 and "<IPV4>" in out2[2].text


def test_exact_dedup_null_text_groups_together(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text=None), Row(doc_id=3, text="x")],
        schema="doc_id long, text string",
    )
    out = {
        r.canonical_doc_id: r.n_copies
        for r in dedup_fuzzy.exact_dedup(docs).collect()
    }
    # md5(NULL) is NULL => null-text docs form one group, canonical = min id
    assert out == {1: 2, 3: 1}


def test_quality_checks_catch_bad_data(spark):
    """The DQ checks must FAIL on violations, not just pass on clean
    fixtures: duplicate keys, orphaned foreign keys, nulls, and
    out-of-range values each trip their check."""
    from ct_mapreduce_spark.operators import checks as C

    fact = spark.createDataFrame(
        [Row(id=1, fk=10, v=0.5), Row(id=1, fk=99, v=1.5), Row(id=2, fk=None, v=0.2)],
        schema="id long, fk long, v double",
    )
    dim = spark.createDataFrame([Row(k=10)], schema="k long")
    report = {
        r.check: (r.metric, r.passed)
        for r in C.run_suite(
            [
                C.check_unique(fact, ["id"], "pk"),
                C.check_no_orphans(fact, "fk", dim, "k", "fk_ok"),
                C.check_null_ratio(fact, "fk", 0.0, "fk_nulls"),
                C.check_range(fact, "v", 0.0, 1.0, "v_range"),
            ]
        ).collect()
    }
    assert report["pk"] == (1.0, False)        # one duplicated id
    assert report["fk_ok"][1] is False          # fk=99 orphaned (null fk
    assert report["fk_ok"][0] >= 1.0            # doesn't match either)
    assert report["fk_nulls"] == (0.333333, False)
    assert report["v_range"] == (1.0, False)    # v=1.5 out of range


def test_dedup_clusters_no_pairs_identity(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(5)])
    pairs = spark.createDataFrame([], schema="doc_a long, doc_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup_fuzzy.dedup_clusters(docs, pairs).collect()
    }
    assert got == {i: i for i in range(5)}
