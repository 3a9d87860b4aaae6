"""Text-analysis operators for training-data pipelines (north-star surface).

All hot-path logic is built-in Spark expressions (JVM, codegen) — no Python
UDFs: at 100 TB a per-row Python hop on `documents.text` dominates runtime.

Operators: token counting, quality scoring, language ID (stopword n-gram
heuristic), document fingerprinting (shingle rolling-hash family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.util import fan_out

# Tiny per-language stopword lists for the heuristic language classifier.
# Deliberately short and fixed: the classifier is a deterministic scoring
# function, not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization: the baseline token counter."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization: word pieces, numbers, punctuation runs —
    the GPT-2 pre-tokenizer shape without the learned merges."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+)"), 1)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality/shape statistics, one pass, all codegen."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    # greatest(..., 1) guards: empty text has length 0 and ANSI mode makes
    # 0-divisors a hard error, not a NULL. Values are unchanged for any
    # non-degenerate document.
    len_safe = F.greatest(F.length(t), F.lit(1))
    n_tok_safe = F.greatest(n_tok, F.lit(1))
    return fan_out(docs).select(
        "doc_id",
        F.length(t).alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        F.size(bpe_ish_tokens(text_col)).alias("n_bpe_tokens"),
        (F.length(t).cast("double") / n_tok_safe).alias("chars_per_token"),
        (
            F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
            / len_safe
        ).alias("punct_ratio"),
        (
            F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("double") / len_safe
        ).alias("upper_ratio"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok_safe).alias(
            "distinct_ratio"
        ),
    )


def lang_scores(text_col: str = "text") -> list[Column]:
    """Stopword-hit count per language as `<lang>_score` columns."""
    toks = tokens(text_col)
    cols = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        cols.append(
            F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).alias(
                f"{lang}_score"
            )
        )
    return cols


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword-hit counts, alphabetical
    tiebreak, 'und' (undetermined) when all scores are zero."""
    scored = fan_out(docs).select("doc_id", *lang_scores(text_col))
    langs = sorted(STOPWORDS)  # alphabetical tiebreak order
    best = F.greatest(*[F.col(f"{l}_score") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when(F.col(f"{l}_score") == best, F.lit(l)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return scored.select(
        "doc_id", *[f"{l}_score" for l in langs], pred.alias("pred_lang")
    )


def _quality_parts(text_col: str = "text") -> tuple[Column, Column]:
    """(stopword_ratio, quality) as plain expressions over `text_col` —
    the formula quality_score documents, reusable as an inline column so
    pipeline callers (plans/curate.py) can gate on quality WITHOUT a
    self-join back to the scored frame."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    all_sw = sorted({w for ws in STOPWORDS.values() for w in ws})
    sw_arr = F.array(*[F.lit(w) for w in all_sw])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw_arr, x)))
    stop_ratio = n_stop.cast("double") / n_tok
    punct_ratio = (
        F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
        / F.greatest(F.length(t), F.lit(1))
    )
    s_len = F.least(F.lit(1.0), F.size(toks).cast("double") / F.lit(50.0))
    s_stop = F.least(F.lit(1.0), stop_ratio * F.lit(4.0))
    s_rep = F.size(F.array_distinct(toks)).cast("double") / n_tok
    s_punct = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(10.0))
    quality = F.round((s_len + s_stop + s_rep + s_punct) / F.lit(4.0), 6)
    return F.round(stop_ratio, 6), quality


def quality_expr(text_col: str = "text") -> Column:
    """The composite quality score as a single Column (see quality_score
    for the formula)."""
    return _quality_parts(text_col)[1]


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite document-quality score in [0, 1] — the heuristic-filter
    stage of a training-data pipeline (length, stopword density,
    repetition, punctuation noise), all codegen, no Python.

    Fixed formula (every term double, fixed op order, so the score is
    bit-identical across engines):
      s_len   = min(1, n_tokens / 50)            -- too-short penalty
      s_stop  = min(1, stopword_ratio * 4)       -- natural-language signal
      s_rep   = distinct_tokens / n_tokens       -- repetition penalty
      s_punct = 1 - min(1, punct_ratio * 10)     -- symbol-noise penalty
      score   = round((s_len + s_stop + s_rep + s_punct) / 4, 6)
    """
    stop_ratio, quality = _quality_parts(text_col)
    return fan_out(docs).select(
        "doc_id",
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def adaptive_quality_filter(
    docs: DataFrame,
    stratum_col: str = "lang",
    keep_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """Corpus-relative quality gate: keep each stratum's top `keep_frac`
    of documents by composite quality score — the per-language adaptive
    threshold a multilingual pipeline needs (a fixed global cut like
    curate's `quality_min` systematically over-prunes languages whose
    stopword table is thinner; a per-stratum quantile self-calibrates).

    Two tiers, the lm_terciles discipline: default approx_percentile (a
    bounded-memory mergeable sketch — the only viable per-group quantile
    at 100 TB), `exact=True` for the interpolated exact percentile that
    bit-matches DuckDB's quantile_cont (the registry oracle). Either
    way the cuts table is STRATA-sized (one row per language), broadcast
    back over the scored frame — no window, no global sort; the scored
    frame is localCheckpointed because the cuts aggregate and the filter
    both read it. A corpus-relative gate is inherently a batch decision:
    on the streaming path use a threshold learned here and serve it via
    lm-style fixed cuts.

    Returns (id, stratum, quality, cut) for kept rows."""
    scored = (
        fan_out(docs)
        .select(
            id_col,
            stratum_col,
            quality_expr(text_col).alias("quality"),
        )
        .localCheckpoint()
    )
    p = F.lit(1.0 - float(keep_frac))
    if exact:
        cut = F.percentile(F.col("quality"), p)
    else:
        cut = F.percentile_approx(F.col("quality"), p, F.lit(10000))
    cuts = scored.groupBy(stratum_col).agg(cut.alias("cut"))
    return (
        scored.join(F.broadcast(cuts), stratum_col)
        .where(F.col("quality") >= F.col("cut"))
        .select(
            id_col,
            stratum_col,
            "quality",
            F.round("cut", 6).alias("cut"),
        )
    )


# PII patterns kept deliberately in the common subset of Java regex and
# RE2 (no lookarounds, no backrefs) so Spark and the DuckDB oracle match
# byte-for-byte.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phoneish": r"\+[0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{4,7}",
}


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub — the privacy-filter stage of a corpus pipeline: count
    and redact emails / IPv4s / international-phone shapes. Pure
    regexp_replace / regexp count battery (codegen; no Python), patterns
    restricted to the Java-regex ∩ RE2 subset so behavior is
    engine-identical. Returns counts plus an md5 of the redacted text
    (cheap equality witness without shipping the full column around)."""
    t = F.col(text_col)
    red = t
    counts = []
    for name, pat in PII_PATTERNS.items():
        # coalesce: F.size returns -1 on NULL input, so a null-text row
        # would report -1 per pattern instead of 0 matches.
        counts.append(
            F.coalesce(
                F.size(F.regexp_extract_all(t, F.lit(f"({pat})"), 1)),
                F.lit(0),
            ).alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return fan_out(docs).select(
        "doc_id",
        *counts,
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"),
    )


def redact_pii_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """redact_pii's in-place form for pipeline composition (the
    `pii_redact` stage of plans/curate.py): same pattern battery and
    replacement order, but returns the INPUT row shape with `text_col`
    replaced by the redacted text plus one `n_pii` total-matches column
    — the form an export stage consumes directly. Counts are taken on
    the original text per pattern, exactly as redact_pii counts them, so
    the two forms always agree on n_pii = sum of the per-pattern
    counts. Pure codegen (regexp battery), narrow — no shuffle."""
    t = F.col(text_col)
    red = t
    n = F.lit(0)
    for name, pat in PII_PATTERNS.items():
        # coalesce: F.size is -1 on NULL text — without it a null row
        # contributes -3 to n_pii and curate's pii_redactions stat can
        # go negative.
        n = n + F.coalesce(
            F.size(F.regexp_extract_all(t, F.lit(f"({pat})"), 1)), F.lit(0)
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    others = [c for c in docs.columns if c != text_col]
    return docs.select(
        *others, red.alias(text_col), n.cast("long").alias("n_pii")
    )


# The eight "required stop words" of the published Gopher quality rules
# (Rae et al. 2021, §A1.1.2) — a document passes the stopword rule when it
# contains at least two of them.
GOPHER_REQUIRED_STOPWORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",
]


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Published-heuristic quality filter: the Gopher rules (Rae et al.
    2021, "Scaling Language Models", table A1 — the same battery Dolma
    and DataTrove ship), restated as pure codegen expressions so a
    100 TB corpus is filtered without a single Python hop:

      words_ok     50 <= n_words <= 100000
      mean_len_ok  3 <= mean word length <= 10
      symbol_ok    (#'#' + #'...') / n_words <= 0.1
      bullet_ok    < 90% of lines start with a bullet (- * •)
      ellipsis_ok  < 30% of lines end with an ellipsis (... or …)
      alpha_ok     > 80% of words contain an alphabetic character
      stop_ok      >= 2 of the eight required stop words present

    Determinism contract (repo-wide): every ratio is one BIGINT/BIGINT
    division in DOUBLE rounded to 6 places, so the DuckDB oracle
    reproduces each metric bit-for-bit. Mean word length is derived as
    len(text minus whitespace) / n_words — no per-token fold needed.
    Empty documents (0 words) fail words_ok and report 0.0 metrics."""
    t = F.col(text_col)
    toks = F.array_remove(tokens(text_col), "")
    n_words = F.size(toks).cast("long")
    nw1 = F.greatest(n_words, F.lit(1))
    # sum(len(word)) == length of the text with all whitespace removed
    n_word_chars = F.length(F.regexp_replace(t, r"\s+", "")).cast("long")
    mean_word_len = F.round(n_word_chars.cast("double") / nw1, 6)
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast(
        "long"
    )
    n_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
    ).cast("long")
    symbol_ratio = F.round((n_hash + n_ell).cast("double") / nw1, 6)
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    ).cast("long")
    alpha_frac = F.round(n_alpha.cast("double") / nw1, 6)
    toks_l = F.transform(toks, lambda x: F.lower(x))
    n_stop = sum(
        F.array_contains(toks_l, w).cast("int")
        for w in GOPHER_REQUIRED_STOPWORDS
    ).cast("long")
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
    ).cast("long")
    n_ell_line = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    ).cast("long")
    bullet_frac = F.round(n_bullet.cast("double") / n_lines, 6)
    ellipsis_frac = F.round(n_ell_line.cast("double") / n_lines, 6)
    words_ok = (n_words >= 50) & (n_words <= 100000)
    mean_len_ok = (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
    symbol_ok = symbol_ratio <= 0.1
    bullet_ok = bullet_frac < 0.9
    ellipsis_ok = ellipsis_frac < 0.3
    alpha_ok = alpha_frac > 0.8
    stop_ok = n_stop >= 2
    return fan_out(docs).select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_req_stopwords"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        words_ok.alias("words_ok"),
        mean_len_ok.alias("mean_len_ok"),
        symbol_ok.alias("symbol_ok"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (
            words_ok & mean_len_ok & symbol_ok & bullet_ok & ellipsis_ok
            & alpha_ok & stop_ok
        ).alias("gopher_pass"),
    )


def strip_http_headers(body: Column | str) -> Column:
    """Drop the HTTP response header block a raw WARC `response` body
    carries (everything through the first blank CRLF line); bodies
    without one pass through unchanged. Pure expression."""
    b = F.col(body) if isinstance(body, str) else body
    sep = F.instr(b, "\r\n\r\n")
    return F.when(sep > 0, F.substring(b, sep + 4, 2147483647)).otherwise(b)


# The HTML -> text rule battery, applied IN ORDER (order matters: script/
# style bodies must go before generic tag stripping, entities after —
# and &amp; decodes LAST among entities, the standard entity-decoding
# order: decoding it earlier double-decodes escaped references, turning
# source '&amp;lt;' (which renders as the literal text '&lt;') into '<').
# Patterns live in the Java-regex ∩ RE2 ∩ python-re subset and each
# replacement is a plain regexp_replace, so the DuckDB oracle and the
# pure-python pin re-derivations replay the identical sequence.
HTML_STRIP_RULES: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"\s+", " "),
]


def html_to_text(html: Column | str) -> Column:
    """Visible text of an HTML payload — the extraction step between a
    WARC response and the documents table. Deliberately a RULE BATTERY,
    not a DOM parser: at 100 TB the extractor must be codegen-side
    (zero Python in the hot path), deterministic across engines, and
    tolerant of the tag soup real crawls contain. Script/style/comment
    bodies die first, remaining tags become spaces, the five entities
    that matter decode, whitespace collapses. Trailing/leading space
    trimmed."""
    out = F.col(html) if isinstance(html, str) else html
    for pat, rep in HTML_STRIP_RULES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def gram_stream(text_col: str = "text", k: int = 3) -> Column:
    """All word k-grams in document order (NON-distinct: one element per
    token position — duplicate-passage analysis needs every occurrence).
    Empty array for docs shorter than k tokens.

    Built by zipping k shifted slices of the token array and joining each
    zipped struct — the per-element work is field access + concat, which
    the interpreted higher-order evaluator handles cheaply. The
    slice-inside-transform form (array_join(slice(toks, i+1, k))) computes
    the same grams but re-slices the token array per element: measured
    4.5x slower at sf0.1."""
    return gram_stream_from_tokens(tokens(text_col), k)


def gram_stream_from_tokens(toks: Column, k: int = 3) -> Column:
    """gram_stream over an ALREADY-SPLIT token array column — identical
    expression tree with `toks` in place of tokens(text). Callers that
    also need the token count can project the array once BELOW a
    generator and keep the count an O(1) size() above it; referencing
    tokens(text) alongside an explode instead lands the split in the
    post-Generate projection, re-tokenizing the document once per gram
    row (r15, measured 3x on the DSIR pipeline)."""
    n = F.size(toks) - (k - 1)
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, n) for i in range(k)])
    return F.when(
        F.size(toks) >= k,
        F.transform(
            zipped,
            lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(text_col: str = "text", k: int = 3) -> Column:
    """Distinct word k-gram shingles, as strings (set semantics — the
    similarity/dedup tiers work on shingle sets). Empty array for docs
    shorter than k tokens (gram_stream already guards). Output identical
    to the pre-refactor form: array_distinct over the positional stream."""
    return F.array_distinct(gram_stream(text_col, k))


def fingerprint(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Document fingerprint: min-hash over shingle md5s (rolling-hash
    family / winnowing-lite). Two docs sharing their minimal shingle hash
    collide — a cheap similarity blocking key."""
    sh = shingles(text_col, k)
    hashes = F.transform(sh, lambda s: F.md5(s))
    return fan_out(docs).select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.size(sh).alias("n_shingles"),
    )
