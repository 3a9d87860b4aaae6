"""Web/domain analytics over crawl frames (url-bearing documents).

Every large-scale crawl pipeline runs domain-level bookkeeping before
document-level curation: per-domain page/token counts (the table that
surfaces over-crawled template farms), and domain blocklist filtering
(the first, cheapest gate — drop a whole site before paying per-document
work). Both are pure codegen here:

- host extraction is Spark's built-in `parse_url(url, 'HOST')`;
- the registered domain uses the vendored PUBLIC SUFFIX LIST
  (ct_mapreduce_spark/data/public_suffix_list.dat, the publicsuffix.org
  data file — r10, replacing the last-two-labels simplification that
  mis-grouped `foo.co.uk` and `bar.co.uk` into one `co.uk` row): the
  lookup is a handful of TINY broadcast hash joins (one per
  rule-kind x label-count bucket present in the list), so the corpus
  side stays narrow — no shuffle, no Python, O(1) hash probes per row;
- `registered_domain` (the columnar last-two-labels rule) remains the
  documented no-data fallback when the list file is absent;
- `domain_stats` is ONE map-side-combined groupBy(domain) — the shuffle
  carries one row per domain, model-sized against any corpus;
- `filter_domains` stays a literal IN-filter for bounded blocklists and
  switches to a broadcast anti-join above `isin_cap` — the corpus side
  never shuffles either way.

No reference analog (jcjones/ct-mapreduce has no crawl concept); extends
the LLM-pipeline suite alongside text.py's HTML extraction.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.text import tokens
from ct_mapreduce_spark.operators.util import local_frame

_PSL_FILE = str(
    Path(__file__).resolve().parents[1] / "data" / "public_suffix_list.dat"
)


@lru_cache(maxsize=1)
def _psl_tables():
    """Parse the vendored public suffix list into per-label-count rule
    sets: (normal[k], wildcard[k], exception[k]) where k is the rule's
    label count ('*' counts as one label). 1-label normal rules are
    dropped — they are semantically identical to the spec's implicit
    default rule '*' (public suffix = 1 label), which is the lookup's
    fallback. Returns None when the data file is absent (callers then
    use the columnar last-two-labels fallback)."""
    try:
        text = Path(_PSL_FILE).read_text(encoding="utf-8")
    except OSError:
        return None
    normal: dict[int, set] = {}
    wildcard: dict[int, set] = {}
    exception: dict[int, set] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rule = line.split()[0].lower()
        if rule.startswith("!"):
            body = rule[1:]
            exception.setdefault(body.count(".") + 1, set()).add(body)
        elif rule.startswith("*."):
            wildcard.setdefault(rule.count(".") + 1, set()).add(rule)
        else:
            k = rule.count(".") + 1
            if k >= 2:
                normal.setdefault(k, set()).add(rule)
    return (
        {k: frozenset(v) for k, v in normal.items()},
        {k: frozenset(v) for k, v in wildcard.items()},
        {k: frozenset(v) for k, v in exception.items()},
    )


def registered_domain_py(host: str | None) -> str:
    """Driver-side pure-Python reference of the PSL algorithm
    (https://publicsuffix.org/list/ semantics: exception rule prevails,
    else the matching rule with the most labels, else the implicit '*').
    Used by tests and as the spec the Spark-side lookup
    (add_registered_domain) must match; tools/independent_oracle.py
    carries its own inline copy so pins stay engine-independent."""
    tables = _psl_tables()
    host = (host or "").strip().lower().rstrip(".")
    if not host:
        return ""
    labels = host.split(".")
    n = len(labels)
    if tables is None:
        return ".".join(labels[-2:]) if n >= 2 else ""
    normal, wildcard, exception = tables
    ps = 0
    for k in sorted(exception, reverse=True):
        if n >= k and ".".join(labels[-k:]) in exception[k]:
            ps = k - 1
            break
    if ps == 0:
        ps = 1  # the implicit default rule '*'
        for k in sorted(set(normal) | set(wildcard), reverse=True):
            if k <= ps:
                break
            if n < k:
                continue
            if ".".join(labels[-k:]) in normal.get(k, ()):
                ps = k
                break
            if "*." + ".".join(labels[-(k - 1):]) in wildcard.get(k, ()):
                ps = k
                break
    return ".".join(labels[-(ps + 1):]) if n > ps else ""


def url_host(url: Column | str) -> Column:
    """Hostname of a URL (built-in try_parse_url — codegen; null for
    unparseable input rather than an ANSI-mode task failure, which is
    the only viable contract on real crawl data)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(c, F.lit("HOST"))


def registered_domain(host: Column | str) -> Column:
    """Last two dot-labels of a hostname ('api.news.example' ->
    'news.example'). Simplified registrable-domain rule without the
    public-suffix list; '' for hosts with fewer than two labels. The
    host is LOWERCASED first (hostnames are case-insensitive, RFC
    4343): 'Spam.EXAMPLE' and 'spam.example' must hit the same
    blocklist entry and roll up to one domain_stats row."""
    c = F.col(host) if isinstance(host, str) else host
    return F.regexp_extract(
        F.lower(F.coalesce(c, F.lit(""))),
        r"([a-z0-9-]+\.[a-z0-9-]+)$",
        1,
    )


def add_registered_domain(
    df: DataFrame, host: Column, out_col: str = "domain"
) -> DataFrame:
    """Append the PSL-backed registered domain of `host` as `out_col`.

    Spec semantics (https://publicsuffix.org/list/): the prevailing rule
    is the exception rule if one matches, else the matching rule with the
    most labels, else the implicit default '*' (public suffix = 1
    label); registered domain = public suffix + one label, '' when the
    host IS a public suffix (or empty). Behavior-identical to
    registered_domain_py (pytest-asserted on the official test vectors).

    Plan shape — built for the 100 TB scan: the host's last-k-label
    candidates (k = 2..5, plus the '*.'-prefixed wildcard forms) are
    narrow projections, each looked up via ONE tiny broadcast hash join
    per rule bucket (~10 joins, the largest 5.5k rows); the stream side
    never shuffles, never enters Python, and pays O(1) hash probes per
    row. The public-suffix length then resolves in a single coalesce
    (exceptions first, then longest-k), and the domain is one
    slice/array_join projection. Falls back to the columnar
    last-two-labels rule when the vendored data file is absent."""
    tables = _psl_tables()
    if tables is None:
        return df.withColumn(out_col, registered_domain(host))
    normal, wildcard, exception = tables
    spark = df.sparkSession
    # normalize exactly like registered_domain_py: trim, lowercase, and
    # drop trailing dots (the FQDN root form 'example.com.' — parse_url
    # preserves it, and 'com.' would miss every rule bucket otherwise)
    h = F.regexp_replace(
        F.lower(F.trim(F.coalesce(host, F.lit("")))), r"\.+$", ""
    )
    out = df.withColumn("_rd_labels", F.split(h, r"\.")).withColumn(
        "_rd_n", F.size(F.col("_rd_labels"))
    )
    labels, nlab = F.col("_rd_labels"), F.col("_rd_n")

    def _cand(k: int) -> Column:
        return F.when(
            nlab >= k, F.array_join(F.slice(labels, -k, k), ".")
        )

    helper_cols = ["_rd_labels", "_rd_n"]
    plain_ks = sorted(set(normal) | set(exception), reverse=True)
    for k in plain_ks:
        rows = [(s, k, False) for s in normal.get(k, ())] + [
            (s, k - 1, True) for s in exception.get(k, ())
        ]
        tbl = local_frame(
            spark, rows, f"_rd_key{k} string, _rd_ps{k} int, _rd_exc{k} boolean"
        )
        out = out.withColumn(f"_rd_cand{k}", _cand(k)).join(
            F.broadcast(tbl),
            F.col(f"_rd_cand{k}") == F.col(f"_rd_key{k}"),
            "left",
        )
        helper_cols += [
            f"_rd_cand{k}", f"_rd_key{k}", f"_rd_ps{k}", f"_rd_exc{k}"
        ]
    wild_ks = sorted(wildcard, reverse=True)
    for k in wild_ks:
        tbl = local_frame(
            spark,
            [(s, k) for s in wildcard[k]],
            f"_rd_wkey{k} string, _rd_wps{k} int",
        )
        wcand = F.when(
            nlab >= k,
            F.concat(
                F.lit("*."), F.array_join(F.slice(labels, -(k - 1), k - 1), ".")
            ),
        )
        out = out.withColumn(f"_rd_wcand{k}", wcand).join(
            F.broadcast(tbl),
            F.col(f"_rd_wcand{k}") == F.col(f"_rd_wkey{k}"),
            "left",
        )
        helper_cols += [f"_rd_wcand{k}", f"_rd_wkey{k}", f"_rd_wps{k}"]
    arms = [
        F.when(F.col(f"_rd_exc{k}"), F.col(f"_rd_ps{k}")) for k in plain_ks
    ]
    for k in sorted(set(plain_ks) | set(wild_ks), reverse=True):
        if k in set(plain_ks):
            arms.append(
                F.when(~F.col(f"_rd_exc{k}"), F.col(f"_rd_ps{k}"))
            )
        if k in set(wild_ks):
            arms.append(F.col(f"_rd_wps{k}"))
    ps = F.coalesce(*arms, F.lit(1))
    dom = F.when(
        (h != "") & (nlab > ps),
        F.array_join(F.slice(labels, -(ps + F.lit(1)), ps + F.lit(1)), "."),
    ).otherwise(F.lit(""))
    return out.withColumn(out_col, dom).drop(*helper_cols)


def domain_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-domain crawl rollup: pages, distinct URLs, token and char
    totals. One groupBy(domain) whose map-side combine collapses each
    task's pages locally — the exchange carries one row per domain."""
    return (
        add_registered_domain(df, url_host(F.col(url_col)), "_rd_out")
        .select(
            F.col("_rd_out").alias("domain"),
            F.col(url_col).alias("_url"),
            F.size(F.array_remove(tokens(text_col), "")).cast("long").alias(
                "_ntok"
            ),
            F.length(text_col).cast("long").alias("_nchar"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.count_distinct("_url").cast("long").alias("n_urls"),
            F.sum("_ntok").cast("long").alias("n_tokens"),
            F.sum("_nchar").cast("long").alias("n_chars"),
        )
    )


def domain_quality(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    low_cut: float = 0.4,
    mean_min: float = 0.5,
    lowq_max: float = 0.5,
) -> DataFrame:
    """Domain-level quality triage (the RefinedWeb move: decide per
    SITE before spending per-document work): per registered domain, the
    mean composite quality score, the fraction of pages below `low_cut`,
    and the keep verdict (mean >= `mean_min` AND low-quality fraction
    <= `lowq_max`). The output feeds filter_domains as a learned
    blocklist — domain_stats tells you who is over-crawled, this table
    tells you who is worth crawling at all.

    Determinism: each page's quality is already rounded to 6 decimals
    (text.py:quality_expr), so summing it as DECIMAL(16,6) is EXACT and
    partial-aggregation order cannot change the mean (the repo's
    decimal-staged-sum discipline); the mean divides once as a fixed
    double tree and rounds at the edge. One map-side-combined
    groupBy(domain) — the exchange carries one row per domain."""
    from ct_mapreduce_spark.operators.text import quality_expr

    q = quality_expr(text_col)
    staged = add_registered_domain(
        df, url_host(F.col(url_col)), "_rd_out"
    ).select(
        F.col("_rd_out").alias("domain"),
        q.cast("decimal(16,6)").alias("_q"),
        (q < float(low_cut)).cast("int").alias("_lowq"),
    )
    per = staged.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum("_q").alias("_sq"),
        F.sum("_lowq").cast("long").alias("n_lowq"),
    )
    mean_q = F.round(
        F.col("_sq").cast("double") / F.col("n_pages"), 6
    )
    lowq_frac = F.round(
        F.col("n_lowq").cast("double") / F.col("n_pages"), 6
    )
    return per.select(
        "domain",
        "n_pages",
        mean_q.alias("mean_quality"),
        "n_lowq",
        lowq_frac.alias("lowq_frac"),
        (
            (mean_q >= float(mean_min)) & (lowq_frac <= float(lowq_max))
        ).alias("keep"),
    )


def canonical_url(url: Column | str) -> Column:
    """Declared URL canonicalization for recrawl dedup: strip the
    fragment, then a trailing slash (unless the path IS the slash).
    Deliberately minimal — scheme/host case and query-param reordering
    are left alone (both regexes sit in the Java-regex ∩ RE2 subset so
    the DuckDB oracle replays them; the trailing-slash rule uses a
    capture group, not lookbehind, because RE2 has no lookbehind)."""
    c = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(c, r"#.*$", "")
    # strip a trailing slash only when a path SEGMENT precedes it: the
    # pattern anchors on '://host/' plus at least one non-slash path
    # char, so the root form 'scheme://host/' keeps its slash (a naive
    # ([^/])/$ would match the HOST's last letter and strip the root).
    return F.regexp_replace(no_frag, r"(://[^/]+/.*[^/])/$", r"$1")


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Recrawl dedup: one row per canonical URL, keeping the NEWEST
    capture (ties break to the lowest id — deterministic). The crawl
    counterpart of exact_dedup_by_priority: a page fetched on every
    crawl pass must contribute one document, and the freshest copy is
    the one worth training on.

    One map-side-combined groupBy(canonical url) carrying a single
    max(struct) — never a window over the capture stream, so the
    shuffle holds one row per URL per task regardless of recrawl
    depth. Returns (canon_url, kept_doc_id, n_captures, latest_ts)."""
    key = canonical_url(F.col(url_col))
    best = F.max(
        F.struct(
            F.col(ts_col).alias("ts"), (-F.col(id_col)).alias("negid")
        )
    )
    return (
        df.select(
            key.alias("canon_url"), F.col(ts_col), F.col(id_col)
        )
        .groupBy("canon_url")
        .agg(
            (-best["negid"]).cast("long").alias("kept_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_captures"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "latest_ts"
            ),
        )
    )


def filter_domains(
    df: DataFrame,
    blocked: list[str],
    url_col: str = "url",
    isin_cap: int = 64,
) -> DataFrame:
    """Drop rows whose registered domain is on the blocklist. Small
    lists stay a literal NOT IN (codegen, no join at all); above
    `isin_cap` the list becomes a broadcast anti-join so a
    million-domain blocklist never expands into a million-branch
    expression — the corpus side streams once in both forms."""
    with_dom = add_registered_domain(
        df, url_host(F.col(url_col)), "_dom"
    )
    if len(blocked) <= isin_cap:
        return with_dom.where(
            ~F.col("_dom").isin(list(blocked))
        ).drop("_dom")
    spark = df.sparkSession
    bl = local_frame(
        spark, [(d,) for d in blocked], "domain string"
    )
    return (
        with_dom.join(
            F.broadcast(bl),
            F.col("_dom") == F.col("domain"),
            "left_anti",
        )
        .drop("_dom")
    )
