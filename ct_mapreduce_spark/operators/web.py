"""Web/domain analytics over crawl frames (url-bearing documents).

Every large-scale crawl pipeline runs domain-level bookkeeping before
document-level curation: per-domain page/token counts (the table that
surfaces over-crawled template farms), and domain blocklist filtering
(the first, cheapest gate — drop a whole site before paying per-document
work). Both are pure codegen here:

- host extraction is Spark's built-in `parse_url(url, 'HOST')`;
- the registered domain is the last two dot-labels of the host — a
  deliberate public-suffix-list-free simplification (documented; a real
  PSL lookup would be a broadcast join against the published list and
  composes with these operators unchanged);
- `domain_stats` is ONE map-side-combined groupBy(domain) — the shuffle
  carries one row per domain, model-sized against any corpus;
- `filter_domains` stays a literal IN-filter for bounded blocklists and
  switches to a broadcast anti-join above `isin_cap` — the corpus side
  never shuffles either way.

No reference analog (jcjones/ct-mapreduce has no crawl concept); extends
the LLM-pipeline suite alongside text.py's HTML extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators.text import tokens


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


def domain_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-domain crawl rollup: pages, distinct URLs, token and char
    totals. One groupBy(domain) whose map-side combine collapses each
    task's pages locally — the exchange carries one row per domain."""
    dom = registered_domain(url_host(F.col(url_col)))
    return (
        df.select(
            dom.alias("domain"),
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

    dom = registered_domain(url_host(F.col(url_col)))
    q = quality_expr(text_col)
    staged = df.select(
        dom.alias("domain"),
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
    dom = registered_domain(url_host(F.col(url_col)))
    if len(blocked) <= isin_cap:
        return df.where(~dom.isin(list(blocked)))
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(d,) for d in blocked], "domain string"
    )
    return (
        df.withColumn("_dom", dom)
        .join(
            F.broadcast(bl),
            F.col("_dom") == F.col("domain"),
            "left_anti",
        )
        .drop("_dom")
    )
