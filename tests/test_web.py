"""Domain analytics (operators/web.py): host/domain extraction edges,
the rollup, and both blocklist-filter forms."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ct_mapreduce_spark.operators import web


def test_url_host_and_registered_domain(spark):
    cases = [
        ("https://api.news.example/p/1", "api.news.example", "news.example"),
        ("https://news.example/p/2", "news.example", "news.example"),
        ("http://localhost/x", "localhost", ""),
        ("https://a.b.c.d.example.org/", "a.b.c.d.example.org", "example.org"),
        ("not a url", None, ""),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: (r.h, r.d)
        for r in df.select(
            "i",
            web.url_host("url").alias("h"),
            web.registered_domain(web.url_host("url")).alias("d"),
        ).collect()
    }
    for i, (_, want_h, want_d) in enumerate(cases):
        assert got[i] == (want_h, want_d), (i, got[i])


def test_domain_stats_rollup(spark):
    df = spark.createDataFrame(
        [
            Row(url="https://www.a.example/1", text="one two three"),
            Row(url="https://m.a.example/2", text="four five"),
            Row(url="https://www.b.example/1", text="six"),
        ]
    )
    got = {r.domain: r for r in web.domain_stats(df).collect()}
    assert got["a.example"].n_pages == 2
    assert got["a.example"].n_urls == 2
    assert got["a.example"].n_tokens == 5
    assert got["b.example"].n_pages == 1 and got["b.example"].n_tokens == 1


def test_filter_domains_small_and_large_forms(spark):
    rows = [
        Row(doc_id=i, url=f"https://www.d{i % 5}.example/p/{i}", text="t")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    blocked = ["d0.example", "d3.example"]
    small = web.filter_domains(df, blocked)  # literal NOT IN path
    assert small.count() == 30
    assert {r.doc_id % 5 for r in small.collect()} == {1, 2, 4}
    # force the anti-join path with a cap below the list size; results
    # must be identical
    large = web.filter_domains(df, blocked, isin_cap=1)
    assert sorted(r.doc_id for r in large.collect()) == sorted(
        r.doc_id for r in small.collect()
    )
    assert large.columns == df.columns  # helper column dropped
    # plan shape: anti-join path broadcasts the blocklist
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_domain_stats_is_pure_codegen(spark):
    df = spark.createDataFrame(
        [Row(url="https://www.a.example/1", text="x y")]
    )
    plan = (
        web.domain_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_curate_domain_blocklist(spark, tmp_path):
    """curate_crawl with a domain blocklist: blocked sites drop right
    after extraction (cheapest gate first), with the count matching the
    fixture's record arithmetic."""
    from ct_mapreduce_spark.plans.curate import curate_crawl
    from ct_mapreduce_spark.sources import text_source

    crawl = str(tmp_path / "c")
    text_source.synthetic_warc_multidomain_fixture(crawl, n=60)
    blocked = {"news.example", "shop.github.io"}  # doms[0], doms[2]
    doms = ["news", "blog", "shop", "docs", "wiki"]
    sufs = ["example", "co.uk", "github.io", "com.au", "example"]
    want_extracted = sum(1 for i in range(60) if i % 4 != 0)
    want_kept = sum(
        1
        for i in range(60)
        if i % 4 != 0 and f"{doms[i % 5]}.{sufs[i % 5]}" not in blocked
    )
    stats = curate_crawl(
        spark,
        crawl,
        str(tmp_path / "wd"),
        domain_blocklist=sorted(blocked),
    )
    assert stats["extracted"] == want_extracted
    assert stats["after_blocklist"] == want_kept
    assert 0 < stats["after_blocklist"] < stats["extracted"]
    assert stats["quality_survivors"] <= stats["after_blocklist"]


def test_domain_quality_triage(spark):
    """A natural-text domain keeps; a junk domain (repetitive, symbol-
    noisy, stopword-free pages) drops on BOTH rules (low mean, high
    low-quality fraction); per-domain aggregates match hand counts."""
    good_page = (
        "the quick brown fox jumps over the lazy dog and runs to the "
        "river in the morning light while a bird is singing that song "
        "of dawn and the day begins to warm in a gentle way for all"
    )
    junk_page = "buy!! buy!! buy!! " * 10
    rows = [
        (f"https://good.example/p/{i}", good_page + f" page {i}")
        for i in range(4)
    ] + [(f"https://spam.example/p/{i}", junk_page) for i in range(4)]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r.domain: r for r in web.domain_quality(df).collect()}
    assert set(got) == {"good.example", "spam.example"}
    g, s = got["good.example"], got["spam.example"]
    assert g.n_pages == 4 and s.n_pages == 4
    assert g.keep and not s.keep
    assert g.mean_quality >= 0.5 and g.n_lowq == 0
    assert s.mean_quality < 0.5 and s.n_lowq == 4 and s.lowq_frac == 1.0


def test_domain_quality_is_one_exchange(spark):
    """The 100 TB contract: page scoring is inline codegen and the plan
    has exactly the one groupBy(domain) exchange — no join, no window,
    no Python."""
    df = spark.createDataFrame(
        [(f"https://d{i % 3}.example/p/{i}", f"some text {i}") for i in range(30)],
        "url string, text string",
    )
    plan = (
        web.domain_quality(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan
    # the PSL lookup adds BROADCAST hash joins only (r10) — the stream
    # side still shuffles exactly once, for the groupBy(domain)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert len(shuffles) <= 2, plan  # shuffle + AQE read marker


def test_url_dedup_newest_wins_and_canonicalization(spark):
    """Fragment and non-root-trailing-slash variants collapse to one
    canonical URL; the newest capture wins with ties to the lowest id;
    the root URL keeps its slash; and the plan is one aggregation with
    no window over the capture stream."""
    import datetime as dt

    rows = [
        (1, "https://a.example/page", dt.datetime(2024, 1, 1)),
        (2, "https://a.example/page#top", dt.datetime(2024, 1, 2)),
        (3, "https://a.example/page/", dt.datetime(2024, 1, 1, 12)),
        (4, "https://a.example/", dt.datetime(2024, 1, 1)),
        (5, "https://b.example/x?q=1", dt.datetime(2024, 1, 3)),
        (6, "https://b.example/x?q=1", dt.datetime(2024, 1, 3)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, fetch_ts timestamp"
    )
    out = web.url_dedup(df)
    got = {r.canon_url: r for r in out.collect()}
    assert set(got) == {
        "https://a.example/page",
        "https://a.example/",
        "https://b.example/x?q=1",
    }
    page = got["https://a.example/page"]
    assert page.kept_doc_id == 2 and page.n_captures == 3
    assert page.latest_ts == "2024-01-02 00:00:00"
    assert got["https://a.example/"].kept_doc_id == 4
    tie = got["https://b.example/x?q=1"]
    assert tie.kept_doc_id == 5 and tie.n_captures == 2  # tie -> lowest id
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan, plan


def test_registered_domain_case_insensitive(spark):
    """Hostnames are case-insensitive (RFC 4343): mixed-case URLs must
    hit the same blocklist entry and roll up to one domain row."""
    from ct_mapreduce_spark.operators.web import (
        filter_domains,
        registered_domain,
        url_host,
    )

    df = spark.createDataFrame(
        [
            (0, "https://Spam.EXAMPLE/x", "t"),
            (1, "https://spam.example/y", "t"),
            (2, "https://WWW.News.Example/z", "t"),
        ],
        "doc_id long, url string, text string",
    )
    doms = {
        r["d"]
        for r in df.select(
            registered_domain(url_host(F.col("url"))).alias("d")
        ).collect()
    }
    assert doms == {"spam.example", "news.example"}
    kept = filter_domains(df, ["spam.example"]).select("doc_id").collect()
    assert {r["doc_id"] for r in kept} == {2}


def test_psl_registered_domain_official_vectors():
    """registered_domain_py against the publicsuffix.org checkPublicSuffix
    test vectors (the published subset covering normal, wildcard, and
    exception rules) plus the r9-verdict day-one cases (co.uk, com.au,
    github.io)."""
    cases = [
        ("biz", ""), ("domain.biz", "domain.biz"),
        ("a.b.domain.biz", "domain.biz"),
        ("uk", ""), ("example.uk", "example.uk"),
        ("b.example.uk", "example.uk"),
        ("com", ""), ("example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("mm", ""), ("c.mm", ""), ("b.c.mm", "b.c.mm"),
        ("a.b.c.mm", "b.c.mm"),
        ("jp", ""), ("test.jp", "test.jp"), ("www.test.jp", "test.jp"),
        ("ac.jp", ""), ("test.ac.jp", "test.ac.jp"),
        ("www.test.ac.jp", "test.ac.jp"),
        ("kyoto.jp", ""), ("test.kyoto.jp", "test.kyoto.jp"),
        ("ide.kyoto.jp", ""), ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
        ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
        # exception rules: !www.ck beats *.ck
        ("www.ck", "www.ck"), ("foo.www.ck", "www.ck"),
        # the r9 verdict cases
        ("foo.co.uk", "foo.co.uk"), ("bar.co.uk", "bar.co.uk"),
        ("www.foo.co.uk", "foo.co.uk"),
        ("thing.com.au", "thing.com.au"), ("a.thing.com.au", "thing.com.au"),
        # private-section suffix
        ("user.github.io", "user.github.io"),
        ("a.user.github.io", "user.github.io"), ("github.io", ""),
        # case-insensitive; empty/None
        ("WwW.Foo.CO.UK", "foo.co.uk"), ("", ""), (None, ""),
    ]
    for host, want in cases:
        got = web.registered_domain_py(host)
        assert got == want, f"{host!r}: got {got!r} want {want!r}"


def test_psl_spark_lookup_matches_reference(spark):
    """The broadcast-join lookup (add_registered_domain) must agree with
    registered_domain_py on every official-vector host, and its plan
    must carry no shuffle and no Python — broadcast hash joins only."""
    hosts = [
        "www.foo.co.uk", "foo.co.uk", "co.uk", "bar.com.au",
        "a.bar.com.au", "user.github.io", "a.user.github.io", "github.io",
        "example.com", "www.example.com", "com", "x.y.kobe.jp",
        "city.kobe.jp", "b.city.kobe.jp", "www.ck", "foo.www.ck",
        "a.b.c.mm", "c.mm", "test.ac.jp", "a.b.ide.kyoto.jp",
        "news.example", "www.news.example", "", None,
        "s3.dualstack.ap-northeast-1.amazonaws.com",
        "b.s3.dualstack.ap-northeast-1.amazonaws.com",
        # FQDN-root / case / whitespace normalization parity with the
        # pure-Python reference (strip + lower + rstrip('.'))
        "www.example.com.", "foo.co.uk.", "WwW.Foo.CO.UK", " example.com ",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = web.add_registered_domain(df, F.col("host"), "d")
    got = {r["host"]: r["d"] for r in out.collect()}
    for h in hosts:
        assert got[h] == web.registered_domain_py(h), h
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert not [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ], plan


def test_psl_fallback_without_data_file(spark, monkeypatch):
    """With the data file absent the transform degrades to the columnar
    last-two-labels rule instead of failing — the documented no-data
    posture."""
    monkeypatch.setattr(web, "_psl_tables", lambda: None)
    df = spark.createDataFrame(
        [("www.foo.co.uk",), ("www.example.com",)], "host string"
    )
    got = {
        r["host"]: r["d"]
        for r in web.add_registered_domain(df, F.col("host"), "d").collect()
    }
    assert got == {"www.foo.co.uk": "co.uk", "www.example.com": "example.com"}
