"""robots.txt REP parsing and longest-match URL filtering."""

from __future__ import annotations

from lexor_spark import robots

BODY = """# comment line
User-agent: googlebot
Disallow: /google-only

User-agent: archiver
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:

User-agent: evilbot
Disallow: /
"""


def _robots(spark, body=BODY, host="h.example"):
    return spark.createDataFrame([(host, body)],
                                 "host string, robots_txt string")


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_parse_star_group_only(spark):
    rules = {(r.rule, r.path)
             for r in robots.parse_robots(_robots(spark)).collect()}
    # googlebot and evilbot groups ignored; empty Disallow dropped
    assert rules == {("disallow", "/private"), ("allow", "/private/ok")}


def test_parse_stacked_user_agents_bind_to_one_group(spark):
    body = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    rules = robots.parse_robots(_robots(spark, body)).collect()
    assert [(r.rule, r.path) for r in rules] == [("disallow", "/x")]


def test_parse_case_insensitive_fields(spark):
    body = "USER-AGENT: *\ndisallow: /y\nALLOW: /y/z\n"
    rules = {(r.rule, r.path)
             for r in robots.parse_robots(_robots(spark, body)).collect()}
    assert rules == {("disallow", "/y"), ("allow", "/y/z")}


def test_filter_longest_match_and_ties(spark):
    out = {r.url: (r.allowed, r.matched_rule) for r in robots.robots_filter(
        _urls(spark, ["https://h.example/private/x",
                      "https://h.example/private/ok/x",
                      "https://h.example/public",
                      "https://h.example/",
                      "https://other.example/anything"]),
        _robots(spark)).collect()}
    assert out["https://h.example/private/x"] == (False, "disallow")
    assert out["https://h.example/private/ok/x"] == (True, "allow")
    assert out["https://h.example/public"] == (True, None)    # no rule
    assert out["https://h.example/"] == (True, None)
    # host without a robots.txt: allowed
    assert out["https://other.example/anything"] == (True, None)


def test_filter_allow_wins_equal_length(spark):
    body = "User-agent: *\nDisallow: /same\nAllow: /same\n"
    out = robots.robots_filter(
        _urls(spark, ["https://h.example/same/page"]),
        _robots(spark, body)).collect()[0]
    assert out.allowed and out.matched_rule == "allow"


def test_filter_deny_all_with_carveout(spark):
    body = "User-agent: *\nDisallow: /\nAllow: /pub\n"
    out = {r.url: r.allowed for r in robots.robots_filter(
        _urls(spark, ["https://h.example/pub/a",
                      "https://h.example/else"]),
        _robots(spark, body)).collect()}
    assert out == {"https://h.example/pub/a": True,
                   "https://h.example/else": False}


def test_sitemap_directives(spark):
    body = ("User-agent: *\nDisallow: /x\n"
            "Sitemap: https://h.example/a.xml\n"
            "sitemap: https://h.example/b.xml\n")
    out = {r.sitemap for r in robots.robots_sitemaps(
        _robots(spark, body)).collect()}
    assert out == {"https://h.example/a.xml", "https://h.example/b.xml"}


def test_sitemap_entries_extraction(spark):
    xml = ('<?xml version="1.0"?>\n<urlset>\n'
           "<url>\n  <loc>https://h.example/a</loc>\n"
           "  <lastmod>2024-01-05</lastmod>\n</url>\n"
           "<url><loc>https://h.example/b</loc></url>\n"
           "<url><priority>0.5</priority></url>\n"   # locless: dropped
           "</urlset>")
    df = spark.createDataFrame([("h.example", xml)],
                               "host string, sitemap_xml string")
    out = {r.loc: r.lastmod
           for r in robots.sitemap_entries(df).collect()}
    assert out == {"https://h.example/a": "2024-01-05",
                   "https://h.example/b": None}


def test_build_corpus_robots_stage(spark, sf_dir):
    """Optional REP stage: disallowed pages leave with stage='robots'
    and conservation (corpus + rejects == pages) holds."""
    from lexor_spark import robots as rep
    from lexor_spark.corpus import build_corpus
    from lexor_spark.pages import pages_df

    pages = pages_df(spark, sf_dir)
    rb = rep.robots_fixture_df(spark, sf_dir)
    corpus, rejects = build_corpus(pages, min_quality=0.0, min_chars=10,
                                   jaccard_threshold=0.95, robots_df=rb)
    n_pages = pages.count()
    c = [x.url for x in corpus.collect()]
    r = rejects.collect()
    assert len(c) + len(r) == n_pages
    assert len(set(c) | {x.url for x in r}) == n_pages
    denied = [x for x in r if x.stage == "robots"]
    # host class h%4==1 disallows / (pages live under /srcN/): ~1/4
    assert len(denied) > 0
    from pyspark.sql import functions as F
    dec = rep.robots_filter(pages.select("url"), rb)
    assert len(denied) == dec.filter(~F.col("allowed")).count()


# ---------------------------------------------------------------------------
# RFC 9309 §5.2 longest-match examples (the RFC's own table) + §2.2.1
# user-agent group selection
# ---------------------------------------------------------------------------

def _decide(spark, rules_body, url_path, agent=None):
    body = "User-agent: *\n" + rules_body
    out = robots.robots_filter(
        _urls(spark, [f"https://h.example{url_path}"]),
        _robots(spark, body), agent=agent).collect()[0]
    return out.allowed


def test_rfc_longest_match_table(spark):
    """Every row of RFC 9309 §5.2's example table."""
    cases = [
        ("Allow: /p\nDisallow: /\n", "/page", True),
        ("Allow: /folder\nDisallow: /folder\n", "/folder/page", True),
        ("Allow: /page\nDisallow: /*.htm\n", "/page.htm", False),
        ("Allow: /page\nDisallow: /*.ph\n", "/page.php5", True),
        ("Allow: /$\nDisallow: /\n", "/", True),
        ("Allow: /$\nDisallow: /\n", "/page.htm", False),
    ]
    for rules_body, path, want in cases:
        got = _decide(spark, rules_body, path)
        assert got == want, (rules_body, path, got)


def test_wildcard_star_and_anchor(spark):
    body = ("Disallow: /*.pdf$\n"
            "Disallow: /private/*/tmp\n"
            "Allow: /fish*.php\n"
            "Disallow: /fish\n")
    assert not _decide(spark, body, "/files/x.pdf")
    assert _decide(spark, body, "/files/x.pdfx")       # $ anchors
    assert not _decide(spark, body, "/private/a/tmp")
    assert not _decide(spark, body, "/private/a/b/tmpz")  # * spans /
    assert _decide(spark, body, "/fishcake.php")       # longer allow
    assert not _decide(spark, body, "/fishcake.html")


def test_dollar_mid_pattern_is_literal(spark):
    body = "Disallow: /a$b\n"
    assert not _decide(spark, body, "/a$b/c")
    assert _decide(spark, body, "/ab/c")


def test_ua_group_selection_longest_prefix(spark):
    body = ("User-agent: *\nDisallow: /star\n\n"
            "User-agent: lexor\nDisallow: /lexor\n\n"
            "User-agent: lexorbot\nDisallow: /bot\n")
    rules = {(r.rule, r.path) for r in robots.parse_robots(
        _robots(spark, body), agent="LexorBot-News/1.0").collect()}
    # longest prefix of the product token wins; star group shadowed
    assert rules == {("disallow", "/bot")}
    # unknown agent falls back to the star group
    star = {(r.rule, r.path) for r in robots.parse_robots(
        _robots(spark, body), agent="otherbot").collect()}
    assert star == {("disallow", "/star")}


def test_ua_same_specificity_groups_combine(spark):
    body = ("User-agent: lexorbot\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /x\n\n"
            "User-agent: lexorbot\nDisallow: /b\n")
    rules = {(r.rule, r.path) for r in robots.parse_robots(
        _robots(spark, body), agent="lexorbot").collect()}
    assert rules == {("disallow", "/a"), ("disallow", "/b")}


def test_filter_agent_routes_to_ua_group(spark):
    body = ("User-agent: *\nDisallow: /\n\n"
            "User-agent: lexorbot\nDisallow: /nobots\nAllow: /nobots/ok\n")
    out = {r.url: r.allowed for r in robots.robots_filter(
        _urls(spark, ["https://h.example/anything",
                      "https://h.example/nobots/x",
                      "https://h.example/nobots/ok/x"]),
        _robots(spark, body), agent="lexorbot").collect()}
    assert out == {"https://h.example/anything": True,
                   "https://h.example/nobots/x": False,
                   "https://h.example/nobots/ok/x": True}


def test_hot_host_skew_completes(spark):
    """Degenerate skew probe: one mega-host carries 20k URLs against a
    3-rule table (plus 50 cold hosts).  The broadcast rule join must
    not concentrate a shuffle task — completes and decides exactly."""
    from pyspark.sql import functions as F

    n = 20_000
    urls = spark.range(n).select(
        F.concat(F.lit("https://mega.example/"),
                 F.when(F.col("id") % 2 == 0, "keep/").otherwise("drop/"),
                 F.col("id").cast("string")).alias("url")).union(
        spark.range(50).select(F.concat(
            F.lit("https://cold"), F.col("id").cast("string"),
            F.lit(".example/p")).alias("url")))
    body = "User-agent: *\nDisallow: /drop\nAllow: /keep\nDisallow: /x\n"
    rb = spark.createDataFrame(
        [("mega.example", body)], "host string, robots_txt string")
    dec = robots.robots_filter(urls, rb)
    assert dec.filter(~F.col("allowed")).count() == n // 2
    assert dec.count() == n + 50


def test_hot_host_rules_join_is_broadcast(spark):
    """The rule-table side of the host join must be a broadcast — a
    mega-host's URL concentration then never becomes a shuffle key."""
    from pyspark.sql import functions as F

    urls = spark.range(1000).select(
        F.concat(F.lit("https://mega.example/p"),
                 F.col("id").cast("string")).alias("url"))
    rb = spark.createDataFrame(
        [("mega.example", "User-agent: *\nDisallow: /p1\n")],
        "host string, robots_txt string")
    plan = (robots.robots_filter(urls, rb)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # escape hatch keeps the shuffle join available for a rules table
    # too large to broadcast
    plan2 = (robots.robots_filter(urls, rb, broadcast_rules=False)
             ._jdf.queryExecution().executedPlan().toString())
    assert plan2  # still plans (values pinned equal by the oracle)


# ---------------------------------------------------------------------------
# Crawl-delay (politeness extension, same UA-group machinery)
# ---------------------------------------------------------------------------

CD_BODY = """User-agent: googlebot
Crawl-delay: 10

User-agent: archiver
User-agent: *
Disallow: /private
Crawl-delay: 2.5
Crawl-delay: 1

User-agent: evilbot
Crawl-delay: 99
"""


def _cd(spark, body, agent=None):
    df = spark.createDataFrame([("h.example", body)],
                               "host string, robots_txt string")
    return {r.host: r.delay_s
            for r in robots.crawl_delays(df, agent=agent).collect()}


def test_crawl_delay_star_group(spark):
    # star group selected; two directives -> conservative max
    assert _cd(spark, CD_BODY) == {"h.example": 2.5}


def test_crawl_delay_ua_group_wins(spark):
    assert _cd(spark, CD_BODY, agent="googlebot") == {"h.example": 10.0}
    # archiver names the same group as * -> same delays
    assert _cd(spark, CD_BODY, agent="archiver/2.0") == {"h.example": 2.5}


def test_crawl_delay_malformed_and_negative_dropped(spark):
    body = "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -5\n"
    assert _cd(spark, body) == {}


def test_crawl_delay_matches_oracle(spark, sf_dir):
    import duckdb
    got = {r.host: r.delay_s for r in robots.crawl_delays(
        robots.robots_fixture_df(spark, sf_dir)).collect()}
    con = duckdb.connect()
    con.sql(f"create view documents as select * from "
            f"read_parquet('{sf_dir}/documents.parquet')")
    want = dict(con.sql(robots.crawl_delays_sql(
        robots.ROBOTS_FIXTURE_SQL)).fetchall())
    assert got == want and len(got) > 0


def test_sitemap_index_parse(spark):
    from lexor_spark.robots import sitemap_index
    xml = ('<?xml version="1.0"?>\n<sitemapindex>\n'
           "<sitemap><loc> https://h.example/s1.xml </loc>"
           "<lastmod>2024-02-01</lastmod></sitemap>\n"
           "<sitemap><loc>https://h.example/s2.xml</loc></sitemap>\n"
           "<sitemap><lastmod>2024-02-02</lastmod></sitemap>\n"  # locless
           "</sitemapindex>")
    df = spark.createDataFrame([("h.example", xml)],
                               "host string, sitemap_xml string")
    got = sorted(map(tuple, sitemap_index(df).collect()))
    assert got == [
        ("h.example", "https://h.example/s1.xml", "2024-02-01"),
        ("h.example", "https://h.example/s2.xml", None),
    ]


def test_index_gate_channels_and_precedence(spark):
    from lexor_spark.robots import index_gate
    directives = spark.createDataFrame([
        ("u/meta", True), ("u/hdr", False), ("u/rep", False),
        ("u/ok", False), ("u/all", True),
    ], "url string, noindex boolean")
    responses = spark.createDataFrame([
        ("u/hdr", "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\n"),
        ("u/all", "HTTP/1.1 200 OK\r\nx-robots-tag: a=b, NONE\r\n"),
        ("u/ok", "HTTP/1.1 200 OK\r\nX-Robots-Tag: noarchive\r\n"),
        ("u/meta", "HTTP/1.1 200 OK\r\n"),
        ("u/rep", "HTTP/1.1 200 OK\r\n"),
    ], "url string, headers string")
    rep = spark.createDataFrame([
        ("u/rep", False), ("u/all", False), ("u/meta", True),
        ("u/hdr", True), ("u/ok", True),
    ], "url string, allowed boolean")
    got = {r.url: r for r in
           index_gate(directives, responses, rep).collect()}
    assert not got["u/meta"].indexable
    assert got["u/meta"].reason == "meta_robots"
    assert not got["u/hdr"].indexable
    assert got["u/hdr"].reason == "x_robots_tag"
    assert not got["u/rep"].indexable
    assert got["u/rep"].reason == "robots_txt"
    # noarchive alone does not block indexing
    assert got["u/ok"].indexable and got["u/ok"].reason == "indexable"
    # all three blocked: robots.txt wins the reason (fetch never
    # happens, page-level directives are unseen)
    assert got["u/all"].reason == "robots_txt"


def test_index_gate_missing_rows_default_open(spark):
    from lexor_spark.robots import index_gate
    directives = spark.createDataFrame([("u/x", False)],
                                       "url string, noindex boolean")
    responses = spark.createDataFrame([], "url string, headers string")
    rep = spark.createDataFrame([], "url string, allowed boolean")
    got = index_gate(directives, responses, rep).collect()[0]
    # REP is opt-out; absent header/REP rows must not block
    assert got.indexable and got.reason == "indexable"
