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
    # host class h%3==1 disallows / (pages live under /srcN/): ~1/3
    assert len(denied) > 0
    from pyspark.sql import functions as F
    dec = rep.robots_filter(pages.select("url"), rb)
    assert len(denied) == dec.filter(~F.col("allowed")).count()
