"""Pagination stitching, hreflang clusters, and <img>/srcset harvest."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lexor_spark.content import extract_images, srcset_candidates
from lexor_spark.graph import (article_chains, article_stitch,
                               extract_alternates, extract_directives,
                               hreflang_clusters)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows],
        "url string, html binary")


# -- rel=next chains and article stitching ---------------------------------

def _chain_pages(spark):
    def page(n, nxt):
        link = (f'<link rel="next" href="{nxt}">' if nxt else "")
        return (f"https://s.example/story/p{n}",
                f"<html><head>{link}</head><body><p>part {n}</p>"
                "</body></html>")
    return _pages(spark, [page(1, "/story/p2"), page(2, "/story/p3"),
                          page(3, None),
                          ("https://s.example/solo",
                           "<html><body><p>solo</p></body></html>")])


def test_rel_next_prev_through_directives(spark):
    df = _pages(spark, [(
        "https://s.example/a/p2",
        '<html><head><link rel="next" href="p3">'
        '<link rel="prev" href="p1"></head><body>x</body></html>')])
    r = extract_directives(df).collect()[0]
    assert r.rel_next_abs == "https://s.example/a/p3"
    assert r.rel_prev_abs == "https://s.example/a/p1"


def test_article_chains_head_and_page_numbers(spark):
    d = extract_directives(_chain_pages(spark))
    got = {r.url: r for r in article_chains(d).collect()}
    head = "https://s.example/story/p1"
    # p3 declares no next => only appears as a chain member via p2's
    # edge; the head unions itself in at page 0
    assert got[head].page_no == 0 and got[head].chain == head
    assert got["https://s.example/story/p2"].page_no == 1
    assert got["https://s.example/story/p3"].page_no == 2
    assert all(r.chain == head for r in got.values())
    assert "https://s.example/solo" not in got


def test_article_stitch_orders_pages(spark):
    pages = _chain_pages(spark)
    d = extract_directives(pages)
    texts = spark.createDataFrame(
        [(f"https://s.example/story/p{n}", f"part {n}") for n in (3, 1, 2)],
        "url string, text string")
    rows = article_stitch(article_chains(d), texts).collect()
    assert len(rows) == 1
    assert rows[0].n_pages == 3
    assert rows[0].stitched == "part 1\n\npart 2\n\npart 3"


def test_article_chains_cycle_flagged(spark):
    d = extract_directives(_pages(spark, [
        ("https://s.example/a",
         '<html><head><link rel="next" href="/b"></head><body>a</body></html>'),
        ("https://s.example/b",
         '<html><head><link rel="next" href="/a"></head><body>b</body></html>'),
    ]))
    rows = article_chains(d).collect()
    assert rows and all(r.looped for r in rows)
    # looped members are excluded from stitching
    texts = spark.createDataFrame(
        [("https://s.example/a", "a"), ("https://s.example/b", "b")],
        "url string, text string")
    assert article_stitch(article_chains(d), texts).count() == 0


# -- hreflang clusters -----------------------------------------------------

def test_hreflang_cluster_membership_and_langs(spark):
    def alt(lang, href):
        return f'<link rel="alternate" hreflang="{lang}" href="{href}">'
    pages = _pages(spark, [
        ("https://s.example/en/page",
         "<html><head>" + alt("en", "/en/page") + alt("de", "/de/page")
         + alt("fr", "/fr/page") + "</head><body>x</body></html>"),
        ("https://s.example/de/page",
         "<html><head>" + alt("en", "/en/page") + alt("de", "/de/page")
         + "</head><body>x</body></html>"),
        ("https://s.example/other",
         "<html><head>" + alt("en", "/other")
         + alt("es", "/es/other") + "</head><body>y</body></html>"),
    ])
    alts = extract_alternates(pages)
    got = {r.cluster: r for r in hreflang_clusters(alts).collect()}
    # two clusters, labeled by min member url
    c1 = "https://s.example/de/page"
    c2 = "https://s.example/es/other"
    assert set(got) == {c1, c2}
    assert got[c1].n_pages == 3  # en + de + fr variants
    assert got[c1].langs == "de|en|fr"
    assert got[c2].n_pages == 2
    assert got[c2].langs == "en|es"


def test_extract_alternates_requires_lang_and_href(spark):
    pages = _pages(spark, [(
        "https://s.example/p",
        '<html><head><link rel="alternate" href="/feed.xml">'
        '<link rel="alternate" hreflang="EN " href="/en">'
        '<link rel="stylesheet" href="/x.css"></head><body>z</body></html>')])
    rows = extract_alternates(pages).collect()
    assert len(rows) == 1
    assert rows[0].hreflang == "en"  # trimmed, lowercased
    assert rows[0].abs_url == "https://s.example/en"


# -- images / srcset -------------------------------------------------------

def test_extract_images_document_order_and_attrs(spark):
    pages = _pages(spark, [(
        "https://s.example/g",
        '<html><body><img src="/a.jpg" alt="first" width="640" height="480">'
        '<p>x</p><img srcset="/b-320.jpg 320w, /b-640.jpg 640w" alt="second">'
        "<img></body></html>")])
    rows = sorted(extract_images(pages).collect(), key=lambda r: r.img_idx)
    assert [r.img_idx for r in rows] == [0, 1, 2]
    assert rows[0].src == "/a.jpg"
    assert (rows[0].width, rows[0].height) == ("640", "480")
    assert rows[1].src is None and "b-640" in rows[1].srcset
    assert rows[2].src is None and rows[2].srcset is None


def test_srcset_candidates_expansion(spark):
    pages = _pages(spark, [(
        "https://s.example/g",
        '<html><body><img src="/hero.jpg" '
        'srcset="/hero-320.jpg 320w, /hero-2x.jpg 2x , /plain.jpg">'
        "</body></html>")])
    cand = srcset_candidates(extract_images(pages)).collect()
    by_url = {r.asset_url: r for r in cand}
    assert set(by_url) == {"/hero.jpg", "/hero-320.jpg", "/hero-2x.jpg",
                           "/plain.jpg"}
    assert by_url["/hero.jpg"].descriptor is None      # the src row
    assert by_url["/hero-320.jpg"].width == 320        # parsed 320w
    assert by_url["/hero-2x.jpg"].descriptor == "2x"   # density kept raw
    assert by_url["/hero-2x.jpg"].width is None
    assert by_url["/plain.jpg"].descriptor is None


def test_srcset_candidates_matches_duckdb(spark):
    pages = _pages(spark, [
        ("https://s.example/1",
         '<html><body><img src="/x.png" srcset="/x-1.png 100w,/x-2.png '
         '200w"><img srcset="/y.webp 2x"></body></html>'),
        ("https://s.example/2",
         '<html><body><img src="/z.gif"></body></html>'),
    ])
    img = extract_images(pages)
    got = sorted(srcset_candidates(img).collect(),
                 key=lambda r: (r.url, r.img_idx, r.asset_url))
    con = duckdb.connect()
    con.register("img_tbl", img.toPandas())
    from lexor_spark.content import srcset_candidates_sql
    want = sorted(con.sql(srcset_candidates_sql(
        "select url, img_idx, src, srcset from img_tbl")).fetchall(),
        key=lambda w: (w[0], w[1], w[2]))
    assert len(got) == len(want) > 0
    for r, w in zip(got, want):
        assert (r.url, r.img_idx, r.asset_url, r.descriptor, r.width) == w


# -- cross-extractor QA ----------------------------------------------------

def _qa_page(url, body):
    html = f"<html><head><title>t</title></head><body>{body}</body></html>"
    return (url, bytearray(html.encode()))


def test_extractor_diff_verdict_ladder(spark):
    from lexor_spark.job import extractor_diff

    prose = ("<p>It is one of the best days that we have seen and it is "
             "clear that all of us will be able to read more of the work "
             "when it is out because there was a lot of it to see.</p>"
             "<p>We can also say that the review was one of the best "
             "that any of us had read in a long time and that there "
             "will be more to come from the same team when they are "
             "done with the next part of the work on it.</p>")
    pages = spark.createDataFrame([
        # both extract the same prose
        _qa_page("https://q.example/agree", f"<article>{prose}</article>"),
        # kernel's text-mass fallback picks the only div (copyright);
        # density keeps the prose -> diverge
        _qa_page("https://q.example/diverge",
                 prose + "<div>&copy; 2026 q all rights reserved</div>"),
        # structure says main, statistics say junk -> kernel_only
        _qa_page("https://q.example/kernel_only",
                 "<main><p>zq81 xv92 pw73 kd64 mm55 rr46 tt37 yy28 "
                 "uu19 qq10 aa21 bb32 cc43 dd54 ee65 ff76 gg87 hh98 "
                 "ii09 jj11 kk22 ll33 nn44 oo66 pp77</p></main>"),
        # nothing survives either extractor
        _qa_page("https://q.example/empty",
                 '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'),
    ], "url string, html binary")
    got = {r.url.rsplit("/", 1)[1]: r for r in
           extractor_diff(pages, partitions=4).collect()}
    assert got["agree"].verdict == "agree"
    assert got["agree"].f1 >= 0.8
    assert got["diverge"].verdict == "diverge"
    assert got["diverge"].n_kernel > 0 and got["diverge"].n_density > 0
    assert got["kernel_only"].verdict == "kernel_only"
    assert got["kernel_only"].n_density == 0
    assert got["empty"].verdict == "both_empty"
    assert got["empty"].n_kernel == got["empty"].n_density == 0


def test_extractor_diff_every_page_reported(spark):
    """Pages where both extractors return nothing still appear (the
    eval join drops token-less docs; the page-list left join must
    bring them back)."""
    from lexor_spark.job import extractor_diff

    pages = spark.createDataFrame(
        [_qa_page("https://q.example/a", "<p>tiny</p>"),
         _qa_page("https://q.example/b", "")],
        "url string, html binary")
    rows = extractor_diff(pages, partitions=2).collect()
    assert {r.url for r in rows} == {"https://q.example/a",
                                     "https://q.example/b"}


def test_extract_consensus_routing(spark):
    from lexor_spark.job import extract_consensus

    prose = ("<p>It is one of the best days that we have seen and it is "
             "clear that all of us will be able to read more of the work "
             "when it is out because there was a lot of it to see.</p>"
             "<p>We can also say that the review was one of the best "
             "that any of us had read in a long time and that there "
             "will be more to come from the same team when they are "
             "done with the next part of the work on it.</p>")
    pages = spark.createDataFrame([
        _qa_page("https://q.example/agree", f"<article>{prose}</article>"),
        _qa_page("https://q.example/diverge",
                 prose + "<div>&copy; 2026 q all rights reserved</div>"),
        # content inside a boilerplate-classed container: the rule-set
        # drops it, the density side keeps the prose -> density fallback
        _qa_page("https://q.example/fallback",
                 f'<div class="sidebar">{prose}</div>'),
        _qa_page("https://q.example/none",
                 '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'),
    ], "url string, html binary")
    got = {r.url.rsplit("/", 1)[1]: r for r in
           extract_consensus(pages, partitions=4).collect()}
    assert got["agree"].source == "kernel"
    assert not got["agree"].needs_review
    assert "best days" in got["agree"].text
    assert got["diverge"].source == "kernel"
    assert got["diverge"].needs_review          # the QA quarantine
    assert got["fallback"].source == "density"
    assert "best days" in got["fallback"].text
    assert not got["fallback"].needs_review
    assert got["none"].source == "none" and got["none"].text == ""


# -- hostile inputs through the new kernel passes --------------------------

def test_new_kernel_passes_survive_hostile_bytes(spark):
    """Garbage bytes, empty, NULL html, unclosed tags, deep nesting:
    every new mapInArrow pass must yield rows (possibly none for the
    page) and never a task failure."""
    deep = ("<div>" * 3000) + "x" + ("</div>" * 3000)
    rows = [
        ("https://h.example/garbage", bytearray(b"\x00\xff\xfe\x01abc")),
        ("https://h.example/empty", bytearray(b"")),
        ("https://h.example/null", None),
        ("https://h.example/unclosed",
         bytearray(b'<html><body><img src="/a.jpg" <p>broken')),
        ("https://h.example/deep", bytearray(deep.encode())),
        ("https://h.example/ok",
         bytearray(b'<html><head><link rel="alternate" hreflang="en" '
                   b'href="/en"><link rel="next" href="/p2"></head>'
                   b'<body><img src="/i.png" alt="a"></body></html>')),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    imgs = extract_images(pages).collect()
    alts = extract_alternates(pages).collect()
    dirs = extract_directives(pages).collect()
    # the well-formed page's rows came through
    assert any(r.url.endswith("/ok") and r.src == "/i.png" for r in imgs)
    assert any(r.url.endswith("/ok") and r.hreflang == "en" for r in alts)
    ok_dir = [r for r in dirs if r.url.endswith("/ok")][0]
    assert ok_dir.rel_next_abs == "https://h.example/p2"
    # directives yields one row per input page no matter what
    assert len(dirs) == len(rows)


def test_srcset_comma_in_url_and_newlines(spark):
    """Spec ambiguity rules: commas inside URLs (Cloudinary-style
    transform params) are NOT separators; descriptor-comma and
    comma+whitespace (incl. newlines) are; no empty candidates."""
    pages_rows = [
        ("https://s.example/c1",
         '<html><body><img '
         'srcset="https://cdn.example/w_100,h_200/a.jpg 320w, '
         'https://cdn.example/w_50,h_90/b.jpg 160w"></body></html>'),
        ("https://s.example/c2",
         '<html><body><img srcset="/x.jpg 1x,\n/y.jpg 2x,"></body></html>'),
    ]
    pages = _pages(spark, pages_rows)
    img = extract_images(pages)
    cand = srcset_candidates(img).collect()
    by_page = {}
    for r in cand:
        by_page.setdefault(r.url, []).append(r)
    c1 = {r.asset_url: r for r in by_page["https://s.example/c1"]}
    assert set(c1) == {"https://cdn.example/w_100,h_200/a.jpg",
                       "https://cdn.example/w_50,h_90/b.jpg"}
    assert c1["https://cdn.example/w_100,h_200/a.jpg"].width == 320
    c2 = {r.asset_url: r for r in by_page["https://s.example/c2"]}
    # newline after descriptor-comma handled; trailing comma no '' row
    assert set(c2) == {"/x.jpg", "/y.jpg"}
    assert c2["/y.jpg"].descriptor == "2x"
    assert all(r.asset_url for r in cand)
    # DuckDB mirror reproduces the same rows
    import duckdb as _dd
    from lexor_spark.content import srcset_candidates_sql
    con = _dd.connect()
    con.register("img_tbl", img.toPandas())
    want = sorted(con.sql(srcset_candidates_sql(
        "select url, img_idx, src, srcset from img_tbl")).fetchall())
    got = sorted((r.url, r.img_idx, r.asset_url, r.descriptor, r.width)
                 for r in cand)
    assert got == want


def test_article_chains_conflicted_target_detached(spark):
    """Two pages both declaring the same rel=next target (syndicated
    duplicates): the target must start its OWN chain — neither
    upstream article may claim it, and downstream pages follow the
    target, not an arbitrary winner."""
    def page(u, nxt):
        link = f'<link rel="next" href="{nxt}">' if nxt else ""
        return (f"https://s.example{u}",
                f"<html><head>{link}</head><body>x</body></html>")
    d = extract_directives(_pages(spark, [
        page("/h", "/a"), page("/a", "/v"),      # chain H -> A -> (V)
        page("/c", "/v"),                        # C also claims V
        page("/v", "/w"), page("/w", None),      # V continues to W
    ]))
    got = {r.url: r for r in article_chains(d).collect()}
    v = "https://s.example/v"
    # V is conflicted: its own chain head, page 0
    assert got[v].chain == v and got[v].page_no == 0
    assert got["https://s.example/w"].chain == v
    assert got["https://s.example/w"].page_no == 1
    # H's chain ends at A; C starts alone (no member rows beyond heads)
    a = got["https://s.example/a"]
    assert a.chain == "https://s.example/h" and a.page_no == 1
    assert all(r.chain != "https://s.example/c" or
               r.url == "https://s.example/c" for r in got.values())
