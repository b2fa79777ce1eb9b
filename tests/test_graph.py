"""Web-graph operators: link extraction + fixed-round PageRank."""

from __future__ import annotations

import pytest

from lexor_spark.graph import _resolve, extract_links, pagerank


def test_resolve_rules():
    base = "https://site.example/dir/page.html"
    assert _resolve(base, "https://other.example/x") == \
        "https://other.example/x"
    assert _resolve(base, "//cdn.example/a.js") == "https://cdn.example/a.js"
    assert _resolve(base, "/root/y") == "https://site.example/root/y"
    assert _resolve(base, "sibling.html") == \
        "https://site.example/dir/sibling.html"
    assert _resolve(base, "#frag") == base
    assert _resolve("https://host.example", "/x") == "https://host.example/x"


def test_extract_links_anchor_and_resolution(spark):
    html = ('<html><body><p>See <a href="/docs/a">the <b>docs</b></a> and '
            '<a href="b.html">B &amp; C</a> and <a name="no-href">skip</a>'
            "</p></body></html>").encode()
    df = spark.createDataFrame(
        [("https://s.example/dir/page", bytearray(html))], "url string, html binary")
    rows = {r.href: r for r in extract_links(df).collect()}
    assert set(rows) == {"/docs/a", "b.html"}
    assert rows["/docs/a"].abs_url == "https://s.example/docs/a"
    assert rows["/docs/a"].anchor == "the docs"
    assert rows["b.html"].abs_url == "https://s.example/dir/b.html"
    assert rows["b.html"].anchor == "B & C"


def test_pagerank_two_node_cycle(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    got = {r.node_id: r.rank for r in pagerank(edges, iters=3).collect()}
    # symmetric cycle: both nodes hold rank 0.5 at every round
    assert got == {0: 0.5, 1: 0.5}


def test_pagerank_star_prefers_hub(spark):
    # 1,2,3 -> 0 (hub); 0 -> 1.  Hub must outrank the spokes, and the
    # pointed-to spoke must outrank the dangling ones.
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)], "src long, dst long")
    got = {r.node_id: r.rank for r in pagerank(edges, iters=5).collect()}
    assert got[0] > got[1] > got[2]
    assert got[2] == got[3]  # symmetric dangling spokes
    assert all(v > 0 for v in got.values())
    # leaky-dangling variant: total mass must not exceed 1
    assert sum(got.values()) <= 1.0 + 1e-6


def test_pagerank_deterministic(spark):
    from lexor_spark.graph import fixture_edges
    a = pagerank(fixture_edges(spark, "/root/testdata/sf0.001"),
                 iters=2).collect()
    b = pagerank(fixture_edges(spark, "/root/testdata/sf0.001"),
                 iters=2).collect()
    assert a == b
    assert len(a) == 500


def test_pagerank_links_end_to_end(spark):
    """Kernel extraction -> canonicalize -> hash -> pagerank, composed.
    Every synthetic page links to its host root and /about, so the
    node set is pages + 2 hubs per host, hubs soak up all link mass,
    and spokes of one host tie exactly."""
    from lexor_spark.graph import pagerank_links
    from lexor_spark.pages import pages_df

    out = pagerank_links(pages_df(spark, "/root/testdata/sf0.001"),
                         iters=2).collect()
    ranks = {r.url: r.rank for r in out}
    hosts = {u.split("/")[2] for u in ranks}
    assert len(out) == 500 + 2 * len(hosts)
    assert all(u is not None for u in ranks)
    roots = [u for u in ranks if u.endswith(".example/")]
    spokes = [u for u in ranks if "/p" in u]
    assert min(ranks[r] for r in roots) > max(ranks[s] for s in spokes)
    # spokes are structurally identical (pure sinks' sources): equal rank
    assert len({ranks[s] for s in spokes}) == 1


def test_hits_star_hub_authority(spark):
    """1,2,3 -> 0 and 0 -> 1: node 0 is the sole authority (auth 1.0),
    node 1 both points at it (hub) and receives from it (auth); 2,3 are
    pure symmetric hubs."""
    from lexor_spark.graph import hits
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)], "src long, dst long")
    got = {r.node_id: (r.auth, r.hub) for r in hits(edges, iters=3).collect()}
    assert got[0][0] == 1.0            # max-normalized top authority
    assert got[2] == got[3]            # symmetric hubs tie exactly
    assert got[2][1] == 1.0            # they are the top hubs
    assert got[0][1] > 0               # 0 -> 1 gives node 0 some hub score
    assert got[2][0] == 0.0            # nothing points at 2/3: auth 0
    assert got[1][0] > 0               # 0 -> 1: node 1 has authority


def test_hits_deterministic_and_matches_numpy(spark):
    """Fixed-round HITS equals a plain numpy power iteration with the
    same round-6 schedule on the fixture graph."""
    import numpy as np

    from lexor_spark.graph import fixture_edges, hits
    edges_df = fixture_edges(spark, "/root/testdata/sf0.001")
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for s, d in edges:
        adj[idx[s], idx[d]] = 1.0
    h = np.ones(n)
    for _ in range(2):
        a = np.round(adj.T @ np.round(h, 6), 6)
        a = np.round(a / a.max(), 6)
        h = np.round(adj @ a, 6)
        h = np.round(h / h.max(), 6)
    got = hits(edges_df, iters=2).collect()
    assert len(got) == n
    for r in got:
        assert abs(r.auth - a[idx[r.node_id]]) < 2e-6, r
        assert abs(r.hub - h[idx[r.node_id]]) < 2e-6, r
    assert got == hits(edges_df, iters=2).collect()


def test_anchor_texts_aggregation_and_ties(spark):
    """Counts, distinct anchors, and the (count desc, text asc)
    tie-break; entity decode flows through the kernel anchor walk."""
    from lexor_spark.graph import anchor_texts

    def page(url, *links):
        body = "".join(f'<a href="{h}">{t}</a>' for h, t in links)
        return (url, bytearray(f"<html><body>{body}</body></html>".encode()))

    rows = [
        page("https://a.example/1", ("/t", "Zeta"), ("/t", "Alpha")),
        page("https://a.example/2", ("/t", "Alpha"), ("/t", "Zeta")),
        page("https://a.example/3", ("/t", "Mid"), ("/u", "B &amp; C")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r.target: r for r in anchor_texts(df).collect()}
    t = got["https://a.example/t"]
    # Alpha and Zeta tie at 2 links each; lexicographically smaller wins
    assert (t.n_links, t.n_distinct_anchors, t.top_anchor) == (5, 3, "Alpha")
    u = got["https://a.example/u"]
    assert (u.n_links, u.n_distinct_anchors, u.top_anchor) == (1, 1, "B & C")


def test_extract_directives(spark):
    """Meta-robots union (none => both verdicts), first-canonical-wins,
    relative canonical resolution, hreflang count, headless/NULL pages
    survive with null directives."""
    from lexor_spark.graph import extract_directives

    rows = [
        ("https://a.example/x/page",
         b'<html LANG=" EN-GB "><head>'
         b'<meta NAME="Robots" content="NOINDEX, follow">'
         b'<meta name="robots" content="nofollow">'
         b'<link rel="canonical" href="/c/1">'
         b'<link rel="canonical" href="/c/IGNORED">'
         b'<link rel="alternate" hreflang="de" href="/de">'
         b'<link rel="alternate" hreflang="fr" href="/fr">'
         b'</head><body>hi</body></html>'),
        ("https://b.example/", b'<html><head>'
         b'<meta name="robots" content="none"></head></html>'),
        ("https://c.example/",
         b'<html lang=" "><head>'
         b'<link rel="CANONICAL" href="https://other/x">'
         b'</head></html>'),
        ("https://d.example/", b"<p>no head at all"),
        ("https://e.example/", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r for r in extract_directives(df).collect()}
    a = got["https://a.example/x/page"]
    assert a.meta_robots == "noindex, follow,nofollow"
    assert a.noindex and a.nofollow
    assert a.canonical == "/c/1"                # first wins
    assert a.canonical_abs == "https://a.example/c/1"
    assert a.n_hreflang == 2
    assert a.html_lang == "en-gb"               # trimmed + lowercased
    b = got["https://b.example/"]
    assert b.meta_robots == "none" and b.noindex and b.nofollow
    assert b.html_lang is None
    c = got["https://c.example/"]
    assert not c.noindex and c.canonical_abs == "https://other/x"
    assert c.html_lang is None                  # blank lang attr ignored
    for u in ("https://d.example/", "https://e.example/"):
        r = got[u]
        assert r.meta_robots is None and not r.noindex and not r.nofollow
        assert r.canonical is None and r.n_hreflang == 0
        assert r.html_lang is None              # no root element at all


# --------------------------------------------------------- link context

def _links(html: str, url: str = "https://h.example/a/b"):
    from lexor_spark.graph import links_of_doc
    from lexor_spark.kernel.htmlparser import parse_html
    doc, _ = parse_html(html, url)
    return links_of_doc(doc, url)


def test_nofollow_token_match_not_substring():
    got = _links('<a href="/x" rel="sponsored NOFOLLOW">a</a>'
                 '<a href="/y" rel="nofollowish">b</a>'
                 '<a href="/z">c</a>')
    assert [(l[0], l[3]) for l in got] == [
        ("/x", True), ("/y", False), ("/z", False)]


def test_dropped_matches_extractor_decision():
    html = ('<nav><a href="/n">nav</a></nav>'
            '<main><p><a href="/m">main</a></p></main>'
            '<footer><a href="/f">foot</a></footer>'
            '<div class="sidebar"><a href="/s">side</a></div>'
            '<p><a href="/b" class="share-buttons">share</a></p>')
    got = {l[0]: l[4] for l in _links(html)}
    assert got == {"/n": True, "/m": False, "/f": True,
                   "/s": True, "/b": True}


def test_dropped_memo_consistent_across_siblings():
    # two links under the same nav share the memoized ancestor verdict
    got = _links('<nav><a href="/1">x</a><a href="/2">y</a></nav>')
    assert [l[4] for l in got] == [True, True]


def test_resolve_redirects_chain_and_cycle(spark):
    from lexor_spark.graph import resolve_redirects

    # chain 5 -> 4 -> 3 -> 2 -> 1 -> 0 (terminal) plus 3-cycle 10/11/12
    hops = [(i, i - 1) for i in range(1, 6)]
    cyc = [(10, 11), (11, 12), (12, 10)]
    edges = spark.createDataFrame(hops + cyc, "src long, dst long")
    got = {r.url_id: r for r in resolve_redirects(edges).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 10, 11, 12}
    for i in range(1, 6):
        assert got[i].final_id == 0 and got[i].hops == i
        assert not got[i].looped
    for i in (10, 11, 12):
        assert got[i].looped and got[i].final_id is None
        assert got[i].hops == 16  # doubling count: 2**rounds


def test_resolve_redirects_min_dst_dedup(spark):
    from lexor_spark.graph import resolve_redirects

    # two captures of src=7 keep the MIN dst (3, itself redirecting to 0)
    edges = spark.createDataFrame(
        [(7, 9), (7, 3), (3, 0)], "src long, dst long")
    got = {r.url_id: r for r in resolve_redirects(edges).collect()}
    assert got[7].final_id == 0 and got[7].hops == 2


def test_alias_collapse_canonical_plus_redirect(spark):
    from lexor_spark.graph import alias_collapse

    directives = spark.createDataFrame(
        [("https://s.example/p?ref=x", "https://s.example/p"),
         ("https://s.example/q", None),
         ("https://s.example/self", "https://s.example/self")],
        "url string, canonical_abs string")
    redirects = spark.createDataFrame(
        [("https://s.example/p", "https://s.example/canonical")],
        "src string, dst string")
    got = {r.url: r for r in
           alias_collapse(directives, redirects).collect()}
    # self-canonical and no-canonical pages generate no alias edge
    assert set(got) == {"https://s.example/p?ref=x",
                        "https://s.example/p"}
    assert got["https://s.example/p?ref=x"].canonical_to == \
        "https://s.example/canonical"
    assert got["https://s.example/p?ref=x"].hops == 2
    assert got["https://s.example/p"].hops == 1


def test_hyperball_exact_reach_on_path(spark):
    """On a tiny path graph the HLL estimate is checked against the
    TRUE incoming-ball sizes qualitatively: reach grows along the
    chain and the sink has the largest harmonic centrality."""
    from lexor_spark.graph import hyperball

    # path 0 -> 1 -> 2 -> 3: balls B_in(v,3) = {0..v}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = {r.node_id: r for r in hyperball(edges, iters=3).collect()}
    assert set(got) == {0, 1, 2, 3}
    # reach estimates must be monotone along the path (more reachers)
    reaches = [got[v].reach_est for v in (0, 1, 2, 3)]
    assert reaches == sorted(reaches)
    assert got[3].harmonic == max(r.harmonic for r in got.values())
    # source node: nobody reaches it, harmonic 0
    assert got[0].harmonic == 0.0


def test_hyperball_matches_duckdb_bit_exact(spark):
    """The whole iteration replays bit-identically in DuckDB (no libm
    in the estimator, exact power-of-two sums)."""
    import duckdb

    from lexor_spark.graph import (FIXTURE_EDGES_SQL, fixture_edges,
                                   hyperball, hyperball_sql)

    got = hyperball(fixture_edges(spark, "/root/testdata/sf0.001")) \
        .collect()
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = con.sql(hyperball_sql(FIXTURE_EDGES_SQL)).fetchall()
    assert len(got) == len(want) > 0
    for r, w in zip(got, want):
        assert (r.node_id, r.reach_est, r.harmonic) == w


def test_hyperball_register_merge_monotone(spark):
    """Register values never decrease round over round (union = max),
    so reach estimates are non-decreasing in t."""
    from lexor_spark.graph import fixture_edges, hyperball

    e = fixture_edges(spark, "/root/testdata/sf0.001")
    r2 = {r.node_id: r.reach_est for r in hyperball(e, iters=2).collect()}
    r3 = {r.node_id: r.reach_est for r in hyperball(e, iters=3).collect()}
    assert all(r3[v] >= r2[v] for v in r2)


def test_host_edges_dedup_and_selfdrop(spark):
    from lexor_spark.graph import host_edges

    html_a = ('<html><body><a href="https://b.example/x">1</a>'
              '<a href="https://b.example/y">2</a>'
              '<a href="/local">3</a>'
              '<a href="https://a.example/other">4</a></body></html>')
    rows = spark.createDataFrame(
        [("https://a.example/p1", bytearray(html_a.encode())),
         ("https://a.example/p2", bytearray(html_a.encode()))],
        "url string, html binary")
    got = {(r.src_host, r.dst_host) for r in host_edges(rows).collect()}
    # many page links, intra-host + self dropped, pairs deduped
    assert got == {("a.example", "b.example")}


def test_host_rank_hub_wins(spark):
    from lexor_spark.graph import host_rank

    def page(url, targets):
        body = "".join(f'<a href="https://{t}/">x</a>' for t in targets)
        return (url, bytearray(f"<html><body>{body}</body></html>".encode()))

    # spokes s1..s3 all link to hub; hub links to s1
    pages = spark.createDataFrame(
        [page("https://s1.example/p", ["hub.example"]),
         page("https://s2.example/p", ["hub.example"]),
         page("https://s3.example/p", ["hub.example"]),
         page("https://hub.example/p", ["s1.example"])],
        "url string, html binary")
    got = {r.host: r.rank for r in host_rank(pages, iters=5).collect()}
    assert set(got) == {"hub.example", "s1.example", "s2.example",
                        "s3.example"}
    assert got["hub.example"] > got["s1.example"] > got["s2.example"]
    assert got["s2.example"] == got["s3.example"]


def test_host_edges_megahost_collapses_before_shuffle(spark):
    """A mega-host with thousands of pages all linking to the same
    partner produces exactly ONE host edge — the map-side distinct
    collapses page-level fan-in so the exchange never sees the skew."""
    from lexor_spark.graph import host_edges, host_rank

    html = (b'<html><body><a href="https://partner.example/x">p</a>'
            b'<a href="/self">s</a></body></html>')
    pages = spark.createDataFrame(
        [(f"https://mega.example/p{i}", bytearray(html))
         for i in range(2000)],
        "url string, html binary")
    edges = host_edges(pages).collect()
    assert [(r.src_host, r.dst_host) for r in edges] == \
        [("mega.example", "partner.example")]
    ranks = {r.host: r.rank for r in host_rank(pages, iters=3).collect()}
    assert set(ranks) == {"mega.example", "partner.example"}
    assert ranks["partner.example"] > ranks["mega.example"]
