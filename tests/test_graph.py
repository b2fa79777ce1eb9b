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
