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
