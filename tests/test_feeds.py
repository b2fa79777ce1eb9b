"""RSS/Atom feed-entry extraction."""

from __future__ import annotations

from lexor_spark.feeds import feed_entries


def test_feed_entries_rss_and_atom(spark):
    rss = ('<?xml version="1.0"?><rss version="2.0"><channel>'
           "<title>Chan</title><link>https://s.example/</link>"
           "<item><title>A &amp; B</title>"
           "<link> https://s.example/p1 </link></item>"
           "<item><title>Second</title>"
           "<link>https://s.example/p2</link></item>"
           "</channel></rss>")
    atom = ('<?xml version="1.0"?>'
            '<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
            '<link href="https://a.example/"/>'
            '<entry><title type="text">E1</title>'
            '<link rel="alternate" href="https://a.example/e1"/></entry>'
            "</feed>")
    df = spark.createDataFrame(
        [("u1", rss), ("u2", atom), ("u3", "not a feed")],
        "url string, body string")
    rows = feed_entries(df).collect()
    got = {(r.url, r.entry_idx): r for r in rows}
    # channel/feed-level <link>/<title> must not leak into entries
    assert len(rows) == 3
    assert got[("u1", 0)].link == "https://s.example/p1"  # trimmed
    assert got[("u1", 0)].title == "A &amp; B"
    assert got[("u1", 1)].link == "https://s.example/p2"
    assert got[("u2", 0)].kind == "atom"
    assert got[("u2", 0)].link == "https://a.example/e1"
    assert got[("u2", 0)].title == "E1"


def test_feed_entries_missing_fields(spark):
    rss = ("<rss><channel><item><title>no link</title></item>"
           "<item><link>https://x.example/y</link></item>"
           "</channel></rss>")
    df = spark.createDataFrame([("u", rss)], "url string, body string")
    got = {r.entry_idx: r for r in feed_entries(df).collect()}
    assert got[0].link == "" and got[0].title == "no link"
    assert got[1].link == "https://x.example/y" and got[1].title == ""
