"""Sniff-routed multi-format extraction: every route produces its rows,
branch outputs carry the right text, and hostile payloads never abort."""

from __future__ import annotations

from lexor_spark.job import extract_routed


def _routed(spark, rows):
    df = spark.createDataFrame(
        [(u, p.encode("latin-1"), ct) for u, p, ct in rows],
        "url string, payload binary, content_type string")
    return {r.url: r for r in extract_routed(df, partitions=4).collect()}


def test_each_route_extracts(spark):
    rss = ('<rss version="2.0"><channel><title>c</title>'
           '<item><title>first</title><link>https://x/1</link></item>'
           '<item><title>second</title><link>https://x/2</link></item>'
           '</channel></rss>')
    got = _routed(spark, [
        ("h", "<html><body><p>Hello <b>world</b></p></body></html>",
         "text/html"),
        ("f", rss, "text/html"),          # feed masquerading as html
        ("p", "just plain words", None),
        ("b", "PK\x03\x04zipbytes", None),
        ("i", "GIF89a\x01", None),
    ])
    assert got["h"].route == "html_kernel" and got["h"].ok
    assert "Hello" in got["h"].text and "world" in got["h"].text
    assert got["f"].route == "feed_parser"
    assert got["f"].text == "first\thttps://x/1\nsecond\thttps://x/2"
    assert got["p"].route == "plain_text"
    assert got["p"].text == "just plain words"
    assert got["b"].route == "skip" and got["b"].text is None
    assert got["i"].route == "media_decode" and got["i"].text is None


def test_hostile_payloads_do_not_abort(spark):
    got = _routed(spark, [
        ("empty", "", None),
        ("pdfish", "%PDF-1.5 not really a pdf", None),
        ("feedless", "<feed xmlns='x'><title>no entries</title></feed>",
         None),
        ("broken", "<html><div " + "a" * 1000, "text/html"),
    ])
    assert len(got) == 4
    assert got["pdfish"].route == "pdf_text"      # routed, not crashed
    assert got["feedless"].route == "feed_parser"
    assert got["feedless"].text is None           # zero entries kept row
    assert got["broken"].route == "html_kernel" and got["broken"].ok


def test_html_branch_matches_direct_extraction(spark):
    html = "<html><head><title>T</title></head><body><p>Para.</p></body></html>"
    from lexor_spark.kernel import extract_document
    got = _routed(spark, [("u", html, None)])
    assert got["u"].text == extract_document(html, "u").text
