"""Crawl QA: soft-404 detection + crawl-trap fingerprints."""

from __future__ import annotations

from lexor_spark.crawlqa import crawl_traps, soft404_score


def test_soft404_flags_short_error_page(spark):
    docs = spark.createDataFrame(
        [(0, "Error 404 - Page Not Found. The page you requested "
             "does not exist."),
         (1, "A long article about HTTP status codes. " * 30
             + "The 404 code means a page was not located."),
         (2, "Perfectly ordinary content " * 40)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in soft404_score(docs).collect()}
    assert got[0].is_soft404 and got[0].phrase_hits >= 3
    assert got[0].soft404_score == 10
    # one phrase in a long article is NOT an error page
    assert not got[1].is_soft404 and got[1].phrase_hits == 1
    assert not got[2].is_soft404 and got[2].phrase_hits == 0


def test_crawl_traps_repeated_segments(spark):
    urls = [("https://trap.example/cal/2024/01/cal/2024/01/p%d" % i,)
            for i in range(5)]
    urls += [("https://ok.example/blog/post-%d" % i,) for i in range(5)]
    urls += [("https://faceted.example/search?page=%d" % i,)
             for i in range(4)]
    df = spark.createDataFrame(urls, "url string")
    got = {r.host: r for r in crawl_traps(df).collect()}
    t = got["trap.example"]
    assert t.is_trap and t.max_depth == 7 and t.repeat_frac == 1.0
    ok = got["ok.example"]
    assert not ok.is_trap and ok.max_depth == 2 and ok.repeat_frac == 0.0
    f = got["faceted.example"]
    assert f.query_frac == 1.0 and not f.is_trap


def test_truncated_fetch_verdicts(spark):
    from lexor_spark.crawlqa import truncated_fetch
    rows = [
        ("ok", "HTTP/1.1 200 OK\r\nContent-Length: 5\r\n", b"12345"),
        ("trunc", "HTTP/1.1 200 OK\r\ncontent-length: 100\r\n", b"abc"),
        ("over", "HTTP/1.1 200 OK\r\nContent-Length: 2\r\n", b"abcd"),
        ("none", "HTTP/1.1 200 OK\r\n", b"xyz"),
        ("empty", "HTTP/1.1 200 OK\r\nContent-Length: 10\r\n", b""),
    ]
    df = spark.createDataFrame(
        rows, "url string, headers string, payload binary")
    got = {r.url: r for r in truncated_fetch(df).collect()}
    assert got["ok"].verdict == "ok" and got["ok"].completeness == 1.0
    assert got["trunc"].verdict == "truncated"
    assert got["trunc"].completeness == 0.03
    assert got["over"].verdict == "overlong"
    assert got["none"].verdict == "undeclared"
    assert got["none"].completeness is None
    assert got["empty"].verdict == "truncated"
    assert got["empty"].completeness == 0.0
