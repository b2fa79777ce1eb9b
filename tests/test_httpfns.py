"""HTTP response-header parsing + redirect-edge construction."""

from __future__ import annotations

from lexor_spark.httpfns import parse_http_headers, redirect_edges


def test_parse_basic_fields(spark):
    rows = [
        ("https://a.example/p",
         "HTTP/1.1 301 Moved Permanently\r\nLocation: /new/p\r\n"
         "Content-Length: 0\r\n"),
        ("https://b.example/q",
         "HTTP/1.1 200 OK\r\ncontent-type: text/html; charset=UTF-8\r\n"
         "Content-Length: 512\r\n"),
        ("https://e.example/s", "garbage not a header block"),
    ]
    df = spark.createDataFrame(rows, "url string, headers string")
    got = {r.url: r for r in parse_http_headers(df).collect()}
    a = got["https://a.example/p"]
    assert a.status == 301 and a.location == "/new/p" and a.is_redirect
    assert a.content_length == 0
    b = got["https://b.example/q"]
    assert (b.status, b.content_type, b.charset) == \
        (200, "text/html", "utf-8")
    assert not b.is_redirect
    e = got["https://e.example/s"]
    assert e.status is None and not e.is_redirect


def test_redirect_edges_resolution(spark):
    rows = [
        ("https://a.example/p",
         "HTTP/1.1 301 X\r\nLocation: /new/p\r\n"),
        ("https://c.example/r",
         "HTTP/2 302 F\r\nLOCATION: https://d.example/t\r\n"),
        ("https://x.example/y",
         "HTTP/1.1 302 F\r\nLocation: relative/odd\r\n"),  # dropped
        ("https://ok.example/", "HTTP/1.1 200 OK\r\n"),
    ]
    df = spark.createDataFrame(rows, "url string, headers string")
    got = {r.src: r.dst for r in redirect_edges(df).collect()}
    assert got == {
        "https://a.example/p": "https://a.example/new/p",
        "https://c.example/r": "https://d.example/t",
    }


NOW = "Tue, 19 Aug 2025 12:00:00 GMT"


def _plan(spark, rows):
    from lexor_spark.httpfns import cache_plan
    df = spark.createDataFrame(rows, "url string, headers string")
    return {r.url: r for r in cache_plan(df, now=NOW).collect()}


def test_cache_plan_age_and_lifetime_arithmetic(spark):
    got = _plan(spark, [
        # Date 100 s ago, Age 40 → current age 140; max-age 200 → fresh
        ("a", "HTTP/1.1 200 OK\r\nDate: Tue, 19 Aug 2025 11:58:20 GMT"
              "\r\nAge: 40\r\nCache-Control: public, max-age=200\r\n"),
        # same but max-age 120 < 140 → stale, no validator → refetch
        ("b", "HTTP/1.1 200 OK\r\nDate: Tue, 19 Aug 2025 11:58:20 GMT"
              "\r\nAge: 40\r\nCache-Control: max-age=120\r\n"),
    ])
    assert (got["a"].age_s, got["a"].lifetime_s,
            got["a"].fresh, got["a"].action) == (140, 200, True,
                                                 "serve_cached")
    assert (got["b"].fresh, got["b"].action) == (False, "refetch")


def test_cache_plan_heuristic_freshness_is_ten_percent(spark):
    # Date - Last-Modified = 5000 s → heuristic lifetime 500 s
    got = _plan(spark, [
        ("h", "HTTP/1.1 200 OK\r\nDate: Tue, 19 Aug 2025 11:58:20 GMT"
              "\r\nLast-Modified: Tue, 19 Aug 2025 10:35:00 GMT\r\n"),
    ])
    assert got["h"].lifetime_s == 500
    assert got["h"].fresh and got["h"].action == "serve_cached"


def test_cache_plan_validator_selection_and_directives(spark):
    d = "Date: Tue, 19 Aug 2025 11:58:20 GMT\r\n"
    got = _plan(spark, [
        # stale + both validators → ETag preferred
        ("e", "HTTP/1.1 200 OK\r\n" + d + 'ETag: "abc"\r\n'
              "Last-Modified: Tue, 19 Aug 2025 11:50:00 GMT\r\n"
              "Cache-Control: max-age=10\r\n"),
        # no-cache beats a fresh max-age
        ("n", "HTTP/1.1 200 OK\r\n" + d + 'etag: W/"z"\r\n'
              "Cache-Control: no-cache, max-age=9999\r\n"),
        # no-store always refetches
        ("s", "HTTP/1.1 200 OK\r\n" + d +
              "Cache-Control: no-store, max-age=9999\r\n"),
    ])
    assert got["e"].action == "revalidate_etag" and got["e"].etag == '"abc"'
    assert got["n"].action == "revalidate_etag"
    assert got["s"].action == "refetch" and got["s"].no_store


def test_cache_plan_hostile_headers(spark):
    got = _plan(spark, [
        ("g", "HTTP/1.1 200 OK\r\nDate: yesterday-ish\r\n"
              "Expires: soon\r\nAge: 2\r\nCache-Control: max-age=5\r\n"),
        ("z", "garbage \x01 block"),
    ])
    # unparseable dates fall back to Age-only residence
    assert (got["g"].age_s, got["g"].fresh) == (2, True)
    assert got["z"].action == "refetch" and got["z"].age_s == 0
