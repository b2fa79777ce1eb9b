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
