"""MIME sniffing → extractor dispatch (WHATWG-subset semantics).

Branch-targeted cases beyond the gate fixture: header-trust rules
(specific types trusted, text/html feed-sniffed, text/plain
binary-checked, generic types sniffed from scratch), the magic table,
tag-table terminators, and the binary-data byte classes."""

from __future__ import annotations

from pyspark.sql import functions as F

from lexor_spark import mimesniff


def _sniff(spark, rows):
    df = spark.createDataFrame(
        [(u, p.encode("latin-1"), ct) for u, p, ct in rows],
        "url string, payload binary, content_type string")
    out = mimesniff.sniff_mime(df).collect()
    return {r.url: (r.sniffed_mime, r.dispatch) for r in out}


def test_magic_table_overrides_generic_type(spark):
    got = _sniff(spark, [
        ("a", "%PDF-1.4\nxref", None),
        ("b", "\x89PNG\r\n\x1a\nchunk", "application/octet-stream"),
        ("c", "GIF87aimg", None),
        ("d", "\xff\xd8\xff\xe1exif", "unknown/unknown"),
        ("e", "PK\x03\x04zipcentral", None),
        ("f", "\x1f\x8b\x08streamz", None),
    ])
    assert got["a"] == ("application/pdf", "pdf_text")
    assert got["b"] == ("image/png", "media_decode")
    assert got["c"] == ("image/gif", "media_decode")
    assert got["d"] == ("image/jpeg", "media_decode")
    assert got["e"] == ("application/zip", "skip")
    assert got["f"] == ("application/gzip", "skip")


def test_bom_means_text(spark):
    got = _sniff(spark, [
        ("u8", "\xef\xbb\xbfhello", None),
        ("u16", "\xfe\xff\x00h", None),
    ])
    assert got["u8"] == ("text/plain", "plain_text")
    assert got["u16"] == ("text/plain", "plain_text")


def test_tag_sniff_needs_terminator_and_skips_whitespace(spark):
    got = _sniff(spark, [
        ("ok", " \t\r\n<html lang=en>", None),
        ("upper", "<BODY >x", None),
        ("comment", "<!-- banner --> etc", None),
        # <htmlish is NOT an HTML tag-sniff hit (no space/> after <html)
        ("near", "<htmlish>custom", None),
        ("xml", "<?xml version='1.0'?><x/>", None),
    ])
    assert got["ok"] == ("text/html", "html_kernel")
    assert got["upper"] == ("text/html", "html_kernel")
    assert got["comment"] == ("text/html", "html_kernel")
    assert got["near"] == ("text/plain", "plain_text")
    assert got["xml"] == ("text/xml", "plain_text")


def test_feed_sniff_overrides_supplied_html(spark):
    rss = '<?xml version="1.0"?>\n<rss version="2.0"><channel/></rss>'
    atom = '<feed xmlns="http://www.w3.org/2005/Atom"><id/></feed>'
    got = _sniff(spark, [
        ("r", rss, "text/html"),
        ("a", atom, None),
        ("h", "<html><body>real page", "text/html"),
    ])
    assert got["r"] == ("application/rss+xml", "feed_parser")
    assert got["a"] == ("application/atom+xml", "feed_parser")
    assert got["h"] == ("text/html", "html_kernel")


def test_apache_bug_binary_check_on_text_plain(spark):
    got = _sniff(spark, [
        ("bin", "data\x07bell", "text/plain"),
        ("txt", "just words", "text/plain"),
        # specific non-text types are trusted even over tag-ish bytes
        ("trust", "<html>", "application/json"),
    ])
    assert got["bin"] == ("application/octet-stream", "skip")
    assert got["txt"] == ("text/plain", "plain_text")
    assert got["trust"] == ("application/json", "plain_text")


def test_binary_byte_classes(spark):
    # \t \n \r \x0c \x1b(ESC) are TEXT bytes per WHATWG §5; \x01 is not
    got = _sniff(spark, [
        ("t", "a\tb\nc\rd\x0ce\x1bf", None),
        ("b", "a\x01b", None),
    ])
    assert got["t"] == ("text/plain", "plain_text")
    assert got["b"] == ("application/octet-stream", "skip")


def test_sniff_scans_only_head(spark):
    # a control byte past the 512-byte resource head must not flip the
    # verdict (the spec sniffs a bounded prefix — at 10^12 rows this is
    # also what keeps the projection cheap)
    got = _sniff(spark, [("far", "x" * 600 + "\x01", None)])
    assert got["far"] == ("text/plain", "plain_text")


def test_plan_is_scan_side(spark):
    df = spark.createDataFrame(
        [("u", b"<html> hi", None)],
        "url string, payload binary, content_type string")
    plan = (mimesniff.sniff_mime(df)
            ._jdf.queryExecution().executedPlan().toString())
    # no Python anywhere — the ladder is pure Catalyst expressions; the
    # only allowed exchange is the final orderBy's range partitioning
    assert "EvalPython" not in plan
    assert "hashpartitioning" not in plan
