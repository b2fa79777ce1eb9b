"""WHATWG-style MIME sniffing → extractor dispatch, as scan-side columns.

At crawl scale the Content-Type header lies constantly — PDFs served as
``text/html``, feeds served as HTML, binaries served as ``text/plain``
(the Apache default-type bug the WHATWG algorithm §7.1 exists to
handle).  Routing each payload to the right extractor (HTML kernel,
PDF text layer, feed parser, plain-text passthrough, media decode)
therefore needs *content* sniffing, not header trust.  This module
implements a deterministic subset of the public WHATWG MIME Sniffing
Standard (https://mimesniff.spec.whatwg.org/ §6-§7) as pure Catalyst
expressions over the first 512 payload bytes:

* **magic-byte table** (§6.1) when the supplied type is absent or
  generic (``application/octet-stream`` / ``unknown/unknown``): PDF,
  PNG, GIF, JPEG, ZIP, gzip, UTF-16/UTF-8 BOMs;
* **tag sniff** (§7.1 "identify an unknown MIME type"): leading
  whitespace skipped, then the spec's case-insensitive tag table
  (``<!DOCTYPE html``, ``<html``, ``<head``, ``<script``, …, ``<!--``)
  each terminated by space or ``>`` → ``text/html``; ``<?xml`` →
  ``text/xml``;
* **feed sniff** (§7.3): a payload whose (possibly
  ``<?xml``-prologued) root element is ``<rss`` / ``<feed`` is
  ``application/rss+xml`` / ``application/atom+xml`` even when served
  as ``text/html`` — feeds masquerading as pages otherwise poison the
  HTML extractor;
* **binary-vs-text test** (§5 "binary data byte"): any byte in
  0x00-0x08, 0x0B, 0x0E-0x1A, 0x1C-0x1F → ``application/octet-stream``,
  else ``text/plain``;
* a supplied *specific* type is trusted (per spec) **except**
  ``text/html`` (feed sniff still applies) and ``text/plain`` (the
  Apache-bug binary check still applies).

Plan shape: one ``substring`` + ``decode(…, 'ISO-8859-1')`` projection
(latin-1 is a total 1:1 byte→char map, so every magic byte survives)
and a CASE ladder of ``rlike``/``startswith`` — no UDF, no shuffle,
whole-stage codegen; at 10^12 rows this is a free rider on the payload
scan.  The DuckDB oracle mirrors the identical regex ladder over the
same fixture text (Java regex and RE2 agree on this subset, as in
:mod:`lexor_spark.httpfns`).

No reference counterpart (the reference converts one already-typed
document, `lexor/command/to.py`); semantics per the public WHATWG spec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sniff_mime", "sniff_mime_sql", "sniff_expr",
           "dispatch_expr", "DISPATCH"]

# WHATWG §6.1 magic-byte table (prefix → essence), latin-1-decoded.
_MAGIC = [
    ("%PDF-", "application/pdf"),
    ("\x89PNG\r\n\x1a\n", "image/png"),
    ("GIF87a", "image/gif"),
    ("GIF89a", "image/gif"),
    ("\xff\xd8\xff", "image/jpeg"),
    ("PK\x03\x04", "application/zip"),
    ("\x1f\x8b\x08", "application/gzip"),
    ("\xfe\xff", "text/plain"),      # UTF-16BE BOM
    ("\xff\xfe", "text/plain"),      # UTF-16LE BOM
    ("\xef\xbb\xbf", "text/plain"),  # UTF-8 BOM
]

# WHATWG §7.1 tag table: each pattern, case-insensitive, must be
# followed by 0x20 (space) or 0x3E (>) — expressed as one alternation.
_HTML_TAGS = ("!DOCTYPE HTML|HTML|HEAD|SCRIPT|IFRAME|H1|DIV|FONT|"
              "TABLE|A|STYLE|TITLE|B|BODY|BR|P|!--")
_WS = r"[ \t\n\r\x0c]"
_HTML_RE = rf"(?is)^{_WS}*<(?:{_HTML_TAGS})[ >]"
_XML_RE = rf"(?is)^{_WS}*<\?xml"
# §7.3 feed sniff: optional <?xml …?> prologue(s) / comments, then the
# root element.  One regex per feed flavor keeps both engines honest.
_FEED_PRE = rf"(?is)^{_WS}*(?:<\?xml[^>]*\?>{_WS}*|<!--.*?-->{_WS}*)*"
_RSS_RE = _FEED_PRE + "<rss[ >]"
_ATOM_RE = _FEED_PRE + "<feed[ >]"
# §5 "binary data byte" classes.
_BINARY_RE = "[\x00-\x08\x0b\x0e-\x1a\x1c-\x1f]"

# essence → extractor route.  The pipeline fans these out:
# html_kernel → job.extract_pages, pdf_text → pdfjob, feed_parser →
# feeds.feed_entries, plain_text → textfns, media_decode → multimodal.
DISPATCH = [
    ("text/html", "html_kernel"),
    ("application/pdf", "pdf_text"),
    ("application/rss+xml", "feed_parser"),
    ("application/atom+xml", "feed_parser"),
    ("text/", "plain_text"),          # prefix: plain, xml, css, …
    ("application/xml", "plain_text"),
    ("application/json", "plain_text"),
    ("image/", "media_decode"),       # prefix
]

_GENERIC = ("application/octet-stream", "unknown/unknown",
            "application/unknown")


def _sniff_unknown(head: Column) -> Column:
    """§7.1: identify an unknown MIME type from the payload head."""
    out = None
    for prefix, essence in _MAGIC:
        cond = head.startswith(prefix)
        out = F.when(cond, essence) if out is None else \
            out.when(cond, essence)
    return (out
            .when(head.rlike(_RSS_RE), "application/rss+xml")
            .when(head.rlike(_ATOM_RE), "application/atom+xml")
            .when(head.rlike(_HTML_RE), "text/html")
            .when(head.rlike(_XML_RE), "text/xml")
            .when(head.rlike(_BINARY_RE), "application/octet-stream")
            .otherwise("text/plain"))


def _dispatch(mime: Column) -> Column:
    out = None
    for pat, route in DISPATCH:
        cond = mime.startswith(pat) if pat.endswith("/") else (mime == pat)
        out = F.when(cond, route) if out is None else out.when(cond, route)
    return out.otherwise("skip")


def sniff_expr(bin_col: str = "payload",
               ct_col: str = "content_type") -> Column:
    """The sniffed-essence Column (the WHATWG §7 decision given the
    supplied Content-Type essence and the first 512 payload bytes) —
    exposed so composed jobs (:func:`lexor_spark.job.extract_routed`)
    can sniff without materializing the audit frame."""
    head = F.decode(F.substring(F.col(bin_col), 1, 512), "ISO-8859-1")
    ct = F.lower(F.col(ct_col))
    unknown = ct.isNull() | ct.isin(*_GENERIC)
    return (
        F.when(unknown, _sniff_unknown(head))
        # supplied text/html: feed sniff still applies (§7.3)
        .when(ct == "text/html",
              F.when(head.rlike(_RSS_RE), "application/rss+xml")
               .when(head.rlike(_ATOM_RE), "application/atom+xml")
               .otherwise("text/html"))
        # supplied text/plain: Apache-bug binary check (§7.2)
        .when(ct == "text/plain",
              F.when(head.rlike(_BINARY_RE), "application/octet-stream")
               .otherwise("text/plain"))
        .otherwise(ct))


def dispatch_expr(bin_col: str = "payload",
                  ct_col: str = "content_type") -> Column:
    """The extractor-route Column for a payload (sniff + route table)."""
    return _dispatch(sniff_expr(bin_col, ct_col))


def sniff_mime(pages: DataFrame, bin_col: str = "payload",
               ct_col: str = "content_type",
               url_col: str = "url") -> DataFrame:
    """Per payload: ``sniffed_mime`` and ``dispatch`` (which extractor
    the pipeline should route the row to).  ``ct_col`` holds the
    header essence (lower-cased, no parameters —
    :func:`lexor_spark.httpfns.parse_http_headers` emits exactly
    this) or NULL when absent."""
    sniffed = sniff_expr(bin_col, ct_col)
    return pages.select(
        F.col(url_col).alias("url"),
        F.lower(F.col(ct_col)).alias("content_type"),
        sniffed.alias("sniffed_mime"),
        _dispatch(sniffed).alias("dispatch"),
    ).orderBy("url")


def _sql_quote(s: str) -> str:
    """Embed a latin-1 pattern/prefix into a DuckDB single-quoted
    literal, control bytes via chr() concatenation (DuckDB VARCHARs
    reject embedded NULs in literals; chr() handles the rest)."""
    parts, run = [], ""
    for ch in s:
        if 0x20 <= ord(ch) < 0x7F and ch != "'":
            run += ch
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append(f"chr({ord(ch)})")
    if run:
        parts.append(f"'{run}'")
    return " || ".join(parts) if parts else "''"


def _sql_re(pat: str) -> str:
    """Regex → DuckDB literal.  DuckDB single-quoted strings are NOT
    escape-processed, so backslashes pass through to RE2 verbatim
    (RE2 reads the same ``\\xNN`` escapes Java does) — only quotes
    need doubling."""
    return "'" + pat.replace("'", "''") + "'"


def sniff_mime_sql(pages_sql: str, bin_expr: str = "payload",
                   ct_col: str = "content_type",
                   url_col: str = "url") -> str:
    """DuckDB mirror: the identical magic/tag/feed/binary ladder over
    the same latin-1 head text (``bin_expr`` must already be VARCHAR —
    the gate fixture builds the payload as text in both engines)."""
    magic = "\n    ".join(
        f"when starts_with(head, {_sql_quote(p)}) then '{m}'"
        for p, m in _MAGIC)
    disp = "\n    ".join(
        (f"when starts_with(sniffed_mime, '{p}') then '{r}'"
         if p.endswith("/") else
         f"when sniffed_mime = '{p}' then '{r}'")
        for p, r in DISPATCH)
    generic = ", ".join(f"'{g}'" for g in _GENERIC)
    rss, atom = _sql_re(_RSS_RE), _sql_re(_ATOM_RE)
    html, xml = _sql_re(_HTML_RE), _sql_re(_XML_RE)
    binre = ("'['||chr(1)||'-'||chr(8)||chr(11)||chr(14)||'-'||chr(26)"
             "||chr(28)||'-'||chr(31)||']'")
    return f"""
with sniffsrc as ({pages_sql}),
h as (
  select {url_col} as url, lower({ct_col}) as content_type,
         substring({bin_expr}, 1, 512) as head
  from sniffsrc
),
s as (
  select url, content_type, head,
    case
      when content_type is null or content_type in ({generic}) then
        case
          {magic}
          when regexp_matches(head, {rss}) then 'application/rss+xml'
          when regexp_matches(head, {atom}) then 'application/atom+xml'
          when regexp_matches(head, {html}) then 'text/html'
          when regexp_matches(head, {xml}) then 'text/xml'
          when regexp_matches(head, {binre}) then
            'application/octet-stream'
          else 'text/plain'
        end
      when content_type = 'text/html' then
        case
          when regexp_matches(head, {rss}) then 'application/rss+xml'
          when regexp_matches(head, {atom}) then 'application/atom+xml'
          else 'text/html'
        end
      when content_type = 'text/plain' then
        case when regexp_matches(head, {binre})
             then 'application/octet-stream' else 'text/plain' end
      else content_type
    end as sniffed_mime
  from h
)
select url, content_type, sniffed_mime,
  case
    {disp}
    else 'skip'
  end as dispatch
from s order by url
"""
