"""HTTP response-header parsing as Catalyst column expressions.

A crawl's fetch layer stores the raw response header block next to the
payload (WARC response records do exactly this — see
:mod:`lexor_spark.warc`, which parses them Python-side INSIDE record
splitting).  Corpus-side, the same fields are needed relationally —
status-code distributions, content-type filtering, redirect-edge
construction — so this module re-expresses the parse as pure scan-side
regex columns: no UDF, no shuffle, whole-stage codegen, and an exact
DuckDB mirror (Java regex and RE2 agree on this subset, including
``(?i)`` case-insensitivity — header names are case-insensitive per
RFC 9110 §5.1).

``redirect_edges`` turns parsed 3xx responses into the (src, dst) hop
table :func:`lexor_spark.graph.resolve_redirects` consumes — the
Location header resolved against the request URL for the two forms
that cover real traffic (absolute URL, absolute path); other relative
forms yield NULL and are dropped (crawlers re-enqueue those through
the full resolver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_http_headers", "parse_http_headers_sql",
           "redirect_edges"]

_STATUS_RE = r"^HTTP/[0-9.]+ ([0-9]{3})"
_CTYPE_RE = r"(?i)(?:^|\n)content-type:[ \t]*([^;\r\n]*[^;\r\n \t])"
_CHARSET_RE = r"(?i)charset=\"?([A-Za-z0-9_.:-]+)"
_LOCATION_RE = r"(?i)(?:^|\n)location:[ \t]*([^\r\n \t]+)"
_CLEN_RE = r"(?i)(?:^|\n)content-length:[ \t]*([0-9]+)"


def _extract(col: Column, pattern: str) -> Column:
    return F.regexp_extract(col, pattern, 1)


def parse_http_headers(responses: DataFrame, url_col: str = "url",
                       headers_col: str = "headers") -> DataFrame:
    """Per response: ``status`` (int; NULL if the status line is
    unparseable), ``content_type`` (lower-cased mime, parameters
    stripped), ``charset`` (lower-cased, from the Content-Type
    parameter), ``location`` (verbatim), ``content_length`` (bigint),
    ``is_redirect`` (3xx AND a Location present).  Empty extracts
    become NULL so downstream filters read naturally."""
    h = F.col(headers_col)
    status = F.nullif(_extract(h, _STATUS_RE), F.lit("")).cast("int")
    ctype = F.nullif(F.lower(_extract(h, _CTYPE_RE)), F.lit(""))
    charset = F.nullif(F.lower(_extract(h, _CHARSET_RE)), F.lit(""))
    location = F.nullif(_extract(h, _LOCATION_RE), F.lit(""))
    clen = F.nullif(_extract(h, _CLEN_RE), F.lit("")).cast("bigint")
    return responses.select(
        F.col(url_col).alias("url"),
        status.alias("status"),
        ctype.alias("content_type"),
        charset.alias("charset"),
        location.alias("location"),
        clen.alias("content_length"),
        (F.coalesce(status.between(300, 399), F.lit(False))
         & location.isNotNull()).alias("is_redirect"),
    ).orderBy("url")


def parse_http_headers_sql(responses_sql: str, url_col: str = "url",
                           headers_col: str = "headers") -> str:
    """DuckDB mirror of :func:`parse_http_headers`."""
    h = headers_col
    return f"""
with httpsrc as ({responses_sql}),
x as (select {url_col} as url,
  nullif(regexp_extract({h}, '{_STATUS_RE}', 1), '')::int as status,
  nullif(lower(regexp_extract({h}, '{_CTYPE_RE}', 1)), '')
    as content_type,
  nullif(lower(regexp_extract({h}, '{_CHARSET_RE}', 1)), '') as charset,
  nullif(regexp_extract({h}, '{_LOCATION_RE}', 1), '') as location,
  nullif(regexp_extract({h}, '{_CLEN_RE}', 1), '')::bigint
    as content_length
from httpsrc)
select url, status, content_type, charset, location, content_length,
       coalesce(status between 300 and 399, false)
         and location is not null as is_redirect
from x order by url
"""


def redirect_edges(responses: DataFrame, url_col: str = "url",
                   headers_col: str = "headers") -> DataFrame:
    """(src, dst) redirect hop table from parsed 3xx responses, ready
    for :func:`lexor_spark.graph.resolve_redirects`.  Location forms
    resolved scan-side: absolute URL (kept verbatim) and absolute path
    (scheme+host taken from the request URL); anything else → dropped."""
    parsed = parse_http_headers(responses, url_col, headers_col)
    origin = F.regexp_extract("url", r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    loc = F.col("location")
    dst = (F.when(loc.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), loc)
           .when(loc.startswith("/"), F.concat(origin, loc)))
    return (parsed.filter("is_redirect")
            .select(F.col("url").alias("src"), dst.alias("dst"))
            .filter(F.col("dst").isNotNull()))
