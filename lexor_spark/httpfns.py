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


# ---------------------------------------------------------------------------
# HTTP caching / revalidation planning (RFC 9111)
# ---------------------------------------------------------------------------

_DATE_HDR_RE = r"(?i)(?:^|\n)date:[ \t]*([^\r\n]+[^\r\n \t])"
_EXPIRES_RE = r"(?i)(?:^|\n)expires:[ \t]*([^\r\n]+[^\r\n \t])"
_LASTMOD_RE = r"(?i)(?:^|\n)last-modified:[ \t]*([^\r\n]+[^\r\n \t])"
_ETAG_RE = r"(?i)(?:^|\n)etag:[ \t]*([^\r\n]+[^\r\n \t])"
_AGE_RE = r"(?i)(?:^|\n)age:[ \t]*([0-9]+)"
_CC_RE = r"(?i)(?:^|\n)cache-control:[ \t]*([^\r\n]+[^\r\n \t])"
_MAXAGE_RE = r"(?i)max-age=([0-9]+)"
_NOSTORE_RE = r"(?i)\bno-store\b"
_NOCACHE_RE = r"(?i)\bno-cache\b"

# HTTP-dates (IMF-fixdate, RFC 9110 §5.6.7): the weekday token is
# stripped before parsing because Spark 3+ bans 'E' as a *parse*
# letter; DuckDB mirrors with try_strptime.  Both parsers read English
# month names, and every emitted quantity is a timestamp DIFFERENCE,
# so the engines' session-timezone choice cancels exactly.
_TS_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"
_TS_FMT_DUCK = "%d %b %Y %H:%M:%S GMT"


def _http_ts(col: Column) -> Column:
    stripped = F.regexp_replace(F.trim(col), r"^[A-Za-z]+, ", "")
    return F.try_to_timestamp(stripped, F.lit(_TS_FMT)).cast("long")


def cache_plan(responses: DataFrame, now: str, url_col: str = "url",
               headers_col: str = "headers") -> DataFrame:
    """Per cached response, the RFC 9111 revalidation decision a
    recrawler makes at time ``now`` (an IMF-fixdate string): current
    age (§4.2.3: Age header + residence time since Date), freshness
    lifetime (§4.2.1: ``max-age``, else ``Expires - Date``, else the
    §4.2.2 heuristic — 10% of ``Date - Last-Modified``), and the
    action — ``serve_cached`` while fresh, ``revalidate_etag`` /
    ``revalidate_lm`` when a validator exists (conditional GETs are
    what keep a 10^12-page recrawl bandwidth-bound instead of
    payload-bound), ``refetch`` otherwise; ``no-store`` always
    refetches, ``no-cache`` always revalidates.  Pure scan-side
    regex + timestamp arithmetic: no UDF, no shuffle."""
    h = F.col(headers_col)
    now_s = _http_ts(F.lit(now))
    date_s = _http_ts(F.nullif(F.regexp_extract(h, _DATE_HDR_RE, 1),
                               F.lit("")))
    exp_s = _http_ts(F.nullif(F.regexp_extract(h, _EXPIRES_RE, 1),
                              F.lit("")))
    lm_s = _http_ts(F.nullif(F.regexp_extract(h, _LASTMOD_RE, 1),
                             F.lit("")))
    etag = F.nullif(F.regexp_extract(h, _ETAG_RE, 1), F.lit(""))
    age_hdr = F.coalesce(
        F.nullif(F.regexp_extract(h, _AGE_RE, 1), F.lit(""))
         .cast("long"), F.lit(0))
    cc = F.regexp_extract(h, _CC_RE, 1)
    max_age = F.nullif(F.regexp_extract(cc, _MAXAGE_RE, 1),
                       F.lit("")).cast("long")
    no_store = cc.rlike(_NOSTORE_RE)
    no_cache = cc.rlike(_NOCACHE_RE)
    age_s = age_hdr + F.greatest(F.coalesce(now_s - date_s, F.lit(0)),
                                 F.lit(0))
    lifetime_s = (
        F.when(max_age.isNotNull(), max_age)
        .when(exp_s.isNotNull() & date_s.isNotNull(),
              F.greatest(exp_s - date_s, F.lit(0)))
        .when(lm_s.isNotNull() & date_s.isNotNull(),
              F.floor(F.greatest(date_s - lm_s, F.lit(0)) / 10)
               .cast("long"))
        .otherwise(F.lit(0)))
    fresh = lifetime_s > age_s
    action = (
        F.when(no_store, "refetch")
        .when(no_cache & etag.isNotNull(), "revalidate_etag")
        .when(no_cache & lm_s.isNotNull(), "revalidate_lm")
        .when(no_cache, "refetch")
        .when(fresh, "serve_cached")
        .when(etag.isNotNull(), "revalidate_etag")
        .when(lm_s.isNotNull(), "revalidate_lm")
        .otherwise("refetch"))
    return responses.select(
        F.col(url_col).alias("url"),
        age_s.alias("age_s"),
        lifetime_s.alias("lifetime_s"),
        fresh.alias("fresh"),
        no_store.alias("no_store"),
        action.alias("action"),
        etag.alias("etag"),
    ).orderBy("url")


def cache_plan_sql(responses_sql: str, now: str, url_col: str = "url",
                   headers_col: str = "headers") -> str:
    """DuckDB mirror of :func:`cache_plan` (identical regex ladder +
    the same difference-only timestamp arithmetic)."""
    h = headers_col

    def ts(expr: str) -> str:
        return ("epoch(try_strptime(regexp_replace(trim(" + expr +
                "), '^[A-Za-z]+, ', ''), '" + _TS_FMT_DUCK +
                "'))::bigint")

    return f"""
with cachesrc as ({responses_sql}),
x as (
  select {url_col} as url,
    {ts(f"nullif(regexp_extract({h}, '{_DATE_HDR_RE}', 1), '')")}
      as date_s,
    {ts(f"nullif(regexp_extract({h}, '{_EXPIRES_RE}', 1), '')")}
      as exp_s,
    {ts(f"nullif(regexp_extract({h}, '{_LASTMOD_RE}', 1), '')")}
      as lm_s,
    {ts(f"'{now}'")} as now_s,
    nullif(regexp_extract({h}, '{_ETAG_RE}', 1), '') as etag,
    coalesce(nullif(regexp_extract({h}, '{_AGE_RE}', 1), '')::bigint, 0)
      as age_hdr,
    regexp_extract({h}, '{_CC_RE}', 1) as cc
  from cachesrc
),
y as (
  select *,
    nullif(regexp_extract(cc, '{_MAXAGE_RE}', 1), '')::bigint as max_age,
    regexp_matches(cc, '{_NOSTORE_RE}') as no_store,
    regexp_matches(cc, '{_NOCACHE_RE}') as no_cache,
    age_hdr + greatest(coalesce(now_s - date_s, 0), 0) as age_s
  from x
),
z as (
  select *,
    case
      when max_age is not null then max_age
      when exp_s is not null and date_s is not null
        then greatest(exp_s - date_s, 0)
      when lm_s is not null and date_s is not null
        then greatest(date_s - lm_s, 0) // 10
      else 0
    end as lifetime_s
  from y
)
select url, age_s, lifetime_s, lifetime_s > age_s as fresh, no_store,
  case
    when no_store then 'refetch'
    when no_cache and etag is not null then 'revalidate_etag'
    when no_cache and lm_s is not null then 'revalidate_lm'
    when no_cache then 'refetch'
    when lifetime_s > age_s then 'serve_cached'
    when etag is not null then 'revalidate_etag'
    when lm_s is not null then 'revalidate_lm'
    else 'refetch'
  end as action,
  etag
from z order by url
"""
