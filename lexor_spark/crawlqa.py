"""Crawl quality assurance: soft-404 detection + crawl-trap detection.

Two QA signals every production crawl computes before content enters a
training corpus:

* **Soft 404s** — servers that answer HTTP 200 with an error page
  ("page not found", "no longer available").  They poison dedup (one
  error template fans out under thousands of URLs) and waste tokens.
  The classical detector (Bar-Yossef et al., "Sic transit gloria
  telae", WWW 2004) fetches a random sibling URL; at corpus scale the
  standard offline proxy is a content-side heuristic: error-phrase
  hits on the EXTRACTED text plus a short-body prior.  Pure scan-side
  Catalyst expressions — no shuffle, no UDF — with an exact DuckDB
  mirror, so the gate value-checks it.

* **Crawl traps** — hosts whose URL space explodes combinatorially
  (calendar pages, faceted search, path-loop redirects like
  ``/a/b/a/b/…``).  The per-host fingerprint is computable from the
  frontier's URL list alone: path depth distribution, fraction of
  URLs with a REPEATED path segment (the loop signature), query-param
  fraction.  One host-keyed hash aggregate over scan-side derived
  columns; hot hosts are exactly what it measures, and a host's rows
  reduce to one output row via map-side partial aggregation, so the
  shuffle moves per-(host, partition) partials, not URLs — safe at
  10^12 frontier rows.

Reference behaviours mirrored from the public literature (Bar-Yossef
et al. 2004; Heydon & Najork, "Mercator: a scalable, extensible web
crawler", 1999 §3 on URL-seen tests and trap avoidance) — the lexor
reference itself is a single-document converter with no crawl layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lexor_spark.urlfns import SQL_URL, host_of, path_of

__all__ = ["SOFT404_PHRASES", "soft404_score", "soft404_score_sql",
           "crawl_traps", "crawl_traps_sql",
           "truncated_fetch", "truncated_fetch_sql"]


# ---------------------------------------------------------------------------
# Soft-404 detection
# ---------------------------------------------------------------------------

# Phrases checked case-insensitively against the extracted text.  Kept
# short and high-precision; the score is the number of DISTINCT phrases
# present (substring containment, not regex — cheap and identical on
# both engines).
SOFT404_PHRASES = (
    "page not found",
    "404",
    "does not exist",
    "no longer available",
    "been removed",
    "page you requested",
    "page you are looking for",
)

SOFT404_SHORT_LEN = 400  # bodies under this length get the short prior


def _phrase_hits(low: Column) -> Column:
    hits = F.lit(0)
    for p in SOFT404_PHRASES:
        hits = hits + F.when(low.contains(p), 1).otherwise(0)
    return hits


def soft404_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  short_len: int = SOFT404_SHORT_LEN) -> DataFrame:
    """Per-document soft-404 signals: distinct error-phrase hits on the
    lower-cased text, body length, a 0-10 integer score (2 per phrase
    + 3 if short, capped), and the keep/drop verdict
    (≥1 phrase AND (short OR ≥2 phrases) — one phrase alone in a long
    article is usually the article TALKING about 404s).

    Scan → project only: no shuffle, no UDF; the phrase loop unrolls to
    a fixed Catalyst expression tree inside whole-stage codegen."""
    low = F.lower(F.col(text_col))
    hits = _phrase_hits(low)
    short = F.length(F.col(text_col)) < short_len
    score = F.least(hits * 2 + F.when(short, 3).otherwise(0), F.lit(10))
    flag = (hits >= 1) & (short | (hits >= 2))
    return docs.select(
        F.col(id_col),
        hits.alias("phrase_hits"),
        F.length(F.col(text_col)).alias("text_len"),
        score.alias("soft404_score"),
        flag.alias("is_soft404"),
    ).orderBy(id_col)


def soft404_score_sql(docs_sql: str, id_col: str = "doc_id",
                      text_col: str = "text",
                      short_len: int = SOFT404_SHORT_LEN) -> str:
    """DuckDB mirror of :func:`soft404_score` over a SELECT producing
    (id_col, text_col)."""
    hits = " + ".join(
        f"(case when contains(lower({text_col}), '{p}') then 1 else 0 end)"
        for p in SOFT404_PHRASES)
    return f"""
with d as ({docs_sql}),
s as (select {id_col}, ({hits}) as phrase_hits,
             length({text_col}) as text_len,
             length({text_col}) < {short_len} as short
      from d)
select {id_col}, phrase_hits, text_len,
       least(phrase_hits * 2 + (case when short then 3 else 0 end), 10)
         as soft404_score,
       (phrase_hits >= 1 and (short or phrase_hits >= 2)) as is_soft404
from s order by {id_col}
"""


# ---------------------------------------------------------------------------
# Crawl-trap detection
# ---------------------------------------------------------------------------

TRAP_MAX_DEPTH = 6      # any URL at/deeper than this trips the depth signal
TRAP_REPEAT_FRAC = 0.2  # repeated-segment URL fraction that trips the flag


def crawl_traps(urls: DataFrame, url_col: str = "url",
                max_depth: int = TRAP_MAX_DEPTH,
                repeat_frac: float = TRAP_REPEAT_FRAC) -> DataFrame:
    """Per-host crawl-trap fingerprint over a frontier URL list:
    ``n_urls``, ``avg_depth``/``max_depth`` of non-empty path segments,
    ``repeat_frac`` (URLs whose path REPEATS a segment — the
    ``/a/b/a/b`` loop signature), ``query_frac`` (faceted-search
    signature), and the trap verdict: some URL at/deeper than
    ``max_depth`` AND repeated-segment fraction ≥ ``repeat_frac``.

    All per-URL columns are scan-side (regex extract + array HOFs in
    codegen); ONE host-keyed hash aggregate follows — partial
    aggregation collapses a mega-host map-side, so the exchange moves
    one partial row per (host, partition)."""
    u = F.col(url_col)
    segs = F.filter(F.split(path_of(u), "/"), lambda x: x != "")
    depth = F.size(segs)
    rep = depth > F.size(F.array_distinct(segs))
    per_url = urls.select(
        host_of(u).alias("host"),
        depth.alias("depth"),
        rep.alias("rep"),
        u.contains("?").alias("has_q"))
    return (per_url.groupBy("host")
            .agg(F.count("*").alias("n_urls"),
                 F.round(F.avg("depth"), 6).alias("avg_depth"),
                 F.max("depth").alias("max_depth"),
                 F.round(F.avg(F.when(F.col("rep"), 1.0).otherwise(0.0)),
                         6).alias("repeat_frac"),
                 F.round(F.avg(F.when(F.col("has_q"), 1.0).otherwise(0.0)),
                         6).alias("query_frac"))
            .withColumn("is_trap",
                        (F.col("max_depth") >= max_depth)
                        & (F.col("repeat_frac") >= repeat_frac))
            .orderBy("host"))


def crawl_traps_sql(urls_sql: str, url_col: str = "url",
                    max_depth: int = TRAP_MAX_DEPTH,
                    repeat_frac: float = TRAP_REPEAT_FRAC) -> str:
    """DuckDB mirror of :func:`crawl_traps`."""
    path = SQL_URL.PATH.format(u=url_col)
    host = SQL_URL.HOST.format(u=url_col)
    return f"""
with u as ({urls_sql}),
p as (select {host} as host,
             list_filter(string_split({path}, '/'), x -> x != '') as segs,
             contains({url_col}, '?') as has_q
      from u),
f as (select host, len(segs) as depth,
             len(segs) > len(list_distinct(segs)) as rep, has_q
      from p),
a as (select host, count(*) as n_urls,
             round(avg(depth), 6) as avg_depth,
             max(depth) as max_depth,
             round(avg(case when rep then 1.0 else 0.0 end), 6)
               as repeat_frac,
             round(avg(case when has_q then 1.0 else 0.0 end), 6)
               as query_frac
      from f group by host)
select host, n_urls, avg_depth, max_depth, repeat_frac, query_frac,
       (max_depth >= {max_depth} and repeat_frac >= {repeat_frac})
         as is_trap
from a order by host
"""


# ---------------------------------------------------------------------------
# Truncated/overlong fetch detection
# ---------------------------------------------------------------------------

_TF_CLEN_RE = r"(?i)(?:^|\n)content-length:[ \t]*([0-9]+)"


def truncated_fetch(responses: DataFrame, url_col: str = "url",
                    headers_col: str = "headers",
                    payload_col: str = "payload") -> DataFrame:
    """Per fetch: does the stored payload match the declared
    Content-Length?  Truncated bodies (connection cut, crawler byte
    cap) are the silent extraction poison — a half page parses fine
    and yields confidently wrong text — and overlong bodies signal
    chunked-encoding bugs in the fetch layer.  Output: url,
    content_length (NULL when undeclared), actual_bytes, verdict
    ('ok' / 'truncated' / 'overlong' / 'undeclared'), completeness
    (actual/declared, 4 dp, NULL when undeclared).  Pure scan-side
    arithmetic; at 10^12 fetches this rides the payload scan."""
    h = F.col(headers_col)
    clen = F.nullif(F.regexp_extract(h, _TF_CLEN_RE, 1),
                    F.lit("")).cast("bigint")
    actual = F.coalesce(F.length(F.col(payload_col)),
                        F.lit(0)).cast("bigint")
    verdict = (F.when(clen.isNull(), "undeclared")
               .when(actual < clen, "truncated")
               .when(actual > clen, "overlong")
               .otherwise("ok"))
    ratio = F.when(clen > 0, F.round(actual / clen.cast("double"), 4))
    return responses.select(
        F.col(url_col).alias("url"),
        clen.alias("content_length"),
        actual.alias("actual_bytes"),
        verdict.alias("verdict"),
        ratio.alias("completeness"),
    ).orderBy("url")


def truncated_fetch_sql(responses_sql: str, url_col: str = "url",
                        headers_col: str = "headers",
                        payload_expr: str = "payload") -> str:
    """DuckDB mirror (fixtures keep payloads ASCII so character length
    equals byte length in both engines)."""
    return f"""
with tfsrc as ({responses_sql}),
x as (
  select {url_col} as url,
    nullif(regexp_extract({headers_col}, '{_TF_CLEN_RE}', 1), '')::bigint
      as content_length,
    coalesce(length({payload_expr}), 0)::bigint as actual_bytes
  from tfsrc
)
select url, content_length, actual_bytes,
  case when content_length is null then 'undeclared'
       when actual_bytes < content_length then 'truncated'
       when actual_bytes > content_length then 'overlong'
       else 'ok' end as verdict,
  case when content_length > 0
       then round(actual_bytes / content_length::double, 4) end
    as completeness
from x order by url
"""
