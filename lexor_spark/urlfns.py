"""URL/domain operators for crawl pipelines.

The per-URL hygiene layer every web-scale corpus needs before content
work: host extraction, registrable-domain grouping, path-depth features,
and the per-domain cap (keep at most K pages per domain — the standard
anti-monoculture sampling step).  All pure Catalyst expressions with
exact DuckDB mirrors, so every operator is value-oracle-checked.

Scale notes (100 TB): host/domain/path are scan-side regexes (no
shuffle); per-domain stats are one map-side-combinable aggregate; the
domain cap is two-phase (cap within ``(domain, url-hash salt)``, then
re-cap the ≤ k·S survivors within ``domain``) so a mega-domain never
lands in a single window task — the result is provably identical to
the one-window cap (see :func:`domain_cap`).

The registrable domain is the last two dot-labels — the documented
approximation without a public-suffix list (a PSL join is data, not
engine work: broadcast-join the suffix table and strip accordingly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["host_of", "domain_of", "path_of", "path_depth", "is_https",
           "url_stats", "domain_cap", "url_filter", "url_filter_sql",
           "host_quality", "host_quality_sql",
           "host_filter_docs", "host_filter_docs_sql",
           "canonical_url", "url_canonicalize", "url_canonicalize_sql",
           "surt_key", "surt_keys", "surt_keys_sql",
           "SQL_URL"]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"


def host_of(url: Column) -> Column:
    """Lower-cased host: authority minus userinfo and port."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def domain_of(url: Column) -> Column:
    """Registrable domain ≈ last two labels of the host."""
    return F.regexp_extract(host_of(url), r"([^.]+\.[^.]+)$", 1)


def path_of(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def path_depth(url: Column) -> Column:
    """Number of non-empty path segments."""
    return F.size(F.filter(F.split(path_of(url), "/"),
                           lambda x: x != ""))


def is_https(url: Column) -> Column:
    return url.startswith("https://")


def url_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain corpus statistics (one hash aggregate)."""
    u = F.col(url_col)
    return (
        pages.select(domain_of(u).alias("domain"),
                     host_of(u).alias("host"),
                     path_depth(u).alias("depth"),
                     is_https(u).alias("https"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_urls"),
             F.countDistinct("host").alias("n_hosts"),
             F.round(F.avg("depth"), 4).alias("avg_depth"),
             F.sum(F.when(F.col("https"), 1).otherwise(0)).alias("n_https"))
        .orderBy("domain")
    )


def domain_cap(pages: DataFrame, k: int, url_col: str = "url",
               salt_buckets: int = 64) -> DataFrame:
    """Keep at most ``k`` pages per registrable domain, deterministic
    (ordered by url) — the anti-monoculture sampling primitive.

    Two-phase for skew: a raw ``Window.partitionBy(domain)`` puts a
    mega-domain's every page into ONE task.  Phase 1 ranks within
    ``(domain, salt)`` where ``salt = xxhash64(url) % S`` and keeps the
    k smallest urls per bucket (hot domains spread over S tasks); phase
    2 re-ranks the ≤ k·S survivors per domain and keeps k.  The result
    is IDENTICAL to the single-window cap: each of the global k
    smallest urls of a domain is among the k smallest of its own salt
    bucket, so it survives phase 1, and since every url smaller than a
    global top-k url is itself global top-k, the phase-2 row_number of
    the kept rows equals the single-window rank — which is why the
    DuckDB oracle can stay the plain one-window composition."""
    u = F.col(url_col)
    d = pages.withColumn("domain", domain_of(u))
    if salt_buckets and salt_buckets > 1:
        w1 = Window.partitionBy("domain", "_salt").orderBy(url_col)
        d = (d.withColumn("_salt", F.pmod(F.xxhash64(u),
                                          F.lit(salt_buckets)))
             .withColumn("_rn1", F.row_number().over(w1))
             .filter(F.col("_rn1") <= k)
             .drop("_salt", "_rn1"))
    w = Window.partitionBy("domain").orderBy(url_col)
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("domain", url_col, "rn")
    )


def host_quality(docs: DataFrame, min_docs: int = 2,
                 min_avg_chars: float = 100.0,
                 url_col: str = "url") -> DataFrame:
    """Per-HOST content-quality aggregates over a documents table that
    carries (url, lang, n_chars) — the host-level curation signal
    (RefinedWeb / C4 keep whole sites, not single pages: a host whose
    pages are uniformly short or too few is boilerplate/parked-domain
    shaped).  One map-side-combinable hash aggregate keyed on host —
    no window, no join; at 10^12 docs the combiner reduces each
    partition to its distinct hosts before the shuffle.  ``kept`` is
    the host-level verdict (≥ min_docs pages AND avg length ≥
    min_avg_chars) that :func:`host_filter_docs` applies back to rows.
    """
    u = F.col(url_col)
    return (docs
            .select(host_of(u).alias("host"), "lang", "n_chars")
            .groupBy("host")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                 F.sum("n_chars").alias("total_chars"))
            .withColumn("kept",
                        (F.col("n_docs") >= min_docs)
                        & (F.col("avg_chars") >= min_avg_chars))
            .orderBy("host"))


def host_quality_sql(table: str, url_expr: str, min_docs: int = 2,
                     min_avg_chars: float = 100.0) -> str:
    """DuckDB mirror of :func:`host_quality` (``url_expr`` is the SQL
    expression producing the url column from ``table``)."""
    host = (f"lower(regexp_extract({url_expr}, "
            f"'{_HOST_RE}', 1))")
    return (
        f"select {host} as host, count(*) as n_docs, "
        f"count(distinct lang) as n_langs, "
        f"round(avg(n_chars), 4) as avg_chars, "
        f"sum(n_chars)::bigint as total_chars, "
        f"(count(*) >= {min_docs} and round(avg(n_chars), 4) >= "
        f"{min_avg_chars}) as kept "
        f"from {table} group by 1 order by host")


def host_filter_docs(docs: DataFrame, min_docs: int = 2,
                     min_avg_chars: float = 100.0,
                     url_col: str = "url") -> DataFrame:
    """Row-level application of the host-level verdict: keep documents
    whose HOST passes :func:`host_quality` — aggregate once, then join
    the (small) kept-host set back to the doc table.  The kept-host
    side is hosts-not-docs sized, so it is explicitly ``broadcast`` —
    the filter-back is shuffle-free for the big side, and a mega-host's
    million rows never concentrate anywhere (each scan task probes the
    broadcast hash table locally).  Returns (doc_id, host) kept rows.
    """
    hosts = (host_quality(docs, min_docs, min_avg_chars, url_col)
             .filter("kept").select("host"))
    u = F.col(url_col)
    return (docs.select("doc_id", host_of(u).alias("host"))
            .join(F.broadcast(hosts), "host")
            .select("doc_id", "host")
            .orderBy("doc_id"))


def host_filter_docs_sql(table: str, url_expr: str, min_docs: int = 2,
                         min_avg_chars: float = 100.0) -> str:
    """DuckDB mirror of :func:`host_filter_docs`."""
    host = f"lower(regexp_extract({url_expr}, '{_HOST_RE}', 1))"
    return (
        f"with hq as (select {host} as host from {table} "
        f"group by 1 having count(*) >= {min_docs} "
        f"and round(avg(n_chars), 4) >= {min_avg_chars}), "
        f"d as (select doc_id, {host} as host from {table}) "
        f"select d.doc_id, d.host from d join hq using (host) "
        f"order by d.doc_id")


def url_filter(pages: DataFrame, blocked_domains: list[str] = (),
               keyword_weights: dict[str, float] = None,
               threshold: float = 1.0,
               url_col: str = "url") -> DataFrame:
    """RefinedWeb-style URL filtering (Penedo et al. 2023 §G.1): drop
    pages whose registrable domain is on a blocklist OR whose url
    accumulates too much soft-keyword weight (the public method scores
    substrings like "casino"/"download" and rejects above a threshold).

    Returns the surviving rows with ``url_score`` attached (audit
    column).  Both tests fold to scan-side expressions: the blocklist
    becomes a literal IN-set for small lists (broadcast a blocklist
    TABLE and left-anti-join for the million-entry case — same
    semantics, noted here rather than auto-switched so callers choose
    the plan), and the keyword score is a sum of ``contains`` flags ×
    weights — no shuffle, predicate reaches the scan."""
    u = F.col(url_col)
    lu = F.lower(u)
    score = F.lit(0.0)
    for kw, wgt in (keyword_weights or {}).items():
        score = score + F.when(lu.contains(kw.lower()),
                               F.lit(float(wgt))).otherwise(F.lit(0.0))
    out = pages.withColumn("url_score", F.round(score, 4))
    if blocked_domains:
        out = out.filter(~domain_of(u).isin([d.lower()
                                             for d in blocked_domains]))
    return out.filter(F.col("url_score") < threshold)


def url_filter_sql(table: str, blocked_domains: list[str] = (),
                   keyword_weights: dict[str, float] = None,
                   threshold: float = 1.0, url_col: str = "url") -> str:
    dom = SQL_URL.DOMAIN.format(u=url_col)
    terms = " + ".join(
        "case when contains(lower({u}), '{kw}') then {w!r} else 0.0 end"
        .format(u=url_col, kw=kw.lower().replace("'", "''"), w=float(wgt))
        for kw, wgt in (keyword_weights or {}).items()) or "0.0"
    block = ""
    if blocked_domains:
        lst = ", ".join("'" + d.lower().replace("'", "''") + "'"
                        for d in blocked_domains)
        block = f" and {dom} not in ({lst})"
    return (f"select * from (select *, round({terms}, 4)::double "
            f"as url_score "
            f"from {table}) where url_score < {threshold}{block}")


class SQL_URL:
    """DuckDB mirrors (format strings over the url column name)."""

    HOST = ("lower(regexp_extract({u}, "
            "'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))")
    DOMAIN = "regexp_extract(" + HOST + ", '([^.]+\\.[^.]+)$', 1)"
    PATH = ("regexp_extract({u}, "
            "'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1)")
    DEPTH = ("len(list_filter(string_split(" + PATH + ", '/'), "
             "x -> x != ''))")
    HTTPS = "starts_with({u}, 'https://')"


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------
# The normalization crawl pipelines apply BEFORE url-keyed work (dedup
# by url, frontier merging, per-domain caps): without it the same page
# appears under `HTTP://Site.com/a?utm_source=x` and `http://site.com/a`
# and every downstream url-keyed operator double-counts it.  The rules
# are the safe subset of RFC 3986 §6 normalization plus tracking-param
# removal (the "SafeURL"/common-crawl convention):
#
#   1. fragment dropped (`#...` never reaches the server);
#   2. scheme and authority lower-cased, default ports stripped
#      (`:80` for http, `:443` for https);
#   3. empty path → `/`;
#   4. tracking query params removed (utm_*, gclid, fbclid, msclkid,
#      mc_cid, mc_eid, igshid, ref);
#   5. surviving query params sorted (binary collation) — param order
#      is almost never semantic, and sorting makes equal resources
#      compare equal;
#   6. empty surviving query → no `?`.
#
# Pure Catalyst expressions (regex + array HOFs) with an exact DuckDB
# mirror — value-oracle-checked; zero shuffle (scan → project).

_TRACKING_RE = (
    "^(utm_[^=&]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref)(=|$)")
_AUTH_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules above."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    base = F.regexp_extract(nofrag, r"^([^?]*)", 1)
    query = F.regexp_extract(nofrag, r"^[^?]*\?(.*)$", 1)
    auth = F.lower(F.regexp_extract(base, _AUTH_RE, 1))
    auth = F.regexp_replace(auth, "^(http://[^/:]*):80$", "$1")
    auth = F.regexp_replace(auth, "^(https://[^/:]*):443$", "$1")
    path = F.regexp_extract(base, _AUTH_RE + "(.*)$", 2)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_join(
        F.array_sort(F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE))), "&")
    return F.when(
        auth == "", url,  # not an absolute URL: leave untouched
    ).otherwise(F.concat(
        auth, path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                           params))))


def url_canonicalize(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, canon_url, changed) per page — scan → project, no
    shuffle; feed ``canon_url`` to `domain_cap`/dedup-by-url instead of
    the raw column."""
    u = F.col(url_col)
    canon = canonical_url(u)
    return pages.select(u.alias("url"), canon.alias("canon_url"),
                        (canon != u).alias("changed"))


def url_canonicalize_sql(table: str, url_col: str = "url") -> str:
    """DuckDB mirror of :func:`url_canonicalize` (RE2 backrefs use
    ``\\1``; semantics identical)."""
    u = url_col
    # DuckDB regexp_extract yields NULL (not '') on no match — coalesce
    # everywhere Spark's '' convention is relied on.
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    base = f"coalesce(regexp_extract({nofrag}, '^([^?]*)', 1), '')"
    query = (f"coalesce(regexp_extract({nofrag}, "
             f"'^[^?]*\\?(.*)$', 1), '')")
    auth0 = (f"lower(coalesce(regexp_extract({base}, "
             f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1), ''))")
    auth = (f"regexp_replace(regexp_replace({auth0}, "
            f"'^(http://[^/:]*):80$', '\\1'), "
            f"'^(https://[^/:]*):443$', '\\1')")
    path0 = (f"coalesce(regexp_extract({base}, "
             f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1), '')")
    path = f"(case when {path0} = '' then '/' else {path0} end)"
    # array_to_string([]) is NULL in DuckDB (Spark's array_join is '')
    params = (f"coalesce(array_to_string(list_sort(list_filter("
              f"string_split({query}, '&'), "
              f"p -> p <> '' and not regexp_matches(p, "
              f"'{_TRACKING_RE}'))), '&'), '')")
    canon = (f"(case when {auth} = '' then {u} else "
             f"{auth} || {path} || "
             f"(case when {params} = '' then '' else '?' || {params} end)"
             f" end)")
    return (f"select {u} as url, {canon} as canon_url, "
            f"({canon} <> {u}) as changed from {table}")


# ---------------------------------------------------------------------------
# SURT keys (Sort-friendly URI Reordering Transform)
# ---------------------------------------------------------------------------

# The key form web archives actually index by: Heritrix/OpenWayback SURT
# with Common-Crawl-style canonicalization (lowercase, scheme dropped,
# leading www. stripped, host labels reversed comma-joined, default
# ports dropped, fragment dropped, query params sorted) — e.g.
#   https://WWW.Example.com/A/b?z=1&a=2#f  →  com,example)/a/b?a=2&z=1
# Reversed-host keys make every page of a site (and of its subdomains)
# lexicographically adjacent, which is what lets a petabyte CDX index
# range-prune lookups (`cdx.lookup_fetch`) and lets per-site operators
# range-partition without a host hash.  Public format: the SURT spec in
# Heritrix docs + the Common Crawl index's urlkey field.

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_SURT_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_SURT_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)"
_SURT_REST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"


def surt_key(url: Column) -> Column:
    """The SURT urlkey Column for an absolute http(s)-style URL; NULL
    for anything that doesn't parse as ``scheme://host...``."""
    u = F.lower(F.trim(url))
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    host = F.regexp_extract(u, _SURT_HOST_RE, 1)
    port = F.regexp_extract(u, _SURT_PORT_RE, 1)
    rest = F.regexp_extract(u, _SURT_REST_RE, 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    default = ((scheme == "http") & (port == "80")) | \
              ((scheme == "https") & (port == "443"))
    portpart = F.when((port == "") | default, F.lit("")) \
                .otherwise(F.concat(F.lit(":"), port))
    q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")),
        "&")
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(host == "", F.lit(None).cast("string")).otherwise(
        F.concat(rev, portpart, F.lit(")"), path, qpart))


def surt_keys(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, urlkey) per page — scan → project, no shuffle.  Feed
    ``urlkey`` to the CDX writer (`cdx.write_fetch_list` buckets by
    urlkey prefix) and to range-partitioned per-site operators."""
    u = F.col(url_col)
    return pages.select(u.alias("url"), surt_key(u).alias("urlkey"))


def surt_keys_sql(table: str, url_col: str = "url") -> str:
    """DuckDB mirror of :func:`surt_keys` (same regexes; string_split
    with a literal separator mirrors Spark's ``split('\\\\.')``)."""
    u = f"lower(trim({url_col}))"
    scheme = f"coalesce(regexp_extract({u}, '{_SCHEME_RE}', 1), '')"
    host0 = f"coalesce(regexp_extract({u}, '{_SURT_HOST_RE}', 1), '')"
    host = f"regexp_replace({host0}, '^www\\.', '')"
    port = f"coalesce(regexp_extract({u}, '{_SURT_PORT_RE}', 1), '')"
    rest = f"coalesce(regexp_extract({u}, '{_SURT_REST_RE}', 1), '')"
    path0 = f"coalesce(regexp_extract({rest}, '^([^?]*)', 1), '')"
    path = f"(case when {path0} = '' then '/' else {path0} end)"
    query = f"coalesce(regexp_extract({rest}, '\\?(.*)$', 1), '')"
    rev = (f"array_to_string(list_reverse(string_split({host}, '.')), "
           f"',')")
    default = (f"(({scheme} = 'http' and {port} = '80') or "
               f"({scheme} = 'https' and {port} = '443'))")
    portpart = (f"(case when {port} = '' or {default} then '' "
                f"else ':' || {port} end)")
    q = (f"coalesce(array_to_string(list_sort(list_filter("
         f"string_split({query}, '&'), p -> p <> '')), '&'), '')")
    qpart = f"(case when {q} = '' then '' else '?' || {q} end)"
    key = (f"(case when {host} = '' then null else "
           f"{rev} || {portpart} || ')' || {path} || {qpart} end)")
    return f"select {url_col} as url, {key} as urlkey from {table}"
