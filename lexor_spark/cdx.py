"""Common-Crawl CDX(J) index source.

Common Crawl publishes, besides the WARC payloads themselves, a
columnar *index*: CDXJ lines of the form

    <urlkey> <timestamp14> {"url": ..., "mime": ..., "status": ...,
                            "digest": ..., "length": ..., "offset": ...,
                            "filename": ...}

(SURT-reversed url key, 14-digit timestamp, JSON attributes).  Real
pipelines never scan the WARC petabytes blindly — they SELECT from the
CDX first (status/mime/language filters, latest capture per url) and
fetch only the chosen ``(filename, offset, length)`` ranges.  This
module provides that front door: a line parser that is pure scan-side
Catalyst (regex splits + ``get_json_object`` — JVM, no UDF) and a
fetch-list selector (filter → latest-capture-per-urlkey window, a
per-url key, never skewed).

Plan shape at scale: the index for a full crawl is ~10^10 lines — the
parser is a projection over ``spark.read.text`` (splittable files, no
shuffle); ``cdx_fetch_list`` adds one urlkey-partitioned window.  Both
are value-oracled in DuckDB (same regexes, same JSON extraction).
No reference counterpart (the reference converts single documents);
format per the public Common Crawl / pywb CDXJ documentation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["cdx_fixture_df", "CDX_FIXTURE_SQL", "parse_cdx",
           "parse_cdx_sql", "cdx_fetch_list", "cdx_fetch_list_sql",
           "write_fetch_list", "lookup_fetch", "urlkey_bucket",
           "N_URLKEY_BUCKETS", "cdx_diff", "cdx_diff_sql",
           "cdx_snapshot_df", "cdx_snapshot_sql"]


# ---------------------------------------------------------------------------
# deterministic CDXJ fixture (derived from the documents table, like the
# messy-URL fixture in __spark_entry__)
# ---------------------------------------------------------------------------

def cdx_fixture_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic CDXJ line per document: mixed status/mime,
    multiple captures for every 5th doc (tests latest-capture
    selection), offsets/lengths derived from doc fields."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    host = F.concat(F.lit("site"), (d % 97).cast("string"),
                    F.lit(".example"))
    urlkey = F.concat(F.lit("example,site"), (d % 97).cast("string"),
                      F.lit(")/"), F.col("source"), F.lit("/p"),
                      d.cast("string"))
    url = F.concat(F.lit("https://"), host, F.lit("/"), F.col("source"),
                   F.lit("/p"), d.cast("string"))

    def line(ts: Column, status: Column, offset: Column) -> Column:
        return F.concat(
            urlkey, F.lit(" "), ts, F.lit(" "),
            F.lit('{"url": "'), url,
            F.lit('", "mime": "'),
            F.when(d % 11 == 0, F.lit("application/pdf"))
             .otherwise(F.lit("text/html")),
            F.lit('", "status": "'), status,
            F.lit('", "digest": "'), F.md5(F.col("text")),
            F.lit('", "length": "'),
            F.length("text").cast("string"),
            F.lit('", "offset": "'), offset.cast("string"),
            F.lit('", "filename": "crawl-data/seg-'),
            (d % 10).cast("string"), F.lit('.warc.gz"}'))

    ts1 = F.concat(F.lit("202401"),
                   F.lpad((1 + d % 28).cast("string"), 2, "0"),
                   F.lit("120000"))
    ts2 = F.concat(F.lit("202402"),
                   F.lpad((1 + d % 28).cast("string"), 2, "0"),
                   F.lit("120000"))
    status1 = F.when(d % 7 == 0, F.lit("404")).otherwise(F.lit("200"))
    first = docs.select(line(ts1, status1, (d * 1311) % 100000)
                        .alias("cdx_line"))
    second = (docs.filter(d % 5 == 0)
              .select(line(ts2, F.lit("200"), (d * 2711) % 100000)
                      .alias("cdx_line")))
    return first.unionAll(second)


# plain constant spliced into the f-string below — single braces are
# literal here (only f-string/format TEMPLATES double them)
_LINE_SQL = """
    urlkey || ' ' || ts || ' ' ||
    '{"url": "' || url ||
    '", "mime": "' ||
    (case when doc_id % 11 = 0 then 'application/pdf'
          else 'text/html' end) ||
    '", "status": "' || status ||
    '", "digest": "' || md5(text) ||
    '", "length": "' || length(text) ||
    '", "offset": "' || "offset" ||
    '", "filename": "crawl-data/seg-' || (doc_id % 10) || '.warc.gz"}'
"""

CDX_FIXTURE_SQL = f"""
with base as (
  select doc_id, text,
         'example,site' || (doc_id % 97) || ')/' || source || '/p'
           || doc_id as urlkey,
         'https://site' || (doc_id % 97) || '.example/' || source
           || '/p' || doc_id as url
  from documents
),
cap1 as (
  select {_LINE_SQL} as cdx_line
  from (select *,
               '202401' || lpad((1 + doc_id % 28)::varchar, 2, '0')
                 || '120000' as ts,
               case when doc_id % 7 = 0 then '404' else '200' end
                 as status,
               ((doc_id * 1311) % 100000)::varchar as "offset"
        from base)
),
cap2 as (
  select {_LINE_SQL} as cdx_line
  from (select *,
               '202402' || lpad((1 + doc_id % 28)::varchar, 2, '0')
                 || '120000' as ts,
               '200' as status,
               ((doc_id * 2711) % 100000)::varchar as "offset"
        from base where doc_id % 5 = 0)
)
select cdx_line from cap1 union all select cdx_line from cap2
"""


# ---------------------------------------------------------------------------
# parser + selector
# ---------------------------------------------------------------------------

def parse_cdx(lines: DataFrame, line_col: str = "cdx_line") -> DataFrame:
    """Typed CDX records from raw CDXJ lines — pure scan-side
    expressions (two regex field splits + JVM ``get_json_object``).
    Malformed lines (no JSON object) yield null attribute columns
    rather than task failures."""
    c = F.col(line_col)
    js = F.regexp_extract(c, r"^\S+ \S+ (\{.*\})$", 1)
    j = F.when(js == "", None).otherwise(js)

    def attr(name: str) -> Column:
        return F.get_json_object(j, f"$.{name}")

    return lines.select(
        F.regexp_extract(c, r"^(\S+)", 1).alias("urlkey"),
        F.regexp_extract(c, r"^\S+ (\S+)", 1).alias("ts"),
        attr("url").alias("url"),
        attr("mime").alias("mime"),
        # try_cast, not cast: real Common-Crawl CDXJ has non-numeric
        # values here (revisit records carry status "-"), and under
        # ANSI mode a plain cast would fail the whole task instead of
        # honoring the malformed-lines-yield-nulls contract above
        attr("status").try_cast("int").alias("status"),
        attr("digest").alias("digest"),
        attr("length").try_cast("long").alias("length"),
        attr("offset").try_cast("long").alias("offset"),
        attr("filename").alias("filename"))


def parse_cdx_sql(lines_sql: str, line_col: str = "cdx_line") -> str:
    c = line_col
    return f"""
with lines as ({lines_sql}),
parsed as (
  select regexp_extract({c}, '^(\\S+)', 1) as urlkey,
         regexp_extract({c}, '^\\S+ (\\S+)', 1) as ts,
         case when regexp_extract({c}, '^\\S+ \\S+ (\\{{.*\\}})$', 1) = ''
              then null
              else regexp_extract({c}, '^\\S+ \\S+ (\\{{.*\\}})$', 1)
         end as j
  from lines
)
select urlkey, ts,
       json_extract_string(j, '$.url') as url,
       json_extract_string(j, '$.mime') as mime,
       try_cast(json_extract_string(j, '$.status') as int) as status,
       json_extract_string(j, '$.digest') as digest,
       try_cast(json_extract_string(j, '$.length') as bigint) as length,
       try_cast(json_extract_string(j, '$.offset') as bigint)
         as "offset",
       json_extract_string(j, '$.filename') as filename
from parsed
"""


def cdx_fetch_list(lines: DataFrame, mime: str = "text/html",
                   line_col: str = "cdx_line") -> DataFrame:
    """The WARC fetch list: parse → keep successful captures of the
    wanted mime → latest capture per urlkey (ties: highest offset) →
    (urlkey, url, ts, filename, offset, length).  The window partitions
    by urlkey — one url's captures, a handful of rows — so a hot domain
    never concentrates a task."""
    from pyspark.sql import Window
    rec = parse_cdx(lines, line_col=line_col)
    kept = rec.filter((F.col("status") == 200) & (F.col("mime") == mime))
    w = (Window.partitionBy("urlkey")
         .orderBy(F.desc("ts"), F.desc("offset")))
    return (kept.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("urlkey", "url", "ts", "filename", "offset", "length"))


def cdx_fetch_list_sql(lines_sql: str, mime: str = "text/html",
                       line_col: str = "cdx_line") -> str:
    inner = parse_cdx_sql(lines_sql, line_col=line_col)
    return f"""
with rec as ({inner}),
kept as (select * from rec
         where status = 200 and mime = '{mime}'),
ranked as (
  select *, row_number() over (partition by urlkey
                               order by ts desc, "offset" desc) as rn
  from kept
)
select urlkey, url, ts, filename, "offset", length
from ranked where rn = 1
"""


# ---------------------------------------------------------------------------
# urlkey-bucketed index storage + pruned point lookup
# ---------------------------------------------------------------------------
#
# A fetch list stored as flat parquet forces every index lookup to scan
# ALL shards — at a full crawl's ~10^10 lines that is the whole index
# per query.  Common Crawl itself ships the CDX sharded by urlkey range
# (cluster.idx) for exactly this reason.  Here the fetch list is written
# PARTITIONED by a bucket of the SURT host, where the bucket function is
# crc32(host) % n_buckets:
#
# * Spark computes it scan-side with the JVM ``crc32`` function (no UDF);
# * the LOOKUP side recomputes the same bucket driver-side with
#   ``zlib.crc32`` (both are CRC-32/ISO-HDLC over the UTF-8 bytes), so a
#   point/prefix query filters on the partition column with a CONSTANT
#   and Catalyst prunes to one directory (PartitionFilters in the scan,
#   EXPLAINS.md), plus pushes the urlkey prefix filter into the
#   row groups (PushedFilters: StringStartsWith).
#
# Bucket-by-hash (not by raw host) keeps directory cardinality fixed —
# a real crawl has ~10^8 hosts, which as raw partition values would
# explode the file count; n_buckets scales with the cluster instead.

N_URLKEY_BUCKETS = 16


def _surt_host(urlkey: Column) -> Column:
    """SURT host of a urlkey: everything before the first ``)``."""
    return F.substring_index(urlkey, ")", 1)


def urlkey_bucket(host: str, n_buckets: int = N_URLKEY_BUCKETS) -> int:
    """Driver-side mirror of the write-side bucket expression."""
    import zlib
    return zlib.crc32(host.encode("utf-8")) % n_buckets


def write_fetch_list(fetch: DataFrame, out_dir: str,
                     n_buckets: int = N_URLKEY_BUCKETS) -> None:
    """Persist a fetch list partitioned by ``urlkey_bucket`` so point
    lookups prune.  One shuffle-free pass: the bucket is a scan-side
    projection; parquet lays one directory per bucket."""
    (fetch
     .withColumn("urlkey_bucket",
                 F.pmod(F.crc32(_surt_host(F.col("urlkey"))),
                        F.lit(n_buckets)).cast("int"))
     .write.mode("overwrite")
     .partitionBy("urlkey_bucket")
     .parquet(out_dir))


def lookup_fetch(spark: SparkSession, index_dir: str, urlkey_prefix: str,
                 n_buckets: int = N_URLKEY_BUCKETS) -> DataFrame:
    """Pruned lookup: all fetch entries whose urlkey starts with
    ``urlkey_prefix``.  The prefix must include the full SURT host
    (everything before ``)``), because the bucket is a function of the
    host; the constant bucket filter prunes partitions, the prefix
    filter pushes into parquet row groups."""
    host = urlkey_prefix.split(")", 1)[0]
    b = urlkey_bucket(host, n_buckets)
    df = spark.read.parquet(index_dir)
    return (df.filter((F.col("urlkey_bucket") == b)
                      & F.col("urlkey").startswith(urlkey_prefix))
            .select("urlkey", "url", "ts", "filename", "offset", "length"))


# ---------------------------------------------------------------------------
# crawl-over-crawl snapshot diff
# ---------------------------------------------------------------------------

def _latest_with_digest(lines: DataFrame, mime: str,
                        line_col: str) -> DataFrame:
    """Latest successful capture per urlkey, KEEPING the payload digest
    (the fetch list drops it; the diff is digest-driven)."""
    from pyspark.sql import Window
    rec = parse_cdx(lines, line_col=line_col)
    kept = rec.filter((F.col("status") == 200) & (F.col("mime") == mime))
    w = (Window.partitionBy("urlkey")
         .orderBy(F.desc("ts"), F.desc("offset")))
    return (kept.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("urlkey", "url", "ts", "digest"))


def cdx_diff(old_lines: DataFrame, new_lines: DataFrame,
             mime: str = "text/html",
             line_col: str = "cdx_line") -> DataFrame:
    """(urlkey, url, change, old_digest, new_digest) between two crawl
    snapshots' CDX indexes: ``added`` (urlkey only in new), ``gone``
    (only in old), ``changed`` (digest moved), ``same``.  The incremental
    re-crawl driver: only ``added``/``changed`` rows need fetching and
    re-extraction, which at Common-Crawl cadence is a small fraction of
    the index.  One urlkey-keyed full outer join — both sides shuffle
    on the same key, co-partitioned; per-urlkey row counts are tiny, so
    no skew."""
    o = _latest_with_digest(old_lines, mime, line_col)
    n = _latest_with_digest(new_lines, mime, line_col)
    on = o.select(F.col("urlkey"), F.col("url").alias("o_url"),
                  F.col("digest").alias("old_digest"))
    nn = n.select(F.col("urlkey"), F.col("url").alias("n_url"),
                  F.col("digest").alias("new_digest"))
    j = on.join(nn, "urlkey", "full_outer")
    change = (F.when(F.col("old_digest").isNull(), "added")
              .when(F.col("new_digest").isNull(), "gone")
              .when(F.col("old_digest") != F.col("new_digest"), "changed")
              .otherwise("same"))
    return j.select(
        "urlkey",
        F.coalesce(F.col("n_url"), F.col("o_url")).alias("url"),
        change.alias("change"), "old_digest", "new_digest")


def _latest_with_digest_sql(lines_sql: str, mime: str,
                            line_col: str) -> str:
    inner = parse_cdx_sql(lines_sql, line_col=line_col)
    return f"""
select urlkey, url, ts, digest from (
  select *, row_number() over (partition by urlkey
                               order by ts desc, "offset" desc) as rn
  from ({inner}) where status = 200 and mime = '{mime}'
) where rn = 1
"""


def cdx_diff_sql(old_sql: str, new_sql: str, mime: str = "text/html",
                 line_col: str = "cdx_line") -> str:
    o = _latest_with_digest_sql(old_sql, mime, line_col)
    n = _latest_with_digest_sql(new_sql, mime, line_col)
    return f"""
with o as ({o}), n as ({n})
select coalesce(n.urlkey, o.urlkey) as urlkey,
       coalesce(n.url, o.url) as url,
       case when o.digest is null then 'added'
            when n.digest is null then 'gone'
            when o.digest <> n.digest then 'changed'
            else 'same' end as change,
       o.digest as old_digest, n.digest as new_digest
from o full outer join n on o.urlkey = n.urlkey
"""


def cdx_snapshot_df(spark: SparkSession, sf_dir: str,
                    which: str) -> DataFrame:
    """Deterministic two-crawl fixture: the 'old' snapshot misses every
    7th doc (they appear later → ``added``), the 'new' snapshot misses
    every 5th (→ ``gone``) and re-digests every 3rd (content moved →
    ``changed``); everything else is ``same``."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    if which == "old":
        docs = docs.filter(d % 7 != 6)
        ts = F.lit("20240115120000")
        digest = F.md5(F.col("text"))
    elif which == "new":
        docs = docs.filter(d % 5 != 4)
        ts = F.lit("20240315120000")
        digest = F.md5(F.when(d % 3 == 0, F.concat(F.col("text"),
                                                   F.lit("v2")))
                       .otherwise(F.col("text")))
    else:
        raise ValueError(f"which must be 'old'|'new', got {which!r}")
    host = F.concat(F.lit("site"), (d % 97).cast("string"),
                    F.lit(".example"))
    urlkey = F.concat(F.lit("example,site"), (d % 97).cast("string"),
                      F.lit(")/"), F.col("source"), F.lit("/p"),
                      d.cast("string"))
    url = F.concat(F.lit("https://"), host, F.lit("/"), F.col("source"),
                   F.lit("/p"), d.cast("string"))
    line = F.concat(
        urlkey, F.lit(" "), ts, F.lit(" "),
        F.lit('{"url": "'), url,
        F.lit('", "mime": "text/html", "status": "200", "digest": "'),
        digest,
        F.lit('", "length": "'), F.length("text").cast("string"),
        F.lit('", "offset": "'), ((d * 977) % 100000).cast("string"),
        F.lit('", "filename": "crawl-data/seg-'), (d % 10).cast("string"),
        F.lit('.warc.gz"}'))
    return docs.select(line.alias("cdx_line"))


def cdx_snapshot_sql(which: str) -> str:
    if which == "old":
        flt, ts, dg = "doc_id % 7 <> 6", "20240115120000", "md5(text)"
    elif which == "new":
        flt, ts = "doc_id % 5 <> 4", "20240315120000"
        dg = ("md5(case when doc_id % 3 = 0 then text || 'v2' "
              "else text end)")
    else:
        raise ValueError(f"which must be 'old'|'new', got {which!r}")
    return f"""
select 'example,site' || (doc_id % 97) || ')/' || source || '/p'
         || doc_id || ' {ts} ' ||
       '{{"url": "https://site' || (doc_id % 97) || '.example/'
         || source || '/p' || doc_id ||
       '", "mime": "text/html", "status": "200", "digest": "' || {dg} ||
       '", "length": "' || length(text) ||
       '", "offset": "' || ((doc_id * 977) % 100000) ||
       '", "filename": "crawl-data/seg-' || (doc_id % 10)
         || '.warc.gz"}}' as cdx_line
from documents where {flt}
"""
