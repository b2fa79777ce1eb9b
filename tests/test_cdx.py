"""CDX(J) index source: parser, fetch-list selection, hostile lines."""

from __future__ import annotations

from pyspark.sql import functions as F

from lexor_spark import cdx


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "cdx_line string")


GOOD = ('com,example)/a 20240101120000 {"url": "https://example.com/a", '
        '"mime": "text/html", "status": "200", "digest": "d1", '
        '"length": "100", "offset": "5", "filename": "seg-1.warc.gz"}')
LATER = ('com,example)/a 20240301120000 {"url": "https://example.com/a", '
         '"mime": "text/html", "status": "200", "digest": "d2", '
         '"length": "120", "offset": "9", "filename": "seg-2.warc.gz"}')
NOTFOUND = ('com,example)/b 20240101120000 {"url": "https://example.com/b", '
            '"mime": "text/html", "status": "404", "digest": "d3", '
            '"length": "50", "offset": "1", "filename": "seg-1.warc.gz"}')
PDF = ('com,example)/c 20240101120000 {"url": "https://example.com/c", '
       '"mime": "application/pdf", "status": "200", "digest": "d4", '
       '"length": "70", "offset": "2", "filename": "seg-1.warc.gz"}')


def test_parse_typed_fields(spark):
    out = cdx.parse_cdx(_lines(spark, [GOOD])).collect()[0]
    assert out.urlkey == "com,example)/a"
    assert out.ts == "20240101120000"
    assert out.url == "https://example.com/a"
    assert out.status == 200 and out.length == 100 and out.offset == 5
    assert out.filename == "seg-1.warc.gz"


def test_parse_malformed_lines_yield_nulls_not_failures(spark):
    rows = ["", "garbage", "key 20240101120000 not-json",
            "key 20240101120000"]
    out = cdx.parse_cdx(_lines(spark, rows)).collect()
    assert len(out) == 4
    assert all(r.url is None and r.status is None for r in out)


def test_fetch_list_latest_capture_and_filters(spark):
    out = cdx.cdx_fetch_list(
        _lines(spark, [GOOD, LATER, NOTFOUND, PDF])).collect()
    assert len(out) == 1                     # 404 and pdf filtered out
    r = out[0]
    assert r.ts == "20240301120000"          # latest capture wins
    assert r.filename == "seg-2.warc.gz" and r.offset == 9


def test_fetch_list_mime_selector(spark):
    out = cdx.cdx_fetch_list(_lines(spark, [GOOD, PDF]),
                             mime="application/pdf").collect()
    assert [r.urlkey for r in out] == ["com,example)/c"]


def test_fixture_has_multi_capture_urls(spark, sf_dir):
    lines = cdx.cdx_fixture_df(spark, sf_dir)
    rec = cdx.parse_cdx(lines)
    multi = (rec.groupBy("urlkey").count().filter(F.col("count") > 1))
    assert multi.count() > 0
    fetch = cdx.cdx_fetch_list(lines)
    # fetch list is unique per urlkey
    assert fetch.count() == fetch.select("urlkey").distinct().count()


def test_stream_cdx_fetch(spark, sf_dir, tmp_path):
    """Streaming front door: first-wins per urlkey within the horizon;
    batch-parity on the single-capture subset; restart is exactly-once
    (second availableNow run over the same shards emits nothing)."""
    from lexor_spark.streaming import stream_cdx_fetch
    d = str(tmp_path)
    cdx.cdx_fixture_df(spark, sf_dir).write.mode("overwrite").text(
        f"{d}/in")
    n1 = stream_cdx_fetch(spark, f"{d}/in", f"{d}/out", f"{d}/ck")
    assert n1 > 0
    out = spark.read.parquet(f"{d}/out")
    assert out.count() == out.select("urlkey").distinct().count()
    # batch fetch list agrees on urlkey membership where only one
    # capture exists (multi-capture urlkeys: batch=latest, stream=first)
    batch = cdx.cdx_fetch_list(cdx.cdx_fixture_df(spark, sf_dir))
    rec = cdx.parse_cdx(cdx.cdx_fixture_df(spark, sf_dir))
    kept = rec.filter((F.col("status") == 200)
                      & (F.col("mime") == "text/html"))
    single = (kept.groupBy("urlkey").count().filter(F.col("count") == 1)
              .select("urlkey"))
    b = {r.urlkey for r in batch.join(single, "urlkey").collect()}
    s = {r.urlkey for r in out.join(single, "urlkey").collect()}
    assert b == s
    # exactly-once: nothing new on a restart over the same input
    n2 = stream_cdx_fetch(spark, f"{d}/in", f"{d}/out", f"{d}/ck")
    assert n2 == 0


REVISIT = ('com,example)/r 20240101120000 {"url": "https://example.com/r", '
           '"mime": "warc/revisit", "status": "-", "digest": "d9", '
           '"length": "n/a", "offset": "-", "filename": "seg-1.warc.gz"}')


def test_parse_revisit_record_non_numeric_fields(spark):
    """Real CC CDXJ revisit records carry status '-' — under ANSI mode
    a plain cast would fail the task; try_cast yields nulls."""
    out = cdx.parse_cdx(_lines(spark, [REVISIT])).collect()[0]
    assert out.urlkey == "com,example)/r"
    assert out.status is None and out.length is None and out.offset is None
    assert out.mime == "warc/revisit"


def test_stream_cdx_survives_poison_timestamp(spark, tmp_path):
    """A line with an unparseable timestamp must be skipped, not wedge
    the checkpointed stream forever."""
    from lexor_spark.streaming import stream_cdx_fetch
    poison = ('com,example)/p garbage {"url": "https://example.com/p", '
              '"mime": "text/html", "status": "200", "digest": "d", '
              '"length": "5", "offset": "0", "filename": "s.warc.gz"}')
    d = str(tmp_path)
    _lines(spark, [GOOD, poison]).write.mode("overwrite").text(f"{d}/in")
    n = stream_cdx_fetch(spark, f"{d}/in", f"{d}/out", f"{d}/ck")
    assert n == 1                           # GOOD emitted, poison dropped
    out = spark.read.parquet(f"{d}/out").collect()
    assert [r.urlkey for r in out] == ["com,example)/a"]


# ---------------------------------------------------------------------------
# urlkey-bucketed storage + pruned lookup
# ---------------------------------------------------------------------------

def test_bucketed_lookup_matches_unbucketed_filter(spark, sf_dir, tmp_path):
    """The pruned lookup returns exactly the rows a full-scan prefix
    filter over the unbucketed fetch list returns."""
    fetch = cdx.cdx_fetch_list(cdx.cdx_fixture_df(spark, sf_dir))
    idx = str(tmp_path / "fetch")
    cdx.write_fetch_list(fetch, idx)
    got = cdx.lookup_fetch(spark, idx, "example,site7)/").collect()
    want = fetch.filter(F.col("urlkey").startswith("example,site7)/")).collect()
    key = lambda r: (r.urlkey, r.ts)
    assert sorted(got, key=key) == sorted(want, key=key)
    assert len(got) > 0


def test_bucket_mirror_matches_spark_crc32(spark):
    """zlib.crc32 (driver-side constant) == F.crc32 (write-side column)
    for SURT hosts — the identity the pruning depends on."""
    hosts = [f"example,site{i}" for i in range(97)] + ["com,UPPER", "x,y"]
    df = spark.createDataFrame([(h,) for h in hosts], ["h"])
    rows = df.select("h", F.pmod(F.crc32(F.col("h")),
                                 F.lit(cdx.N_URLKEY_BUCKETS))
                     .cast("int").alias("b")).collect()
    for r in rows:
        assert r.b == cdx.urlkey_bucket(r.h), r.h


def test_lookup_plan_prunes_partitions(spark, sf_dir, tmp_path):
    """The physical scan must carry a constant PartitionFilter on
    urlkey_bucket (directory pruning) and push the urlkey prefix into
    row groups — not scan all buckets."""
    fetch = cdx.cdx_fetch_list(cdx.cdx_fixture_df(spark, sf_dir))
    idx = str(tmp_path / "fetch")
    cdx.write_fetch_list(fetch, idx)
    q = cdx.lookup_fetch(spark, idx, "example,site7)/")
    import re
    plan = q._jdf.queryExecution().executedPlan().toString()
    b = cdx.urlkey_bucket("example,site7")
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf, plan
    assert re.search(rf"urlkey_bucket#\d+ = {b}\b", pf.group(1)), pf.group(1)
    assert "StringStartsWith(urlkey,example,site7)/" in plan, plan


# ---------------------------------------------------------------------------
# crawl-over-crawl snapshot diff
# ---------------------------------------------------------------------------

def test_cdx_diff_classifies_changes(spark):
    def line(key, ts, digest):
        return (f'{key} {ts} {{"url": "https://x/{key}", '
                f'"mime": "text/html", "status": "200", '
                f'"digest": "{digest}", "length": "5", "offset": "0", '
                f'"filename": "s.warc.gz"}}')
    old = _lines(spark, [line("com,a)/1", "20240101000000", "d1"),
                         line("com,a)/2", "20240101000000", "d2"),
                         line("com,a)/3", "20240101000000", "d3"),
                         # stale capture must lose to the newer one
                         line("com,a)/3", "20230101000000", "stale")])
    new = _lines(spark, [line("com,a)/1", "20240301000000", "d1"),
                         line("com,a)/3", "20240301000000", "d3x"),
                         line("com,a)/4", "20240301000000", "d4")])
    got = {r.urlkey: r.change for r in cdx.cdx_diff(old, new).collect()}
    assert got == {"com,a)/1": "same", "com,a)/2": "gone",
                   "com,a)/3": "changed", "com,a)/4": "added"}


def test_cdx_diff_matches_oracle(spark, sf_dir):
    import duckdb
    got = sorted((r.urlkey, r.change) for r in cdx.cdx_diff(
        cdx.cdx_snapshot_df(spark, sf_dir, "old"),
        cdx.cdx_snapshot_df(spark, sf_dir, "new")).collect())
    con = duckdb.connect()
    con.sql(f"create view documents as select * from "
            f"read_parquet('{sf_dir}/documents.parquet')")
    want = sorted(con.sql(
        "select urlkey, change from ("
        + cdx.cdx_diff_sql(cdx.cdx_snapshot_sql("old"),
                           cdx.cdx_snapshot_sql("new"))
        + ")").fetchall())
    assert got == [tuple(w) for w in want] and len(got) > 0
