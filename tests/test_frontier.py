"""Crawl-frontier fetch scheduling (politeness under parallelism)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lexor_spark import frontier


def _fetch(spark, rows):
    return spark.createDataFrame(rows, "urlkey string, url string")


def _delays(spark, rows):
    return spark.createDataFrame(rows, "host string, delay_s double")


def test_schedule_token_bucket_per_host(spark):
    fetch = _fetch(spark, [
        (f"com,a)/p{i}", f"https://a.com/p{i}") for i in range(4)
    ] + [("com,b)/x", "https://b.com/x")])
    delays = _delays(spark, [("a.com", 2.0)])
    out = frontier.fetch_schedule(fetch, delays, default_delay=0.5,
                                  n_workers=4).collect()
    a = sorted((r.slot, r.dispatch_at_s) for r in out if r.host == "a.com")
    assert a == [(0, 0.0), (1, 2.0), (2, 4.0), (3, 6.0)]
    b = [(r.slot, r.dispatch_at_s) for r in out if r.host == "b.com"]
    assert b == [(0, 0.0)]                       # default delay, slot 0


def test_schedule_host_pinned_to_one_worker(spark):
    fetch = _fetch(spark, [(f"com,a)/p{i}", f"https://a.com/p{i}")
                           for i in range(50)])
    out = frontier.fetch_schedule(fetch, _delays(spark, []),
                                  n_workers=8).collect()
    assert len({r.worker for r in out}) == 1    # one host -> one worker
    assert all(0 <= r.worker < 8 for r in out)


def test_schedule_worker_hash_matches_oracle(spark):
    """Spark conv(md5-prefix) == DuckDB ('0x'||prefix)::bigint — the
    cross-engine identity the value oracle rides on."""
    import duckdb
    hosts = [f"site{i}.example" for i in range(40)]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    got = {r.host: r.w for r in df.select(
        "host",
        F.pmod(F.conv(F.substring(F.md5("host"), 1, 8), 16, 10)
               .cast("long"), F.lit(8)).cast("int").alias("w")).collect()}
    con = duckdb.connect()
    want = dict(con.sql(
        "select h, (('0x' || substr(md5(h), 1, 8))::bigint % 8)::int "
        "from (select unnest($hosts) as h)", params={"hosts": hosts}
    ).fetchall())
    assert got == want


def test_schedule_validation(spark):
    import pytest
    with pytest.raises(ValueError):
        frontier.fetch_schedule(_fetch(spark, []), _delays(spark, []),
                                n_workers=0)
