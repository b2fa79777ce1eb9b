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


# ------------------------------------------------------------- recrawl

def _caps(spark, rows):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, "url string, ts_s long, digest string")
    return df.select("url", F.timestamp_seconds("ts_s").alias("ts"),
                     "digest")


def _sched(spark, rows, **kw):
    got = frontier.recrawl_schedule(_caps(spark, rows), **kw).collect()
    return {r["url"]: r for r in got}


def test_recrawl_never_changed_backs_off(spark):
    # 4 identical digests: streak 3, 0 changes -> 24 * 2^3 = 192h
    rows = [("u", 1000 + i * 100, "d0") for i in range(4)]
    r = _sched(spark, rows)["u"]
    assert (r["n_captures"], r["n_changes"], r["unchanged_streak"]) == (4, 0, 3)
    assert r["change_rate"] == 0.0
    assert r["next_interval_h"] == 192.0


def test_recrawl_always_changing_hits_floor(spark):
    # every capture different: streak 0, 3 changes -> 24/4 = 6h floor
    rows = [("u", 1000 + i * 100, f"d{i}") for i in range(4)]
    r = _sched(spark, rows)["u"]
    assert (r["n_changes"], r["unchanged_streak"]) == (3, 0)
    assert r["change_rate"] == 1.0
    assert r["next_interval_h"] == 6.0
    # next fetch anchored to the LAST capture
    assert int(r["next_fetch_ts"].timestamp()) == 1300 + 6 * 3600


def test_recrawl_streak_cap_and_ceiling(spark):
    # 12 identical digests: raw 24*2^11 but streak caps at 6 -> 24*64
    # = 1536h; with max_h=100 the ceiling clamps
    rows = [("u", 1000 + i * 100, "d0") for i in range(12)]
    assert _sched(spark, rows)["u"]["next_interval_h"] == 1536.0
    assert _sched(spark, rows, max_h=100.0)["u"]["next_interval_h"] == 100.0


def test_recrawl_single_capture_null_rate(spark):
    r = _sched(spark, [("u", 1000, "d0")])["u"]
    assert r["n_captures"] == 1 and r["n_changes"] == 0
    assert r["change_rate"] is None
    assert r["unchanged_streak"] == 0
    assert r["next_interval_h"] == 24.0  # base: no evidence either way


def test_recrawl_change_then_quiet(spark):
    # change at idx 1 then two quiet: streak 2, 1 change ->
    # 24 * 2^2 / 2 = 48h
    rows = [("u", 1000, "a"), ("u", 1100, "b"),
            ("u", 1200, "b"), ("u", 1300, "b")]
    r = _sched(spark, rows)["u"]
    assert (r["n_changes"], r["unchanged_streak"]) == (1, 2)
    assert r["next_interval_h"] == 48.0


def test_sitemap_refetch_statuses_and_priority(spark):
    from datetime import datetime
    from lexor_spark.frontier import sitemap_refetch
    entries = spark.createDataFrame([
        ("h", "https://h/x/never", "2024-01-01"),
        ("h", "https://h/x/modified", "2024-01-15"),
        ("h", "https://h/x/current", "2023-01-01"),
        ("h", "https://h/x/nolastmod", None),
        ("h", "https://h/x/fulldt", "2024-02-01T06:30:00Z"),
        ("h", "https://h/x/badlastmod", "15 Jan 2024"),
    ], "host string, loc string, lastmod string")
    caps = spark.createDataFrame([
        ("https://h/x/modified", datetime(2023, 12, 1), "d1"),
        ("https://h/x/modified", datetime(2023, 12, 20), "d2"),
        ("https://h/x/current", datetime(2023, 12, 20), "d1"),
        ("https://h/x/nolastmod", datetime(2023, 12, 20), "d1"),
        ("https://h/x/fulldt", datetime(2023, 12, 20), "d1"),
        ("https://h/x/badlastmod", datetime(2023, 12, 20), "d1"),
    ], "url string, ts timestamp, digest string")
    got = {r.loc: r for r in sitemap_refetch(entries, caps).collect()}
    assert got["https://h/x/never"].status == "never_fetched"
    assert got["https://h/x/never"].priority == 0
    assert got["https://h/x/never"].fetch_needed
    m = got["https://h/x/modified"]
    # max(ts) = Dec 20, lastmod Jan 15 2024 > it
    assert m.status == "modified_since_fetch" and m.priority == 1
    assert m.last_fetch_ts == datetime(2023, 12, 20)
    c = got["https://h/x/current"]
    assert c.status == "fetched_current" and not c.fetch_needed
    assert c.priority == 3
    assert got["https://h/x/nolastmod"].status == "unknown_lastmod"
    assert got["https://h/x/nolastmod"].priority == 2
    f = got["https://h/x/fulldt"]
    assert f.status == "modified_since_fetch"
    assert f.lastmod_ts == datetime(2024, 2, 1, 6, 30)
    # malformed lastmod parses to NULL → treated as unknown, not a crash
    b = got["https://h/x/badlastmod"]
    assert b.status == "unknown_lastmod" and b.lastmod_ts is None


def test_frontier_queue_merge_and_rank(spark):
    from lexor_spark.frontier import frontier_queue
    refetch = spark.createDataFrame([
        # (host, loc, status, fetch_needed, priority)
        ("h1.ex", "https://h1.ex/a", "never_fetched", True, 0),
        ("h1.ex", "https://h1.ex/b", "modified_since_fetch", True, 1),
        ("h1.ex", "https://h1.ex/c", "fetched_current", False, 3),
        ("h2.ex", "https://h2.ex/x", "modified_since_fetch", True, 1),
    ], "host string, loc string, status string, fetch_needed boolean, "
       "priority int")
    from datetime import datetime
    recrawl = spark.createDataFrame([
        # due (next_fetch in the past), overlaps a sitemap row
        ("https://h1.ex/b", datetime(2023, 12, 1)),
        # due, recrawl-only
        ("https://h2.ex/y", datetime(2023, 12, 2)),
        # not yet due
        ("https://h2.ex/z", datetime(2024, 6, 1)),
    ], "url string, next_fetch_ts timestamp")
    got = frontier_queue(refetch, recrawl,
                         now="2023-12-08 00:00:00").collect()
    rows = {(r.host, r.url): r for r in got}
    assert len(got) == 4                      # c filtered, z not due
    # the overlapping url keeps its sitemap priority, once
    b = rows[("h1.ex", "https://h1.ex/b")]
    assert b.priority == 1 and b.source == "sitemap"
    # per-host rank follows priority
    assert rows[("h1.ex", "https://h1.ex/a")].host_rank == 1
    assert b.host_rank == 2
    y = rows[("h2.ex", "https://h2.ex/y")]
    assert y.source == "recrawl" and y.priority == 4
    assert rows[("h2.ex", "https://h2.ex/x")].host_rank == 1
    assert y.host_rank == 2


def test_crawl_loop_composition(spark):
    """The composed gate query: only added/changed CDX rows survive,
    REP-disallowed urls are gone, and scheduling invariants hold."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    out = entry._q_crawl_loop(spark, "/root/testdata/sf0.001").collect()
    assert out, "crawl loop produced no dispatch tasks"
    assert {r.change for r in out} <= {"added", "changed"}
    # REP gate: the h%4==1 host class disallows everything except /pub,
    # and fixture paths never start with /pub — those hosts must be gone
    import re
    for r in out:
        h = int(re.match(r"site(\d+)\.example", r.host).group(1))
        assert h % 4 != 1, f"disallowed host slipped through: {r.host}"
    # politeness: within a host, slots are 0..n-1 and dispatch times
    # are non-decreasing with slot
    by_host: dict = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    for rows in by_host.values():
        rows.sort(key=lambda r: r.slot)
        assert [r.slot for r in rows] == list(range(len(rows)))
        times = [r.dispatch_at_s for r in rows]
        assert times == sorted(times)
        assert len({r.worker for r in rows}) == 1


def test_crawl_loop_full_pipeline(spark):
    """Full loop: dispatch rows all resolve to a fetched+extracted page,
    extraction is hostile-proof (ok everywhere), the quality gate is
    deterministic, and indexed-term counts appear exactly for kept
    pages."""
    import __spark_entry__ as entry

    sched = {r.url for r in
             entry._q_crawl_loop(spark, "/root/testdata/sf0.001")
             .select("url").collect()}
    out = entry._q_crawl_loop_full(
        spark, "/root/testdata/sf0.001").collect()
    assert out, "full crawl loop produced no rows"
    # every output row was scheduled, and every scheduled url fetched
    # (the fixture pages table covers the cdx fixture's url space)
    assert {r.url for r in out} == sched
    for r in out:
        assert r.ok, f"kernel failed on {r.url}"
        assert r.n_chars > 0
        if r.gopher_keep:
            assert r.n_index_terms > 0, f"kept page not indexed: {r.url}"
        else:
            assert r.n_index_terms == 0
    kept = sum(1 for r in out if r.gopher_keep)
    assert 0 < kept, "quality gate rejected everything"
