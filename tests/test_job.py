"""Pipeline-level Spark tests: byte-identity vs serial oracle, resume,
metrics — the table-level tests the reference never had (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexor_spark.job import (committed_groups, extract_pages,
                             partition_metrics, run_job)
from lexor_spark.kernel import extract_document
from lexor_spark.pages import pages_df


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    df = pages_df(spark, sf_dir).limit(150).cache()
    df.count()
    return df


def test_pages_schema(pages):
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types["html"] == "binary"
    assert types["warc_ts"] == "timestamp"


def test_pages_deterministic(spark, sf_dir):
    a = pages_df(spark, sf_dir).select("url", F.md5(F.col("html").cast("string")).alias("h"))
    b = pages_df(spark, sf_dir).select("url", F.md5(F.col("html").cast("string")).alias("h"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_byte_identity_vs_serial_oracle(pages):
    """north_rule: byte-identical extracted text per url."""
    out = {r.url: (r.text, r.spans) for r in
           extract_pages(pages, salt_buckets=32, partitions=8).collect()}
    src = {r.url: bytes(r.html) for r in pages.collect()}
    assert set(out) == set(src)
    for url, html in src.items():
        exp = extract_document(html, url)
        got_text, got_spans = out[url]
        assert got_text == exp.text, f"text mismatch for {url}"
        assert [(s.start, s.end, s.path) for s in got_spans] == exp.spans


def test_no_error_rows(pages):
    out = extract_pages(pages).cache()
    assert out.filter(~F.col("ok")).count() == 0
    assert out.filter(F.col("n_chars_out") > 0).count() == out.count()


def test_metrics(pages):
    out = extract_pages(pages)
    m = partition_metrics(out).agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_errors").alias("errs")).collect()[0]
    assert m.docs == pages.count()
    assert m.errs == 0


def test_resume_after_kill(spark, pages, tmp_path):
    out_dir = str(tmp_path / "out")
    r1 = run_job(spark, pages, out_dir, n_groups=4, max_groups=2,
                 partitions=8)
    assert len(r1["processed"]) == 2 and not r1["complete"]
    assert committed_groups(out_dir) == {p["group"] for p in r1["processed"]}
    r2 = run_job(spark, pages, out_dir, n_groups=4, partitions=8)
    assert r2["complete"]
    assert sorted(r2["skipped_committed"]) == sorted(
        p["group"] for p in r1["processed"])
    total = spark.read.parquet(out_dir + "/group=*")
    assert total.count() == pages.count()
    assert total.select("url").distinct().count() == pages.count()
    # idempotent third run
    r3 = run_job(spark, pages, out_dir, n_groups=4, partitions=8)
    assert r3["processed"] == [] and r3["complete"]
    # lineage table: one row per committed group, conserved row count
    from lexor_spark.job import read_lineage
    lin = read_lineage(spark, out_dir)
    assert lin.count() == 4
    got = {r["group"]: r for r in lin.collect()}
    assert set(got) == {0, 1, 2, 3}
    assert sum(r["n_rows"] for r in got.values()) == pages.count()
    assert all(r["bytes_in"] > 0 and r["kernel_us_total"] > 0
               for r in got.values())


def test_hostile_rows_become_data(spark):
    hostile = spark.createDataFrame(
        [("u1", bytearray(b"\xff\xfegarbage<not html")),
         ("u2", bytearray(b"")),
         ("u3", None),
         ("u4", bytearray(("<div>" * 2000 + "deep").encode()))],
        "url string, html binary")
    rows = {r.url: r for r in
            extract_pages(hostile, salt_buckets=4, partitions=2).collect()}
    assert all(r.ok for r in rows.values())
    assert rows["u4"].text == "deep"
    assert rows["u2"].n_chars_out == 0 and rows["u3"].n_chars_out == 0


def test_heavy_tail_skew(spark, sf_dir):
    """FIXTURES.md §4 size tail: ~1% giant pages must neither fail nor
    concentrate on one partition, and stay byte-identical to the serial
    oracle."""
    from lexor_spark.kernel.pipeline import extract_document

    pages = pages_df(spark, sf_dir, heavy_tail=True)
    big = pages.filter(F.length("html") > 100_000)
    n_big = big.count()
    assert n_big >= 3  # the tail exists

    out = extract_pages(pages, salt_buckets=64, partitions=16)
    rows = out.collect()
    assert all(r.ok for r in rows)

    # salting spread: no partition holds more than half the corpus
    from lexor_spark.job import partition_metrics
    m = partition_metrics(extract_pages(pages, salt_buckets=64,
                                        partitions=16)).collect()
    total = sum(r.n_docs for r in m)
    assert max(r.n_docs for r in m) < total / 2

    # byte-identity holds for a giant page too
    sample = big.limit(1).collect()[0]
    assert extract_document(sample.html, sample.url).text == \
        {r.url: r.text for r in rows}[sample.url]


def test_read_lineage_empty_dir(spark, tmp_path):
    """Zero committed groups is a valid state: empty DataFrame, not a
    missing-path crash."""
    from lexor_spark.job import read_lineage
    lin = read_lineage(spark, str(tmp_path / "never_ran"))
    assert lin.count() == 0
    assert "group" in lin.columns and "n_rows" in lin.columns


def test_resume_table_commit(spark, pages):
    """Catalog-table commit variant (the Iceberg-snapshot shape): kill
    after 2 of 4 group appends, resume completes the rest, committed
    set = distinct group values, rows conserve, third run is a no-op."""
    from lexor_spark.job import committed_groups_table, run_job_table

    table = "sg_test_extract"
    spark.sql(f"drop table if exists {table}")
    try:
        r1 = run_job_table(spark, pages, table, n_groups=4, max_groups=2,
                           partitions=8)
        assert len(r1["processed"]) == 2 and not r1["complete"]
        assert committed_groups_table(spark, table) == \
            {p["group"] for p in r1["processed"]}
        r2 = run_job_table(spark, pages, table, n_groups=4, partitions=8)
        assert r2["complete"]
        assert sorted(r2["skipped_committed"]) == sorted(
            p["group"] for p in r1["processed"])
        total = spark.table(table)
        assert total.count() == pages.count()
        assert total.select("url").distinct().count() == pages.count()
        assert total.select("group").distinct().count() == 4
        r3 = run_job_table(spark, pages, table, n_groups=4, partitions=8)
        assert r3["processed"] == [] and r3["complete"]
    finally:
        spark.sql(f"drop table if exists {table}")


def test_table_commit_empty_groups_complete(spark, pages):
    """A group no url hashes to must not leave the job pending forever:
    work list = non-empty groups, complete once those commit."""
    from lexor_spark.job import run_job_table

    table = "sg_test_sparse"
    spark.sql(f"drop table if exists {table}")
    try:
        # 64 groups over 150 urls -> some groups are certainly empty
        r = run_job_table(spark, pages, table, n_groups=64, partitions=8)
        assert r["complete"]
        assert spark.table(table).count() == pages.count()
        r2 = run_job_table(spark, pages, table, n_groups=64, partitions=8)
        assert r2["processed"] == [] and r2["complete"]
    finally:
        spark.sql(f"drop table if exists {table}")
