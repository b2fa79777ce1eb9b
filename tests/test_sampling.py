"""Deterministic split & stratified-sample operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexor_spark import sampling


def _docs(spark, n=2000, parts=4):
    return (spark.range(n).repartition(parts)
            .select(F.col("id").alias("doc_id"),
                    (F.col("id") % 3).cast("string").alias("lang")))


def test_split_partitioning_invariant(spark):
    """The defining property vs randomSplit: the assignment is a pure
    function of the id — identical under any partitioning."""
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split
         for r in sampling.hash_split(_docs(spark, parts=1), w).collect()}
    b = {r.doc_id: r.split
         for r in sampling.hash_split(_docs(spark, parts=13), w).collect()}
    assert a == b


def test_split_proportions_and_totality(spark):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sampling.hash_split(_docs(spark), w)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000          # every row lands somewhere
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_split_weights_must_sum_to_one(spark):
    with pytest.raises(ValueError):
        sampling.hash_split(_docs(spark), {"a": 0.5, "b": 0.4})


def test_sample_by_quotas(spark):
    docs = _docs(spark)
    out = sampling.sample_by(docs, {"0": 0.5, "1": 0.0}, group_col="lang")
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n0 = docs.filter(F.col("lang") == "0").count()
    n2 = docs.filter(F.col("lang") == "2").count()
    assert "1" not in counts                      # fraction 0 prunes fully
    assert counts["2"] == n2                      # unlisted keeps default 1.0
    assert abs(counts["0"] / n0 - 0.5) < 0.08


def test_sample_and_split_draws_independent(spark):
    """Distinct salts: among surviving sampled rows the split mix must
    stay ~the split weights (a correlated draw would skew it)."""
    docs = _docs(spark)
    w = {"train": 0.5, "val": 0.5}
    survivors = sampling.sample_by(docs, {}, default=0.5)
    out = sampling.hash_split(survivors, w)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.5) < 0.08


def test_single_split_sql_parses():
    import duckdb
    sql = sampling.hash_split_sql("t", {"train": 1.0})
    out = duckdb.sql(
        "with t as (select 1 as doc_id) " + sql).fetchall()
    assert out[0][-1] == "train"
    sql2 = sampling.sample_by_sql("t", {}, default=1.0)
    assert duckdb.sql("with t as (select 1 as doc_id, 'en' as lang) "
                      + sql2).fetchall()


def test_mixture_plan_epoch_cap_and_downsample(spark):
    from lexor_spark.sampling import mixture_plan

    # stratum a: 10 tokens available; stratum b: 1000 tokens available
    docs = spark.createDataFrame(
        [("a", "t " * 10, 9.0), ("b", "t " * 1000, 1.0)],
        "source string, text string, weight double")
    got = {r.stratum: r for r in
           mixture_plan(docs, budget_tokens=1000).collect()}
    a, b = got["a"], got["b"]
    # a wants 900 tokens from 10 available -> raw 90 epochs, capped at 4
    assert a.target_tokens == 900.0 and a.epochs_raw == 90.0
    assert a.epochs == 4.0 and a.planned_tokens == 40.0
    assert a.deficit_tokens == 860.0
    # b wants 100 of 1000 -> downsample, no deficit
    assert b.epochs == 0.1 and b.planned_tokens == 100.0
    assert b.deficit_tokens == 0.0
