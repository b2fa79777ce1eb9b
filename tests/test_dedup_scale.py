"""Scale-safety tests for the dedup family.

VERDICT r1 items #2 and #9: LSH_BUCKET_CAP must be *enforced* (a
boilerplate-identical band key at web scale otherwise yields O(bucket²)
candidates in the band self-join), and `_spread` must not re-shuffle a
source that is already well partitioned.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexor_spark import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """1k boilerplate-identical docs: every band bucket holds all 1000
    rows, far over a cap of 50, so the self-join sees zero candidates
    (499,500 pairs × 4 bands uncapped).  Exact dedup is the operator
    that owns this corpus; LSH must refuse to blow up on it."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [text] * 1000)
    pairs = dedup.lsh_pairs(docs, bucket_cap=50)
    assert pairs.count() == 0


def test_lsh_bucket_cap_keeps_small_buckets(spark):
    """Mixed corpus: 30 identical pages (bucket 30 > cap 10 → dropped)
    plus one genuine near-dup pair in its own small bucket — the pair
    must survive the cap filter."""
    boiler = "copyright acme corp all rights reserved terms privacy contact"
    a = "spark makes distributed dataframes easy to reason about at scale"
    b = "spark makes distributed dataframes easy to reason about at any scale"
    docs = _docs(spark, [boiler] * 30 + [a, b])
    pairs = dedup.lsh_pairs(docs, threshold=0.3, bucket_cap=10).collect()
    got = {(r.a, r.b) for r in pairs}
    assert (30, 31) in got
    # no pair of boilerplate docs (ids 0..29) leaked through
    assert all(not (x < 30 and y < 30) for x, y in got)


def test_lsh_cap_noop_on_normal_corpus(spark, sf_dir):
    """On the real test corpus no bucket approaches the default cap, so
    enforcement must not change results vs an effectively-infinite cap."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    capped = {(r.a, r.b, r.jaccard)
              for r in dedup.lsh_pairs(docs).collect()}
    uncapped = {(r.a, r.b, r.jaccard)
                for r in dedup.lsh_pairs(docs, bucket_cap=10**9).collect()}
    assert capped == uncapped


def test_spread_skips_well_partitioned_input(spark):
    """_spread must be a no-op (same DataFrame object, no exchange) when
    the source already has >= defaultParallelism partitions."""
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    assert dedup._spread(df) is df


def test_spread_fans_out_single_split(spark):
    df = spark.range(1000).coalesce(1)
    out = dedup._spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
