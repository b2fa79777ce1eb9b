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


# ---------------------------------------------------------------------------
# banded sign-LSH pair join (sim.cosine_dup_pairs)
# ---------------------------------------------------------------------------

def test_cosine_dup_pairs_exact_on_survivors(spark):
    """Every reported pair must carry the EXACT cosine (blocking only
    prunes candidates, never changes values) and clear the threshold."""
    from lexor_spark import sim
    sf = "/root/testdata/sf0.001"
    got = {(r.a, r.b): r.sim
           for r in sim.cosine_dup_pairs(spark, sf, threshold=0.25).collect()}
    assert got, "expected some near-dup pairs on the test corpus"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    l = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    r = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    brute = {(x.a, x.b): x.sim for x in
             l.join(r, F.col("a") < F.col("b"))
              .select("a", "b",
                      F.round(sim.cosine(F.col("va"), F.col("vb")), 4)
                       .alias("sim"))
              .filter(F.col("sim") > 0.25).collect()}
    # exact precision: reported pairs are a subset of brute force with
    # identical sims
    for k, v in got.items():
        assert k in brute and brute[k] == v


def test_cosine_pair_bucket_cap_bounds_degenerate(spark, tmp_path):
    """1k identical vectors with a small cap: every band bucket holds all
    rows, so the pair join sees zero candidates instead of ~500k pairs."""
    from lexor_spark import sim
    vec = [float((i % 7) - 3) for i in range(64)]
    df = spark.createDataFrame([(i, vec) for i in range(1000)],
                               "vec_id long, embedding array<double>")
    d = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    pairs = sim.cosine_dup_pairs(spark, d, threshold=0.25, bucket_cap=50)
    assert pairs.count() == 0


def test_jaccard_stop_shingle_cap(spark):
    """A boilerplate shingle present in every doc must not explode the
    inverted-index join when the df cap is on; genuinely similar pairs
    still surface through their rarer shingles."""
    boiler = "all rights reserved by the site owner today"
    core = "unique alpha beta gamma delta epsilon iota kappa lambda mu nu xi"
    a = f"{core} zeta. {boiler}"
    b = f"{core} eta. {boiler}"
    others = [f"doc number {i} talks about topic {i} only. {boiler}"
              for i in range(40)]
    docs = _docs(spark, [a, b] + others)
    capped = dedup.jaccard_pairs(docs, threshold=0.2, max_shingle_df=10)
    got = {(r.a, r.b) for r in capped.collect()}
    assert (0, 1) in got
    exact = dedup.jaccard_pairs(docs, threshold=0.2)
    exact_pairs = {(r.a, r.b): r.jaccard for r in exact.collect()}
    # capped jaccard is a lower bound of the exact one
    for r in capped.collect():
        assert r.jaccard <= exact_pairs[(r.a, r.b)] + 1e-9
