"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs:

* **brute-force cosine top-k** — the exactness baseline: one scan, a
  broadcast of the query vector, dot/norm via ``zip_with``/``aggregate``
  (JVM-side higher-order functions, no Python), and a top-k sort of the
  scalar scores.  At scale: ``ORDER BY sim DESC LIMIT k`` is planned as
  TakeOrderedAndProject — per-partition heaps + a single driver merge,
  no global sort shuffle.
* **sign-bucketed ANN** — the scale path: a deterministic 8-bit bucket
  from the sign pattern of the first 8 dimensions partitions the corpus;
  search touches only the query's bucket (≈1/256 of the data).  The
  bucketing is a pure expression, so the same algorithm is expressible
  in the DuckDB oracle verbatim — the driver verifies *values*, and the
  recall gap vs brute force is itself testable.

All arithmetic is forced to DOUBLE before aggregation: float32 partial
sums would differ between engines and break value-hash comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["cosine", "cosine_topk", "ann_bucketed", "bucket_of",
           "cosine_topk_sql", "ann_bucketed_sql",
           "cosine_dup_pairs", "cosine_dup_pairs_sql"]

_SIGN_BITS = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def bucket_of(vec: Column, bits: int = _SIGN_BITS) -> Column:
    """Deterministic sign-pattern bucket from the first ``bits`` dims."""
    out = F.lit(0)
    for j in range(bits):
        out = out + F.when(F.element_at(vec, j + 1) >= 0.0,
                           F.lit(1 << j)).otherwise(F.lit(0))
    return out


def _query_vec(spark: SparkSession, sf_dir: str, query_id: int) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("qv"))


def cosine_topk(spark: SparkSession, sf_dir: str, query_id: int = 0,
                k: int = 10) -> DataFrame:
    """Exact top-k neighbours of ``query_id`` (query row included, sim=1).
    Ties broken by vec_id for full determinism."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = _query_vec(spark, sf_dir, query_id)
    sim = F.round(cosine(F.col("embedding"), F.col("qv")), 4)
    return (
        emb.crossJoin(F.broadcast(q))
        .select(F.col("vec_id"), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def cosine_topk_sql(query_id: int = 0, k: int = 10) -> str:
    return f"""
with q as (select embedding::DOUBLE[] as qv from embeddings where vec_id = {query_id})
select vec_id,
       round(list_dot_product(embedding::DOUBLE[], qv) /
             (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
              sqrt(list_dot_product(qv, qv))), 4) as sim
from embeddings, q
order by sim desc, vec_id
limit {k}
"""


def ann_bucketed(spark: SparkSession, sf_dir: str, query_id: int = 0,
                 k: int = 10) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's sign bucket.
    On a partitioned/bucketed table the bucket predicate prunes ~255/256
    of the input before any compute."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "bucket", bucket_of(F.col("embedding")))
    q = (emb.filter(F.col("vec_id") == query_id)
         .select(F.col("embedding").alias("qv"), F.col("bucket").alias("qb")))
    sim = F.round(cosine(F.col("embedding"), F.col("qv")), 4)
    return (
        emb.join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def cosine_dup_pairs(spark: SparkSession, sf_dir: str,
                     threshold: float = 0.25) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, sign-bucket-blocked.

    The naive all-pairs join is O(n²) rows — a non-starter at 10^12 docs.
    Blocking on the deterministic sign bucket turns it into an equi-join
    Catalyst shuffles on ``bucket`` (or broadcast-joins per bucket), so
    each comparison group is ~n/256 and the candidate set shrinks ~256×;
    recall is bounded by the block (near-identical vectors share the
    sign pattern of their leading dims).  ``a < b`` dedups the symmetric
    pair; arithmetic in DOUBLE for engine-exact value parity."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", bucket_of(F.col("embedding")).alias("bucket"))
    a = emb.select(F.col("vec_id").alias("a"),
                   F.col("embedding").alias("va"), "bucket")
    b = emb.select(F.col("vec_id").alias("b"),
                   F.col("embedding").alias("vb"),
                   F.col("bucket").alias("bucket_b"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 4)
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("a") < F.col("b")))
        .select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") > threshold)
    )


def cosine_dup_pairs_sql(threshold: float = 0.25) -> str:
    bsql = _bucket_sql("embedding")
    return f"""
with e as (select vec_id, embedding::DOUBLE[] as v, {bsql} as bucket
           from embeddings)
select a.vec_id as a, b.vec_id as b,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) *
              sqrt(list_dot_product(b.v, b.v))), 4) as sim
from e a join e b on a.bucket = b.bucket and a.vec_id < b.vec_id
where round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) *
             sqrt(list_dot_product(b.v, b.v))), 4) > {threshold}
"""


def _bucket_sql(vec: str, bits: int = _SIGN_BITS) -> str:
    terms = " + ".join(
        f"(case when {vec}[{j + 1}] >= 0.0 then {1 << j} else 0 end)"
        for j in range(bits))
    return "(" + terms + ")"


def ann_bucketed_sql(query_id: int = 0, k: int = 10) -> str:
    b = _bucket_sql("embedding")
    return f"""
with e as (select vec_id, embedding::DOUBLE[] as v, {b} as bucket from embeddings),
q as (select v as qv, bucket as qb from e where vec_id = {query_id})
select vec_id,
       round(list_dot_product(v, qv) /
             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 4) as sim
from e, q
where bucket = qb
order by sim desc, vec_id
limit {k}
"""
