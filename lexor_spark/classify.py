"""Distributed supervised quality classifier (logistic regression).

The modern pipeline shape (FineWeb-Edu, Dolma taggers): label a slice
of documents (an LLM judge, human ratings — here a deterministic
fixture label), train a lightweight linear classifier over hashed
token features, and score the whole corpus with it.  This module is
that loop as pure DataFrame algebra:

* features: binary hashed-unigram presence buckets (first 32 md5 bits
  mod ``B`` — the engine-portable hash of `lexor_spark/sampling.py`),
  plus a bias feature at bucket ``-1`` (presence, not tf: per-feature
  gradients then carry unit weight instead of 1/doc-length, which lets
  few-round full-batch GD move past the base-rate bias);
* training: ``iters`` FIXED full-batch gradient-descent rounds,
  ``w += lr * mean((y - sigmoid(w.x)) * x)``, every intermediate
  rounded to 6 decimals on both engines so summation-order and libm
  ulps cannot leak into later rounds (the `kmeans`/`bpe` determinism
  recipe), which is what makes the DuckDB value oracle possible — the
  mirror unrolls the rounds as CTEs;
* scoring: one broadcast of the trained (B+1)-row weight table, one
  map-side-combinable per-doc aggregation.

Plan shape at scale (10^12 docs): per round the weight table (B+1
rows, B=256 here, 10^4-10^5 in production) BROADCASTS to the feature
side; the margin is a per-doc agg (map-side partials), the residual
joins back to features co-partitioned on doc_id, and the gradient is a
B-key agg — the corpus shuffles (doc_id, bucket, x) only, never text.
``iters`` driver rounds = the classic MapReduce GD loop.  No reference
counterpart; method per the public literature above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lexor_spark.textfns import SQL, normalize_text

__all__ = ["lr_features", "lr_train", "lr_train_sql", "lr_score",
           "lr_score_sql"]

_BIAS = -1


def _bucket(g: Column, n_buckets: int) -> Column:
    h = F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def lr_features(docs: DataFrame, n_buckets: int = 256,
                text_col: str = "text", id_col: str = "doc_id"
                ) -> DataFrame:
    """(doc_id, b, x): binary presence of each hashed-unigram bucket
    (x = 1.0 for every distinct bucket the document's tokens hash to)
    plus the bias row ``(doc_id, -1, 1.0)``.  An empty text normalizes
    to the single token ``''`` so every document has features."""
    toks = (docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " "))
        .alias("tok")))
    bk = toks.select(id_col, _bucket(F.col("tok"), n_buckets).alias("b"))
    feats = bk.distinct().select(id_col, "b", F.lit(1.0).alias("x"))
    bias = docs.select(F.col(id_col), F.lit(_BIAS).cast("long").alias("b"),
                       F.lit(1.0).alias("x"))
    return feats.unionAll(bias)


def _features_sql(table: str, n_buckets: int, text_col: str,
                  id_col: str) -> str:
    norm = SQL.NORMALIZE.format(c=text_col)
    b = f"((('0x' || substr(md5(tok), 1, 8))::bigint) % {n_buckets})"
    return f"""
ftoks as (
  select {id_col}, unnest(regexp_split_to_array({norm}, ' ')) as tok
  from {table}
),
fbk as (select {id_col}, {b} as b from ftoks),
feats as (
  select distinct {id_col}, b, 1.0 as x from fbk
  union all
  select {id_col}, -1::bigint as b, 1.0 as x from {table}
)"""


def lr_train(docs: DataFrame, label: Column, n_buckets: int = 256,
             iters: int = 3, lr: float = 1.0, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(b, weight) after ``iters`` full-batch GD rounds from zero
    weights; ``label`` is a 0/1 Column over ``docs``.  Every round:
    margin per doc (broadcast w), sigmoid, residual, per-bucket mean
    gradient, update — each stage rounded to 6 decimals."""
    spark = docs.sparkSession
    feats = lr_features(docs, n_buckets, text_col, id_col).localCheckpoint()
    lbl = docs.select(F.col(id_col), label.cast("double").alias("y"))
    lbl = lbl.localCheckpoint()
    n_docs = docs.count()
    w = spark.range(-1, n_buckets).select(
        F.col("id").alias("b"), F.lit(0.0).alias("wgt"))
    for _ in range(iters):
        marg = (feats.join(F.broadcast(w), "b")
                .groupBy(id_col)
                .agg(F.round(F.sum(F.col("wgt") * F.col("x")), 6)
                     .alias("marg")))
        resid = (marg.join(lbl, id_col)
                 .select(id_col,
                         F.round(F.col("y")
                                 - F.round(1.0 / (1.0 + F.exp(-F.col(
                                     "marg"))), 6), 6).alias("resid")))
        grad = (feats.join(resid, id_col)
                .groupBy("b")
                .agg(F.round(F.sum(F.col("resid") * F.col("x"))
                             / F.lit(float(n_docs)), 6).alias("grad")))
        w = (w.join(grad, "b", "left")
             .select("b", F.round(F.col("wgt")
                                  + lr * F.coalesce(F.col("grad"),
                                                    F.lit(0.0)), 6)
                     .alias("wgt"))
             .localCheckpoint())
    return w.filter(F.col("wgt") != 0.0).select("b", F.col("wgt")
                                                .alias("weight"))


def lr_train_sql(table: str, label_expr: str, n_buckets: int = 256,
                 iters: int = 3, lr: float = 1.0, text_col: str = "text",
                 id_col: str = "doc_id") -> str:
    parts = [
        _features_sql(table, n_buckets, text_col, id_col).lstrip(),
        f"lbl as (select {id_col}, ({label_expr})::double as y "
        f"from {table})",
        f"nn as (select count(*)::double as n from {table})",
        f"w0 as (select range as b, 0.0 as wgt from range(-1, {n_buckets}))",
    ]
    for t in range(iters):
        parts.append(f"""m{t} as (
  select {id_col}, round(sum(w{t}.wgt * feats.x), 6) as marg
  from feats join w{t} on feats.b = w{t}.b group by {id_col})""")
        parts.append(f"""r{t} as (
  select {id_col},
         round(y - round(1.0 / (1.0 + exp(-marg)), 6), 6) as resid
  from m{t} join lbl using ({id_col}))""")
        parts.append(f"""g{t} as (
  select b, round(sum(resid * x) / (select n from nn), 6) as grad
  from feats join r{t} using ({id_col}) group by b)""")
        parts.append(f"""w{t + 1} as (
  select w{t}.b,
         round(w{t}.wgt + {float(lr)!r} * coalesce(g{t}.grad, 0.0), 6)
           as wgt
  from w{t} left join g{t} on w{t}.b = g{t}.b)""")
    return ("with " + ",\n".join(parts)
            + f"\nselect b, wgt as weight from w{iters} where wgt <> 0.0")


def lr_score(docs: DataFrame, weights: DataFrame, n_buckets: int = 256,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, prob): sigmoid margin of every document under the
    trained weight table (broadcast; one per-doc agg).  LEFT join +
    coalesce: a document whose buckets all carry zero/absent weight
    (all-zero training, unseen vocabulary with a zero bias) must score
    sigmoid(0) = 0.5, not vanish from the output."""
    feats = lr_features(docs, n_buckets, text_col, id_col)
    marg = (feats.join(F.broadcast(weights), feats.b == weights.b,
                       "left")
            .groupBy(id_col)
            .agg(F.round(F.coalesce(
                F.sum(F.col("weight") * F.col("x")), F.lit(0.0)), 6)
                 .alias("marg")))
    return marg.select(id_col, F.round(
        1.0 / (1.0 + F.exp(-F.col("marg"))), 4).alias("prob"))


def lr_score_sql(table: str, label_expr: str, n_buckets: int = 256,
                 iters: int = 3, lr: float = 1.0, text_col: str = "text",
                 id_col: str = "doc_id") -> str:
    train = lr_train_sql(table, label_expr, n_buckets, iters, lr,
                         text_col, id_col)
    feats = _features_sql(table, n_buckets, text_col, id_col).lstrip()
    return f"""
with {feats},
wts as ({train}),
marg as (
  select {id_col},
         round(coalesce(sum(wts.weight * feats.x), 0.0), 6) as marg
  from feats left join wts on feats.b = wts.b group by {id_col}
)
select {id_col}, round(1.0 / (1.0 + exp(-marg)), 4) as prob
from marg
"""
