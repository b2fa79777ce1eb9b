"""Corpus-trained character-bigram language-model quality scoring.

The public pipeline pattern (CCNet, Wenzek et al. 2019): train a small
LM on a trusted reference corpus, score every candidate document by its
per-token log-probability, and filter/bucket on the score — documents
that "look like" the reference score high, gibberish and boilerplate
score low.  CCNet uses a KenLM 5-gram over Wikipedia; this module is
the same *shape* with an exactly-reproducible model: a character-bigram
MLE LM with an out-of-vocabulary floor, so the DuckDB oracle can verify
values, not just rows.

Model: over the normalized training text, ``p(c2 | c1) =
count(c1c2) / count(c1·)``.  A bigram unseen in training (or with an
unseen context character) gets the floor ``1 / (T + 1)`` where ``T`` is
the total training bigram count.  Document score = mean natural log
probability of its bigrams (0 > score > ln(floor); higher = more like
the training corpus).

Plan shape at scale (10^12 docs): the model is two map-side-combinable
aggregations over the *training* slice (the key space is the squared
character vocabulary — tiny), and the model tables BROADCAST to the
scoring side, which therefore never shuffles: scan → per-row bigram
explode → broadcast hash joins → one map-side-combinable per-doc agg.
No reference counterpart (the reference converts documents, it does not
score them); public method per the paper above.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lexor_spark.textfns import SQL, _let, normalize_text

__all__ = ["lm_score", "lm_score_sql"]


def _bigrams(col: Column) -> Column:
    """All overlapping character bigrams of the normalized text
    (array<string>; a 0/1-char text yields its whole self once so every
    document scores).  The normalized text is let-bound: inlined into
    the transform lambda, Catalyst would re-run the normalize regex
    chain once PER BIGRAM — O(len²) per row (the same trap
    `textfns._bigrams` fixes; measured 3.1× on lm_score at sf0.1,
    interleaved A/B, value-identical)."""
    return _let(normalize_text(col), lambda t: F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - 1, F.lit(1))),
        lambda i: F.substring(t, i, 2)))


def _bigrams_sql(c: str) -> str:
    norm = SQL.NORMALIZE.format(c=c)
    return (f"list_transform(generate_series(1, "
            f"greatest(length({norm}) - 1, 1)), "
            f"i -> substr({norm}, i, 2))")


def lm_score(docs: DataFrame, train: Optional[DataFrame] = None,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lm_score, n_bigrams): mean ln-probability of each
    document under the bigram LM trained on ``train`` (default: the
    corpus itself — self-scoring, which ranks documents by how typical
    they are of the whole crawl)."""
    train = docs if train is None else train
    tb = train.select(F.explode(_bigrams(F.col(text_col))).alias("g"))
    bc = tb.groupBy("g").agg(F.count("*").alias("c"))
    cc = (bc.groupBy(F.substring("g", 1, 1).alias("ch"))
          .agg(F.sum("c").alias("n")))
    tot = tb.agg(F.count("*").alias("t"))
    db = docs.select(F.col(id_col),
                     F.explode(_bigrams(F.col(text_col))).alias("g"))
    p = F.coalesce(F.col("c").cast("double") / F.col("n"),
                   F.lit(1.0) / (F.col("t") + 1))
    j = (db.join(F.broadcast(bc), "g", "left")
         .join(F.broadcast(cc),
               F.substring(F.col("g"), 1, 1) == F.col("ch"), "left")
         .crossJoin(F.broadcast(tot)))
    return (j.groupBy(id_col)
            .agg(F.round(F.avg(F.log(p)), 4).alias("lm_score"),
                 F.count("*").alias("n_bigrams")))


def lm_score_sql(table: str, train_pred: str = "true",
                 text_col: str = "text", id_col: str = "doc_id") -> str:
    bg = _bigrams_sql(text_col)
    return f"""
with tb as (
  select unnest({bg}) as g from {table} where {train_pred}
),
bc as (select g, count(*)::bigint as c from tb group by 1),
cc as (select substr(g, 1, 1) as ch, sum(c)::bigint as n from bc group by 1),
tot as (select count(*)::bigint as t from tb),
db as (select {id_col}, unnest({bg}) as g from {table}),
j as (
  select {id_col},
         coalesce(bc.c::double / cc.n, 1.0 / (tot.t + 1)) as p
  from db
  left join bc using (g)
  left join cc on substr(db.g, 1, 1) = cc.ch
  cross join tot
)
select {id_col}, round(avg(ln(p)), 4) as lm_score,
       count(*)::bigint as n_bigrams
from j group by {id_col}
"""
