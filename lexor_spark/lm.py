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

__all__ = ["lm_score", "lm_score_sql", "lm_buckets", "lm_buckets_sql"]


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


def lm_buckets(docs: DataFrame, train: Optional[DataFrame] = None,
               text_col: str = "text", id_col: str = "doc_id",
               lang_col: str = "lang") -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2019
    §4.4): per LANGUAGE, rank documents by LM score and cut the
    distribution in thirds — ``head`` = the third most like the
    reference LM (highest mean log-prob here), ``tail`` = the least.
    CCNet trains downstream models on head/middle and drops tail.

    Buckets are assigned by SCORE VALUE, not row position: the head
    cutoff is the highest score whose descending cumulative count
    reaches ⌈n/3⌉, so tied scores always land in the same bucket and
    the result is order-independent (exactly reproducible in DuckDB —
    a row_number cut would depend on engine sort stability).

    Plan shape at 10^12 docs: scoring is :func:`lm_score` (broadcast
    model, scan-side); the distribution step aggregates to the
    DISTINCT (lang, score) table first — lm_score rounds to 4
    decimals, so that table is at most ~langs × tens-of-thousands of
    rows regardless of corpus size — and the only window runs over it,
    never over documents.  Cutoffs (2 values/lang) broadcast back;
    bucket assignment is a scan-side comparison.  The same two-level
    trick as ``domain_cap``.
    """
    from pyspark.sql import Window

    # scored feeds BOTH the cutoff branch and the final assignment —
    # materialize once (the pagerank/hits recipe) or the whole
    # broadcast-LM scoring pipeline runs twice
    scored = (lm_score(docs, train, text_col, id_col)
              .join(docs.select(id_col, lang_col), id_col)
              .localCheckpoint())
    per = (scored.groupBy(lang_col, "lm_score")
           .agg(F.count("*").alias("c")))
    w = (Window.partitionBy(lang_col)
         .orderBy(F.desc("lm_score"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = per.select(
        lang_col, "lm_score",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(lang_col)).alias("n"))
    cuts = cum.groupBy(lang_col).agg(
        F.max(F.when(F.col("cum") * 3 >= F.col("n"),
                     F.col("lm_score"))).alias("c_head"),
        F.max(F.when(F.col("cum") * 3 >= 2 * F.col("n"),
                     F.col("lm_score"))).alias("c_mid"))
    bucket = (F.when(F.col("lm_score") >= F.col("c_head"), "head")
              .when(F.col("lm_score") >= F.col("c_mid"), "middle")
              .otherwise("tail"))
    return (scored.join(F.broadcast(cuts), lang_col)
            .select(id_col, lang_col, "lm_score",
                    bucket.alias("bucket"))
            .orderBy(id_col))


def lm_buckets_sql(table: str, train_pred: str = "true",
                   text_col: str = "text", id_col: str = "doc_id",
                   lang_col: str = "lang") -> str:
    """DuckDB mirror of :func:`lm_buckets` (value-for-value: the score
    comes from :func:`lm_score_sql`, the cuts from the same
    distinct-score cumulative rule)."""
    return f"""
with s as (
  select sc.{id_col}, d.{lang_col}, sc.lm_score
  from ({lm_score_sql(table, train_pred, text_col, id_col)}) sc
  join {table} d using ({id_col})
),
per as (select {lang_col}, lm_score, count(*)::bigint as c
        from s group by 1, 2),
cum as (select {lang_col}, lm_score,
               sum(c) over (partition by {lang_col}
                            order by lm_score desc
                            rows unbounded preceding) as cum,
               sum(c) over (partition by {lang_col}) as n
        from per),
cuts as (select {lang_col},
                max(case when cum * 3 >= n then lm_score end) as c_head,
                max(case when cum * 3 >= 2 * n then lm_score end) as c_mid
         from cum group by 1)
select s.{id_col}, s.{lang_col}, s.lm_score,
       case when s.lm_score >= cuts.c_head then 'head'
            when s.lm_score >= cuts.c_mid then 'middle'
            else 'tail' end as bucket
from s join cuts using ({lang_col})
order by s.{id_col}
"""


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
