"""Corpus-level statistical diagnostics for training-data pipelines.

Two classical laws, each a one-line health check on a crawl-derived
corpus (public methods: Zipf 1949; Heaps 1978; both standard in the
corpus-linguistics literature, e.g. Manning & Schütze ch. 1):

* **Zipf fit** — the log-log slope of term frequency vs frequency rank
  over the top-N terms.  Natural-language corpora sit near -1; spammy
  or template-dominated corpora flatten (boilerplate inflates the head)
  or steepen (tiny vocabulary).  A drifting slope between two crawl
  snapshots is an early contamination/boilerplate alarm.
* **Heaps law** — vocabulary growth V(n) ≈ k·n^β against cumulative
  token count (β ≈ 0.4-0.6 for natural text).  β collapsing toward 0
  means the crawl is re-reading the same template; β near 1 means
  junk/UUID-like token soup.

Scale notes (the 100-TB shapes):

* Zipf never sorts the vocabulary globally: term counts are one
  map-side-combinable aggregation, and the top-N head is
  ``TakeOrderedAndProject`` (per-partition heaps, N rows to one task).
  The regression itself runs over N ≤ a few hundred rows.
* Heaps never windows over the corpus: the document axis is bucketed by
  a scan-side function of the doc id (min/max ids broadcast from a
  1-row aggregate), per-bucket token sums and per-term first-bucket are
  both map-side-combinable aggregations, and the only windows run over
  ``n_buckets`` rows.

Both have exact DuckDB mirrors (same arithmetic shape, ``round(…, 4)``
on every float output) so the driver value-oracles them end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lexor_spark.textfns import SQL as TSQL
from lexor_spark.textfns import normalize_text

__all__ = ["zipf_fit", "zipf_fit_sql", "heaps_law", "heaps_law_sql",
           "corpus_card", "corpus_card_sql",
           "collocations", "collocations_sql"]


def _terms(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) rows: normalized whitespace tokens, empties dropped."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    return (docs
            .select(F.col(id_col).alias("_id"), toks.alias("_toks"))
            .select("_id", F.explode("_toks").alias("term"))
            .where(F.col("term") != ""))


_TERMS_SQL = """
select {id_col} as _id, t.term
from {table}, unnest(regexp_split_to_array({norm}, ' ')) as t(term)
where t.term != ''
"""


def zipf_fit(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", top_n: int = 200) -> DataFrame:
    """OLS fit of ln(freq) against ln(rank) over the ``top_n`` most
    frequent terms.  Returns one row: ``(n_terms, total_freq, slope,
    intercept)`` with slope/intercept rounded to 4 decimals.

    Plan: scan → explode → groupBy(term) count (partial agg) →
    TakeOrderedAndProject(top_n) → window-rank over top_n rows →
    single tiny aggregate.  Nothing corpus-sized is ever sorted.

    Cross-engine note: the co-moment sums are accumulation-order-
    dependent floats; the ``round(…, 4)`` output guard leaves ~1e-13
    of noise against a 5e-5 rounding boundary (the same tolerance
    every avg/ratio oracle in this repo relies on — flake odds are
    negligible, unlike the bit-exact integer/max estimators which are
    engineered order-independent)."""
    freq = (_terms(docs, text_col, id_col)
            .groupBy("term").agg(F.count("*").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("term"))
            .limit(top_n))
    ranked = freq.withColumn(
        "r", F.row_number().over(
            Window.orderBy(F.desc("freq"), F.asc("term"))))
    lr = F.log("r")
    lf = F.log("freq")
    return (ranked
            .agg(F.count("*").alias("n_terms"),
                 F.sum("freq").alias("total_freq"),
                 (F.covar_pop(lr, lf) / F.var_pop(lr)).alias("_slope"),
                 F.avg(lf).alias("_mlf"), F.avg(lr).alias("_mlr"))
            .select("n_terms", "total_freq",
                    F.round("_slope", 4).alias("slope"),
                    F.round(F.col("_mlf") - F.col("_slope") * F.col("_mlr"),
                            4).alias("intercept")))


def zipf_fit_sql(table: str, text_col: str = "text",
                 id_col: str = "doc_id", top_n: int = 200) -> str:
    terms = _TERMS_SQL.format(table=table, id_col=id_col,
                              norm=TSQL.NORMALIZE.format(c=text_col))
    return f"""
with terms as ({terms}),
freq as (
  select term, count(*) as freq from terms group by term
  order by freq desc, term limit {top_n}
),
ranked as (
  select freq, row_number() over (order by freq desc, term) as r
  from freq
),
fit as (
  select count(*) as n_terms, sum(freq)::bigint as total_freq,
         covar_pop(ln(r), ln(freq)) / var_pop(ln(r)) as _slope,
         avg(ln(freq)) as _mlf, avg(ln(r)) as _mlr
  from ranked
)
select n_terms, total_freq, round(_slope, 4) as slope,
       round(_mlf - _slope * _mlr, 4) as intercept
from fit
"""


def heaps_law(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", n_buckets: int = 20) -> DataFrame:
    """Vocabulary-growth curve: the document axis (ordered by doc id) is
    cut into ``n_buckets`` equal id-range buckets; per bucket the output
    row carries cumulative tokens, cumulative distinct vocabulary, and
    the corpus-level Heaps exponent β (the ln-ln OLS slope across the
    bucket checkpoints, constant on every row).

    The bucket is a pure function of the doc id given broadcast
    min/max — no global sort, no corpus-sized window; ``min(bucket)``
    per term and ``sum(tokens)`` per bucket are both partial-agg
    friendly, and every window below runs over ``n_buckets`` rows."""
    bounds = docs.agg(F.min(id_col).alias("_lo"),
                      F.max(id_col).alias("_hi"))
    span = F.col("_hi") - F.col("_lo") + 1
    bucket = F.floor((F.col("_id") - F.col("_lo")) * n_buckets / span) \
              .cast("int").alias("bucket")

    terms = _terms(docs, text_col, id_col).crossJoin(F.broadcast(bounds))
    per_term = (terms.select(bucket, "term")
                .groupBy("term").agg(F.min("bucket").alias("first_b")))
    new_vocab = per_term.groupBy("first_b").agg(
        F.count("*").alias("new_terms"))
    per_bucket = (terms.select(bucket)
                  .groupBy("bucket").agg(F.count("*").alias("toks")))

    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grown = (per_bucket
             .join(new_vocab, per_bucket.bucket == new_vocab.first_b,
                   "left")
             .select("bucket", "toks",
                     F.coalesce("new_terms", F.lit(0)).alias("new_terms"))
             .withColumn("tokens_cum", F.sum("toks").over(w))
             .withColumn("vocab_cum", F.sum("new_terms").over(w)))
    wall = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    lt = F.log("tokens_cum")
    lv = F.log("vocab_cum")
    return (grown
            .withColumn("heaps_beta",
                        F.round(F.covar_pop(lt, lv).over(wall)
                                / F.var_pop(lt).over(wall), 4))
            .select("bucket", "tokens_cum", "vocab_cum", "heaps_beta"))


def heaps_law_sql(table: str, text_col: str = "text",
                  id_col: str = "doc_id", n_buckets: int = 20) -> str:
    terms = _TERMS_SQL.format(table=table, id_col=id_col,
                              norm=TSQL.NORMALIZE.format(c=text_col))
    return f"""
with terms as ({terms}),
bounds as (
  select min({id_col}) as _lo, max({id_col}) as _hi from {table}
),
bucketed as (
  select cast(floor((_id - _lo) * {n_buckets}
              / (_hi - _lo + 1)) as int) as bucket, term
  from terms, bounds
),
per_term as (
  select term, min(bucket) as first_b from bucketed group by term
),
new_vocab as (
  select first_b, count(*) as new_terms from per_term group by first_b
),
per_bucket as (
  select bucket, count(*) as toks from bucketed group by bucket
),
grown as (
  select b.bucket, b.toks, coalesce(v.new_terms, 0) as new_terms,
         sum(b.toks) over (order by b.bucket)::bigint as tokens_cum,
         sum(coalesce(v.new_terms, 0)) over (order by b.bucket)::bigint
           as vocab_cum
  from per_bucket b left join new_vocab v on b.bucket = v.first_b
)
select bucket, tokens_cum, vocab_cum,
       round(covar_pop(ln(tokens_cum), ln(vocab_cum)) over ()
             / var_pop(ln(tokens_cum)) over (), 4) as heaps_beta
from grown
"""


def corpus_card(docs: DataFrame, text_col: str = "text",
                lang_col: str = "lang") -> DataFrame:
    """The per-language DATASET-CARD statistics table (the numbers every
    public corpus release publishes — C4/ROOTS/FineWeb dataset cards):
    per language, document count + share, token totals/means, exact
    p50/p90 token-count quantiles, mean heuristic quality, and the
    fraction of docs passing the quality >= 0.5 bar.

    One groupBy(lang) over scan-side token/quality expressions — every
    aggregate except the quantiles is map-side combinable; the exact
    ``percentile`` is a per-group sort kept for bit-identical
    oracle-ability (swap to ``approx_percentile`` at 10^12 docs — same
    plan shape, sketch-merged instead of sorted).  The corpus total for
    the share column comes from the already-aggregated per-language
    rows (one window over <= #languages rows) — the corpus is scanned
    exactly once."""
    from lexor_spark.textfns import quality_score, token_count

    d = docs.select(
        F.col(lang_col).alias("lang"),
        token_count(F.col(text_col)).cast("long").alias("toks"),
        quality_score(F.col(text_col)).alias("q"))
    per = (d.groupBy("lang")
           .agg(F.count("*").alias("n_docs"),
                F.sum("toks").alias("total_tokens"),
                F.round(F.avg("toks"), 4).alias("mean_tokens"),
                F.round(F.percentile("toks", F.lit(0.5)), 4)
                 .alias("p50_tokens"),
                F.round(F.percentile("toks", F.lit(0.9)), 4)
                 .alias("p90_tokens"),
                F.round(F.avg("q"), 4).alias("mean_quality"),
                F.round(F.avg((F.col("q") >= 0.5).cast("int")), 4)
                 .alias("keep_frac")))
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    return (per
            .select("lang", "n_docs",
                    F.round(F.col("n_docs")
                            / F.sum("n_docs").over(wall), 4)
                     .alias("share"),
                    "total_tokens", "mean_tokens", "p50_tokens",
                    "p90_tokens", "mean_quality", "keep_frac")
            .orderBy("lang"))


def corpus_card_sql(table: str, text_col: str = "text",
                    lang_col: str = "lang") -> str:
    from lexor_spark.textfns import SQL as TF
    toks = TF.TOKEN_COUNT.format(c=text_col)
    q = TF.quality_score(text_col)
    return f"""
with d as (
  select {lang_col} as lang, ({toks})::bigint as toks, {q} as q
  from {table}
),
per as (
  select lang, count(*)::bigint as n_docs,
         sum(toks)::bigint as total_tokens,
         round(avg(toks), 4) as mean_tokens,
         round(quantile_cont(toks, 0.5), 4) as p50_tokens,
         round(quantile_cont(toks, 0.9), 4) as p90_tokens,
         round(avg(q), 4) as mean_quality,
         round(avg((q >= 0.5)::int), 4) as keep_frac
  from d group by lang
)
select lang, n_docs,
       round(n_docs / sum(n_docs) over ()::double, 4) as share,
       total_tokens, mean_tokens, p50_tokens, p90_tokens,
       mean_quality, keep_frac
from per order by lang
"""


def collocations(docs: DataFrame, min_count: int = 5, k: int = 100,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` adjacent-bigram COLLOCATIONS by pointwise mutual
    information (Church & Hanks 1990 — the classic multi-word-
    expression miner; tokenizer pipelines use it to decide which word
    pairs deserve vocabulary entries, template miners to spot frozen
    phrases).  PMI = ln(c(ab)·N / (c(a)·c(b))) over corpus counts with
    a ``min_count`` support floor (PMI is unstable on rare pairs).

    Output (a, b, n_ab, pmi) ordered by (pmi desc, a, b) — the PMI
    argument is one double division of exact integer counts, so both
    engines take ``ln`` of the identical double and ``round(…, 4)`` is
    engine-stable.

    Plan: ONE let-bound token split serves unigram and bigram counts
    (both map-side-combinable aggs); the bigram→unigram count joins
    are term-keyed equi-joins (stopword-hot keys join against a
    1-row-per-term count table, so no key explodes); the answer is
    TakeOrderedAndProject(k)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    words = (docs.select(F.explode(toks).alias("w"))
             .where(F.col("w") != ""))
    uni = words.groupBy("w").agg(F.count("*").alias("c"))
    total = words.agg(F.count("*").alias("n"))
    pairs = (docs.select(F.explode(
        F.filter(F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                            F.slice(toks, 2, F.size(toks) - 1),
                            lambda a, b: F.struct(a.alias("a"),
                                                  b.alias("b"))),
                 lambda s: (s.a != "") & (s.b != ""))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b")))
    big = (pairs.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
           .filter(F.col("n_ab") >= min_count))
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    # every factor cast to double BEFORE the multiplies: long*long
    # silently overflows at 10^14-token corpora, and the fixed
    # (ab*n)/(ca*cb) IEEE sequence is what the DuckDB mirror replays
    pmi = F.round(F.log(
        (F.col("n_ab").cast("double") * F.col("n").cast("double"))
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))), 4)
    return (big.join(ua, "a").join(ub, "b")
            .crossJoin(F.broadcast(total))
            .select("a", "b", "n_ab", pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), "a", "b").limit(k))


def collocations_sql(table: str, min_count: int = 5, k: int = 100,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    norm = TSQL.NORMALIZE.format(c=text_col)
    return f"""
with d as (
  select regexp_split_to_array({norm}, ' ') as toks from {table}
),
words as (
  select t.w from d, unnest(toks) as t(w) where t.w != ''
),
uni as (select w, count(*)::bigint as c from words group by w),
total as (select count(*)::bigint as n from words),
pairs as (
  select toks[i] as a, toks[i + 1] as b
  from d, unnest(generate_series(1, len(toks) - 1)) as g(i)
  where toks[i] != '' and toks[i + 1] != ''
),
big as (
  select a, b, count(*)::bigint as n_ab from pairs group by a, b
  having count(*) >= {min_count}
)
select big.a, big.b, big.n_ab,
       round(ln((big.n_ab::double * total.n::double)
                / (ua.c::double * ub.c::double)), 4) as pmi
from big
join uni ua on big.a = ua.w
join uni ub on big.b = ub.w
cross join total
order by pmi desc, big.a, big.b limit {k}
"""
