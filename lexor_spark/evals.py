"""Extraction-quality evaluation: token-level P/R/F1 per document.

Main-content extraction is tuned against gold standards (CleanEval,
Weninger et al.'s CETR evaluation, the boilerpipe/dragnet benchmarks):
the metric is token-level precision/recall of the extracted text
against a gold text.  This module computes it corpus-wide as a pure
DataFrame job so an extractor change (new writer rule, new density
threshold) can be scored on millions of pages, not a spot check:

    eval_extraction(gold_df, extracted_df) -> per-doc P/R/F1

Token multiset semantics (the standard scoring): both texts split on
whitespace, overlap = Σ_token min(count_gold, count_extracted),
P = overlap/|extracted|, R = overlap/|gold|, F1 = 2PR/(P+R); empty
sides score 0 by convention.  Multisets (not sets) so a boilerplate
extractor that repeats one gold word 100× doesn't score P=1.

Plan shape at 10^12 docs: explode → count per (doc_id, token) on each
side (map-side combinable), ONE equi-join on (doc_id, token) — both
sides co-partition on the same compound key, and the doc_id component
spreads any hot token across documents, so there is no hot-key skew —
then a doc_id-keyed rollup.  Everything numeric rounds to 6 decimals
for the cross-engine value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["eval_extraction", "eval_extraction_sql",
           "calibration_bins", "calibration_bins_sql",
           "eval_ranking", "eval_ranking_sql",
           "eval_auc", "eval_auc_sql"]


def _token_counts(df: DataFrame, id_col: str, text_col: str,
                  out: str) -> DataFrame:
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: t != "")
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(toks).alias("tok"))
            .groupBy("doc_id", "tok")
            .agg(F.count("*").alias(out)))


def eval_extraction(gold: DataFrame, extracted: DataFrame,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document token-level (n_gold, n_extracted, n_overlap,
    precision, recall, f1) of ``extracted`` against ``gold`` (both
    (id_col, text_col) tables).  Docs present only in ``gold`` score
    R=0 (extractor returned nothing); docs only in ``extracted`` score
    P=0 (hallucinated output) — full outer join keeps both."""
    g = _token_counts(gold, id_col, text_col, "cg")
    e = _token_counts(extracted, id_col, text_col, "ce")
    j = (g.join(e, ["doc_id", "tok"], "full_outer")
         .groupBy("doc_id")
         .agg(F.sum(F.coalesce("cg", F.lit(0))).alias("n_gold"),
              F.sum(F.coalesce("ce", F.lit(0))).alias("n_extracted"),
              F.sum(F.least(F.coalesce("cg", F.lit(0)),
                            F.coalesce("ce", F.lit(0))))
               .alias("n_overlap")))
    p = F.when(F.col("n_extracted") > 0,
               F.col("n_overlap") / F.col("n_extracted")).otherwise(0.0)
    r = F.when(F.col("n_gold") > 0,
               F.col("n_overlap") / F.col("n_gold")).otherwise(0.0)
    pr = F.round(p, 6).alias("precision")
    rr = F.round(r, 6).alias("recall")
    # F1 = 2PR/(P+R) simplifies to 2·overlap/(gold+extracted) — one
    # division, so both engines hit the identical float
    f1 = F.round(F.when(F.col("n_gold") + F.col("n_extracted") > 0,
                        2 * F.col("n_overlap")
                        / (F.col("n_gold") + F.col("n_extracted")))
                 .otherwise(0.0), 6).alias("f1")
    return (j.select("doc_id", "n_gold", "n_extracted", "n_overlap",
                     pr, rr, f1)
            .orderBy("doc_id"))


def eval_extraction_sql(gold_sql: str, extracted_sql: str,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB mirror of :func:`eval_extraction` over two SELECTs each
    producing (id_col, text_col)."""
    def counts(src: str, name: str, out: str) -> str:
        return f"""
{name} as (
  select {id_col} as doc_id, tok, count(*) as {out}
  from (select {id_col},
               unnest(list_filter(regexp_split_to_array({text_col},
                      '\\s+'), x -> x != '')) as tok
        from ({src}))
  group by {id_col}, tok)"""
    return f"""
with {counts(gold_sql, 'g', 'cg')},
{counts(extracted_sql, 'e', 'ce')},
j as (select coalesce(g.doc_id, e.doc_id) as doc_id,
             sum(coalesce(cg, 0))::bigint as n_gold,
             sum(coalesce(ce, 0))::bigint as n_extracted,
             sum(least(coalesce(cg, 0), coalesce(ce, 0)))::bigint
               as n_overlap
      from g full outer join e
        on g.doc_id = e.doc_id and g.tok = e.tok
      group by 1)
select doc_id, n_gold, n_extracted, n_overlap,
  round(case when n_extracted > 0
             then n_overlap / n_extracted::double else 0.0 end, 6)
    as precision,
  round(case when n_gold > 0
             then n_overlap / n_gold::double else 0.0 end, 6) as recall,
  round(case when n_gold + n_extracted > 0
             then 2 * n_overlap / (n_gold + n_extracted)::double
             else 0.0 end, 6) as f1
from j order by doc_id
"""

def eval_ranking(ranked: DataFrame, labels: DataFrame, k: int = 10,
                 id_col: str = "doc_id", order_col: str = "bm25",
                 label_col: str = "rel") -> DataFrame:
    """nDCG@k of a ranked result list against graded relevance labels
    (Järvelin & Kekäläinen 2002) — the ranking-side complement of
    :func:`eval_extraction`: DCG@k = Σ_{i≤k} (2^rel_i − 1)/log2(i+1)
    over the list in rank order (missing label → 0), IDCG@k = the same
    sum over the label table's k best grades, nDCG = DCG/IDCG (0 when
    IDCG is 0).  One output row ``(k, dcg, idcg, ndcg)``, everything
    rounded to 6 for the cross-engine oracle.

    Plan shape at scale: the ranked list is top-k (bounded by
    construction) and BROADCASTS into the label join; the ideal side
    is a TakeOrderedAndProject over the label table (k rows move, the
    deterministic (rel desc, id) order makes ties canonical) followed
    by a 1-row aggregate; the final combine is a 1-row × 1-row cross
    join.  Nothing corpus-sized ever shuffles."""
    from pyspark.sql import Window
    w = Window.orderBy(F.desc(order_col), id_col)
    rk = (F.broadcast(ranked.select(
            F.col(id_col), F.row_number().over(w).alias("rank")))
          .join(labels.select(id_col, label_col), id_col, "left")
          .filter(F.col("rank") <= k))
    gain = ((F.pow(F.lit(2.0),
                   F.coalesce(F.col(label_col), F.lit(0)).cast("double"))
             - 1.0) / F.log2(F.col("rank") + 1.0))
    dcg = rk.agg(F.round(F.sum(gain), 6).alias("dcg"))
    # top-k labels FIRST (TakeOrderedAndProject — k rows move), then
    # the ranking window runs over k rows, never the corpus
    iw = Window.orderBy(F.desc(label_col), id_col)
    ideal = (labels.select(label_col, id_col)
             .orderBy(F.desc(label_col), id_col).limit(k)
             .select(F.col(label_col),
                     F.row_number().over(iw).alias("irank")))
    igain = ((F.pow(F.lit(2.0), F.col(label_col).cast("double")) - 1.0)
             / F.log2(F.col("irank") + 1.0))
    idcg = ideal.agg(F.round(F.sum(igain), 6).alias("idcg"))
    return (dcg.crossJoin(F.broadcast(idcg))
            .select(F.lit(k).alias("k"), "dcg", "idcg",
                    F.when(F.col("idcg") > 0,
                           F.round(F.col("dcg") / F.col("idcg"), 6))
                     .otherwise(F.lit(0.0)).alias("ndcg")))


def eval_ranking_sql(ranked_sql: str, labels_sql: str, k: int = 10,
                     id_col: str = "doc_id", order_col: str = "bm25",
                     label_col: str = "rel") -> str:
    return f"""
with r as ({ranked_sql}),
l as ({labels_sql}),
rk as (
  select {id_col},
         row_number() over (order by {order_col} desc, {id_col}) as rank
  from r
),
g as (
  select rk.rank, coalesce(l.{label_col}, 0)::double as rel
  from rk left join l using ({id_col})
  where rk.rank <= {k}
),
d as (select round(sum((pow(2.0, rel) - 1.0) / log2(rank + 1.0)), 6)
        as dcg from g),
ideal as (
  select {label_col},
         row_number() over (order by {label_col} desc, {id_col}) as irank
  from l
),
i as (select round(sum((pow(2.0, {label_col}::double) - 1.0)
                       / log2(irank + 1.0)), 6) as idcg
      from ideal where irank <= {k})
select {k} as k, dcg, idcg,
       (case when idcg > 0 then round(dcg / idcg, 6) else 0.0 end) as ndcg
from d cross join i
"""


def calibration_bins(scores: DataFrame, labels: DataFrame,
                     n_bins: int = 10, id_col: str = "doc_id",
                     prob_col: str = "prob",
                     label_col: str = "label") -> DataFrame:
    """Reliability diagram + expected calibration error for a
    probabilistic quality classifier (the standard ECE analysis,
    Naeini et al. 2015 / Guo et al. 2017): predicted probabilities are
    cut into ``n_bins`` equal-width bins; per occupied bin the output
    row carries (bin, n, mean_pred, frac_pos, gap) plus the
    corpus-level ``ece`` (Σ n_b/N · |gap_b|, constant on every row).

    A quality gate that thresholds at p ≥ 0.5 is only as good as its
    calibration — a classifier that says 0.9 and is right 60% of the
    time silently shifts the corpus mix; this is the audit run before
    trusting the threshold at 10^12 docs.

    Plan shape: one id-keyed equi-join, bin assignment scan-side
    (``prob = 1.0`` clamps into the top bin), per-bin aggregates
    map-side combinable, and the only window runs over ≤ n_bins rows.
    All floats round to 6 decimals; ``gap``/``ece`` derive from the
    already-rounded bin means so they add no NEW float noise — the bin
    means themselves carry the usual order-dependent ~1e-13 sum noise
    under the 5e-7 rounding guard (the repo-standard avg-oracle
    tolerance)."""
    from pyspark.sql import Window

    j = scores.join(labels, id_col)
    b = F.least(F.floor(F.col(prob_col) * n_bins),
                F.lit(n_bins - 1)).cast("int")
    per = (j.select(b.alias("bin"), F.col(prob_col).alias("p"),
                    F.col(label_col).cast("int").alias("y"))
           .groupBy("bin")
           .agg(F.count("*").alias("n"),
                F.round(F.avg("p"), 6).alias("mean_pred"),
                F.round(F.avg("y"), 6).alias("frac_pos")))
    gap = F.round(F.col("mean_pred") - F.col("frac_pos"), 6)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.unboundedFollowing)
    ece = F.round(F.sum(F.abs(F.col("gap")) * F.col("n")).over(w)
                  / F.sum("n").over(w), 6)
    return (per.withColumn("gap", gap)
            .withColumn("ece", ece)
            .select("bin", "n", "mean_pred", "frac_pos", "gap", "ece")
            .orderBy("bin"))


def calibration_bins_sql(scores_sql: str, labels_sql: str,
                         n_bins: int = 10, id_col: str = "doc_id",
                         prob_col: str = "prob",
                         label_col: str = "label") -> str:
    """DuckDB mirror of :func:`calibration_bins` over two SELECTs
    producing (id, prob) and (id, label)."""
    return f"""
with s as ({scores_sql}),
l as ({labels_sql}),
j as (
  select least(floor(s.{prob_col} * {n_bins}), {n_bins - 1})::int
           as bin,
         s.{prob_col} as p, l.{label_col}::int as y
  from s join l on s.{id_col} = l.{id_col}
),
per as (
  select bin, count(*)::bigint as n, round(avg(p), 6) as mean_pred,
         round(avg(y), 6) as frac_pos
  from j group by bin
),
g as (select *, round(mean_pred - frac_pos, 6) as gap from per)
select bin, n, mean_pred, frac_pos, gap,
       round(sum(abs(gap) * n) over () / sum(n) over (), 6) as ece
from g order by bin
"""


def eval_auc(scores: DataFrame, labels: DataFrame, id_col: str = "doc_id",
             prob_col: str = "prob", label_col: str = "label") -> DataFrame:
    """ROC-AUC of a probabilistic quality classifier via the
    Mann-Whitney rank statistic — threshold-free ranking quality, the
    companion audit to :func:`calibration_bins` (which checks the
    probabilities; this checks the ORDERING a top-p% corpus selection
    actually consumes).

    AUC = P(score_pos > score_neg) + ½·P(tie), computed without any
    per-pair work: group by distinct score, sweep scores ascending
    accumulating negatives seen so far, and credit each score's
    positives with (negatives strictly below + half the negatives tied
    at the same score).  All counts stay integers in 2× units
    (``2·below + tied``), so the single final division is the only
    float op — bit-identical across engines, no tolerance needed.
    The rank-sum itself is ≈ 2·n_pos·n_neg, which exceeds int64 once
    n_pos·n_neg > ~4.6e18 (easily reached at 10^12 docs), so the
    per-score contribution is multiplied and summed in decimal(38,0)
    on the Spark side and hugeint in the DuckDB mirror — exact
    integer arithmetic either way, same single final division.

    Output: one row (n_pos, n_neg, auc).  Degenerate single-class
    inputs yield auc = NULL (division by zero pairs) rather than a
    fake 0/1.

    Plan shape at 10^12 docs: one id-keyed equi-join, one
    map-side-combinable groupBy on the score value, and the only
    window runs over the DISTINCT-score table (≤ 10^4 rows for a
    4-decimal probability column) — never the corpus."""
    from pyspark.sql import Window

    j = (scores.join(labels, id_col)
         .select(F.col(prob_col).alias("p"),
                 F.col(label_col).cast("int").alias("y")))
    per = (j.groupBy("p")
           .agg(F.sum("y").alias("pos"),
                F.sum(1 - F.col("y")).alias("neg")))
    w = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    below = F.coalesce(F.sum("neg").over(w), F.lit(0))
    # decimal(38,0) BEFORE the multiply: pos·(2·below+neg) ≈ 2·n_pos·n_neg
    # wraps int64 silently under non-ANSI sums at trillion-doc scale
    contrib = (F.col("pos").cast("decimal(38,0)")
               * (2 * below + F.col("neg")))
    return (per.select(F.col("pos"), F.col("neg"),
                       contrib.alias("num"))
            .select(F.sum("pos").over(wall).alias("n_pos"),
                    F.sum("neg").over(wall).alias("n_neg"),
                    F.sum("num").over(wall).alias("num"))
            .limit(1)
            .select("n_pos", "n_neg",
                    F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                           F.round(F.col("num") /
                                   (2.0 * F.col("n_pos") * F.col("n_neg")),
                                   6)).alias("auc")))


def eval_auc_sql(scores_sql: str, labels_sql: str, id_col: str = "doc_id",
                 prob_col: str = "prob", label_col: str = "label") -> str:
    """DuckDB mirror of :func:`eval_auc` — identical integer rank-sum,
    identical single division."""
    return f"""
with s as ({scores_sql}),
l as ({labels_sql}),
j as (
  select s.{prob_col} as p, l.{label_col}::int as y
  from s join l on s.{id_col} = l.{id_col}
),
per as (
  select p, sum(y)::bigint as pos, sum(1 - y)::bigint as neg
  from j group by p
),
acc as (
  select pos, neg,
         pos::hugeint * (2 * coalesce(sum(neg) over (order by p
                  rows between unbounded preceding and 1 preceding), 0)
                + neg) as num
  from per
)
select sum(pos)::bigint as n_pos, sum(neg)::bigint as n_neg,
       case when sum(pos) > 0 and sum(neg) > 0
            then round(sum(num) / (2.0 * sum(pos) * sum(neg)), 6)
            end as auc
from acc
"""
