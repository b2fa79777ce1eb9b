"""BM25 full-text ranking over the documents table.

The classic Robertson/Sparck-Jones Okapi BM25 with the Lucene idf
variant (``ln(1 + (N - df + 0.5) / (df + 0.5))`` — always positive):

    score(d, Q) = sum_t idf(t) * tf * (k1 + 1)
                  / (tf + k1 * (1 - b + b * dl / avgdl))

Plan shape at scale (10^12 docs): the query's term list is a tiny
Python constant compiled into scan-side expressions — per-document
``tf`` per term and ``dl`` come from ONE token split (let-bound struct,
no explode, no inverted-index shuffle).  Corpus statistics (N, avgdl,
per-term df) are a single map-side-combinable aggregation producing ONE
row, which cross-joins back by broadcast; scoring is then a pure
scan-side expression and the top-k is a TakeOrderedAndProject.  Nothing
ever shuffles more than the 1-row stats and k result rows.  No
reference counterpart (the reference converts documents, it does not
rank them); method per the published BM25 literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lexor_spark.textfns import SQL, _let, normalize_text

__all__ = ["bm25_topk", "bm25_topk_sql", "tfidf_keywords",
           "snippets", "snippets_sql", "serp_dedup", "serp_dedup_sql",
           "tfidf_keywords_sql", "ngram_counts", "ngram_counts_sql",
           "build_postings", "build_postings_sql",
           "bm25_from_postings", "bm25_from_postings_sql",
           "merge_postings",
           "merge_postings_sql", "phrase_search",
           "phrase_search_sql"]


def _norm_terms(query: str) -> list[str]:
    """Lowercased whitespace terms, de-duplicated, order kept — the
    same normalization the document tokens get."""
    seen: dict[str, None] = {}
    for t in query.lower().split():
        seen.setdefault(t, None)
    return list(seen)


def _row_stats(col: Column, terms: list[str]) -> Column:
    """struct(dl, tfs): document length and per-query-term counts from
    ONE let-bound token split (an empty doc normalizes to the single
    token ``''`` which is filtered from dl and can never equal a real
    term)."""
    toks = F.split(normalize_text(col), " ")
    return _let(toks, lambda t: F.struct(
        F.size(F.filter(t, lambda x: x != F.lit(""))).alias("dl"),
        F.array(*[F.size(F.filter(t, lambda x: x == F.lit(term)))
                  for term in terms]).alias("tfs")))


def bm25_topk(docs: DataFrame, query: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25: (doc_id, dl, bm25)
    ordered by rounded score desc then doc_id (the deterministic
    tie-break, mirrored in the oracle)."""
    terms = _norm_terms(query)
    if not terms:
        raise ValueError("bm25_topk: empty query")
    d = docs.select(F.col(id_col),
                    _row_stats(F.col(text_col), terms).alias("s"))
    d = d.select(id_col, F.col("s.dl").alias("dl"),
                 F.col("s.tfs").alias("tfs"))
    stats = d.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
        *[F.sum((F.element_at("tfs", i + 1) > 0).cast("long"))
          .alias(f"df{i}") for i in range(len(terms))])
    j = d.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.element_at("tfs", i + 1).cast("double")
        idf = F.log(1.0 + (F.col("n") - F.col(f"df{i}") + 0.5)
                    / (F.col(f"df{i}") + 0.5))
        term = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * F.col("dl")
                                                 / F.col("avgdl")))
        score = term if score is None else score + term
    out = (j.select(F.col(id_col), F.col("dl").cast("long").alias("dl"),
                    F.round(score, 4).alias("bm25"))
           .filter(F.col("bm25") > 0)
           .orderBy(F.desc("bm25"), id_col).limit(k))
    return out


def bm25_topk_sql(table: str, query: str, k: int = 10, k1: float = 1.2,
                  b: float = 0.75, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    terms = _norm_terms(query)
    norm = SQL.NORMALIZE.format(c=text_col)
    tf_exprs = ", ".join(
        "len(list_filter(toks, x -> x = '{0}'))::bigint as tf{1}"
        .format(t.replace("'", "''"), i)
        for i, t in enumerate(terms))
    df_exprs = ", ".join(
        f"sum(case when tf{i} > 0 then 1 else 0 end)::bigint as df{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"(ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5)) * tf{i} * ({k1} + 1)"
        f" / (tf{i} + {k1} * (1 - {b} + {b} * dl / avgdl)))"
        for i in range(len(terms)))
    return f"""
with d as (
  select {id_col}, regexp_split_to_array({norm}, ' ') as toks from {table}
),
s as (
  select {id_col},
         len(list_filter(toks, x -> x <> ''))::bigint as dl,
         {tf_exprs}
  from d
),
st as (
  select count(*)::bigint as n, avg(dl) as avgdl, {df_exprs} from s
),
sc as (
  select {id_col}, dl, round({score}, 4) as bm25
  from s cross join st
)
select {id_col}, dl, bm25 from sc
where bm25 > 0
order by bm25 desc, {id_col} limit {k}
"""


def tfidf_keywords(docs: DataFrame, k: int = 3, text_col: str = "text",
                   id_col: str = "doc_id", salt: int = 0) -> DataFrame:
    """Top-``k`` tf-idf keywords per document: (doc_id, term, rank,
    score) with smoothed idf ``ln((N + 1) / (df + 1)) + 1`` and
    deterministic ties (rounded score desc, then term).

    Plan shape at scale: explode → one (doc, term) map-side-combinable
    tf agg; df is a term-keyed agg OVER the tf table (vocabulary-sized,
    far smaller than the corpus); N is a 1-row broadcast.  The ranking
    window partitions by doc_id — per-document, so never skewed.

    The tf⋈df term join has HOT KEYS by construction: a stopword's df
    row joins against one tf row per document that contains it — one
    key, ~n_docs rows.  AQE skew-split absorbs moderate cases; for a
    corpus where that is the straggler, ``salt=R`` replicates each df
    row R ways and routes tf rows by ``pmod(hash(doc_id), R)``, bounding
    any term's per-task row count to n_docs/R.  Values are identical
    for every salt (pinned by test_search_dsir.py)."""
    from pyspark.sql import Window
    toks = (docs.select(F.col(id_col),
                        F.explode(F.split(normalize_text(F.col(text_col)),
                                          " ")).alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nn = docs.agg(F.count("*").cast("double").alias("n"))
    score = F.round(
        F.col("tf") * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1), 4)
    if salt > 1:
        dfreq = dfreq.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        tf = tf.withColumn(
            "_salt", F.pmod(F.hash(F.col(id_col)), F.lit(salt)))
        joined = tf.join(dfreq, ["term", "_salt"])
    else:
        joined = tf.join(dfreq, "term")
    scored = (joined.crossJoin(F.broadcast(nn))
              .select(id_col, "term", score.alias("score")))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "term")
    return (scored.select(id_col, "term",
                          F.row_number().over(w).alias("rank"), "score")
            .filter(F.col("rank") <= k))


def tfidf_keywords_sql(table: str, k: int = 3, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    norm = SQL.NORMALIZE.format(c=text_col)
    return f"""
with toks as (
  select {id_col}, unnest(regexp_split_to_array({norm}, ' ')) as term
  from {table}
),
t as (select {id_col}, term, count(*)::bigint as tf
      from toks where term <> '' group by 1, 2),
d as (select term, count(*)::bigint as df from t group by 1),
nn as (select count(*)::double as n from {table}),
s as (select {id_col}, t.term,
             round(t.tf * (ln((nn.n + 1) / (d.df + 1)) + 1), 4) as score
      from t join d using (term) cross join nn),
r as (select {id_col}, term,
             row_number() over (partition by {id_col}
                                order by score desc, term)::int as rank,
             score
      from s)
select {id_col}, term, rank, score from r where rank <= {k}
"""


def ngram_counts(docs: DataFrame, n: int = 3, min_df: int = 2,
                 k: int = 100, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Top-k corpus word n-grams: ``(gram, tf, df)`` ordered by document
    frequency (the boilerplate/contamination-mining primitive — the
    hottest n-grams of a web corpus ARE its templates and license
    blurbs; this is also the n-gram table a decontamination or
    memorization audit starts from).

    Plan shape at 10^12 docs: tokens come from one scan-side split;
    per-(doc, gram) counts aggregate FIRST (map-side combine collapses
    within-document repetition before anything shuffles), then the
    gram-keyed rollup sums tf and counts df, and the top-k is a
    TakeOrderedAndProject — k rows to the driver, never the vocabulary.
    Hot grams (stopword runs) are exactly what the query REPORTS, so
    skew is the signal here, not a hazard: the second agg's combiner
    reduces each hot key to one partial row per map task.  Ties break
    deterministically (df desc, tf desc, gram asc)."""
    from lexor_spark.dedup import shingles_df
    grams = shingles_df(docs, [id_col], text_col, n=n,
                        alias="grams", distinct=False)
    per = (grams.select(id_col, F.explode("grams").alias("gram"))
           .groupBy(id_col, "gram").agg(F.count("*").alias("c")))
    agg = (per.groupBy("gram")
           .agg(F.sum("c").alias("tf"), F.count("*").alias("df"))
           .filter(F.col("df") >= min_df))
    return (agg.select("gram", "tf", "df")
            .orderBy(F.desc("df"), F.desc("tf"), F.asc("gram"))
            .limit(k))


def ngram_counts_sql(table: str, n: int = 3, min_df: int = 2,
                     k: int = 100, text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    from lexor_spark.dedup import shingles_sql
    sh = shingles_sql(text_col, n, distinct=False)
    return f"""
with g as (
  select {id_col}, unnest({sh}) as gram from {table}
),
per as (select {id_col}, gram, count(*) as c from g group by 1, 2),
agg as (
  select gram, sum(c)::bigint as tf, count(*) as df
  from per group by 1
)
select gram, tf, df from agg
where df >= {min_df}
order by df desc, tf desc, gram asc
limit {k}
"""

def build_postings(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Positional inverted index: one row per (term, document) —
    ``(term, doc_id, tf, positions)`` with the 0-based token positions
    sorted and dash-joined (``"3-17-40"``).  The index-construction
    step of a corpus search/retrieval stack (Zobel & Moffat 2006,
    "Inverted files for text search engines"); BM25 above SCANS for
    one ad-hoc query, an index amortizes the scan across all of them.

    Plan shape at 10^12 docs: one scan-side split + posexplode, then
    ONE (term, doc) map-side-combinable aggregation — within-document
    repetition collapses before the shuffle, and the per-row position
    list is bounded by document length, never by corpus size.  The
    postings themselves are ROWS, not per-term arrays: a stopword's
    posting list must NOT become one ``collect_list`` array (one key =
    one task = one OOM); as rows it stays partitioned, and a sink
    bucketing by ``term`` gives point lookups partition pruning the
    same way the CDX fetch list does (cdx.py)."""
    toks = (docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " "))
        .alias("pos", "term"))
        .filter(F.col("term") != ""))
    return (toks.groupBy("term", id_col)
            .agg(F.count("*").alias("tf"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list("pos")),
                                 lambda x: x.cast("string")), "-")
                 .alias("positions")))


def build_postings_sql(table: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    norm = SQL.NORMALIZE.format(c=text_col)
    return f"""
with d as (
  select {id_col}, regexp_split_to_array({norm}, ' ') as toks from {table}
),
tk as (
  select {id_col}, unnest(toks) as term,
         generate_subscripts(toks, 1) - 1 as pos
  from d
)
select term, {id_col}, count(*)::bigint as tf,
       array_to_string(list_sort(list(pos)), '-') as positions
from tk where term <> ''
group by 1, 2
"""


def phrase_search(docs: DataFrame, phrase: str, k: int = 20,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact-phrase match via positional-posting intersection:
    ``(doc_id, n_hits, first_pos)`` for documents containing the
    normalized ``phrase`` as consecutive tokens, ordered by hits desc
    then doc_id, top ``k``.  The standard positional-index query
    (Manning/Raghavan/Schütze IR ch.2): term i's positions shift by
    ``-i`` and the phrase occurrences are the intersection.

    Plan shape at scale: the phrase's terms are a tiny Python constant,
    so the token explode FILTERS to those terms scan-side — only
    phrase-term occurrences (the posting lists being probed) ever
    shuffle, never the corpus vocabulary.  ONE ``doc_id``-keyed
    conditional aggregation builds every term's position array in a
    single pass (no per-term self-joins — same-lineage self-joins are
    also a column-resolution hazard), and the intersection of the
    shifted arrays is a per-row expression bounded by document length.
    Top-k is a TakeOrderedAndProject.  A repeated term in the phrase
    ("buffalo buffalo") reuses the same position array under two
    shifts — consecutive-repeat semantics fall out of the algebra."""
    terms = phrase.lower().split()
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    uterms = sorted(set(terms))
    toks = (docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " "))
        .alias("pos", "term"))
        .filter(F.col("term").isin(uterms)))
    per_doc = toks.groupBy(id_col).agg(*[
        F.array_sort(F.collect_list(
            F.when(F.col("term") == t, F.col("pos")))).alias(f"ps_{j}")
        for j, t in enumerate(uterms)])
    tidx = {t: j for j, t in enumerate(uterms)}

    def _shift(col: Column, by: int) -> Column:
        # NB: must stay a 1-arg lambda — pyspark treats a 2-arg
        # transform lambda as (element, array_index).
        return F.transform(col, lambda x: x - F.lit(by))

    inter = None
    for i, t in enumerate(terms):
        pi = _shift(F.col(f"ps_{tidx[t]}"), i)
        inter = pi if inter is None else F.array_intersect(inter, pi)
    hits = per_doc.select(F.col(id_col), inter.alias("hits"))
    return (hits.select(
        F.col(id_col),
        F.size("hits").cast("long").alias("n_hits"),
        F.array_min("hits").alias("first_pos"))
        .filter(F.col("n_hits") > 0)
        .orderBy(F.desc("n_hits"), id_col).limit(k))


def phrase_search_sql(table: str, phrase: str, k: int = 20,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    terms = phrase.lower().split()
    norm = SQL.NORMALIZE.format(c=text_col)
    tlist = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    term_ctes = ",\n".join(
        f"t{i} as (select {id_col}, list_transform(ps, x -> x - {i}) "
        f"as p{i} from pl where term = '" + t.replace("'", "''") + "')"
        for i, t in enumerate(terms))
    joins = " ".join(f"join t{i} using ({id_col})"
                     for i in range(1, len(terms)))
    inter = "p0"
    for i in range(1, len(terms)):
        inter = f"list_intersect({inter}, p{i})"
    return f"""
with d as (
  select {id_col}, regexp_split_to_array({norm}, ' ') as toks from {table}
),
tk as (
  select {id_col}, unnest(toks) as term,
         generate_subscripts(toks, 1) - 1 as pos
  from d
),
pl as (
  select {id_col}, term, list_sort(list(pos)) as ps
  from tk where term in ({tlist}) group by 1, 2
),
{term_ctes},
j as (
  select t0.{id_col}, {inter} as hits from t0 {joins}
)
select {id_col}, len(hits)::bigint as n_hits, list_min(hits) as first_pos
from j where len(hits) > 0
order by n_hits desc, {id_col} limit {k}
"""

def snippets(docs: DataFrame, query: str, width: int = 8, k: int = 10,
             text_col: str = "text", id_col: str = "doc_id",
             max_hits: int = 1024) -> DataFrame:
    """Query-biased snippet extraction — the result-presentation step
    of a search stack (Tombros & Sanderson 1998): the ``width``-token
    window with the most query-term hits per document, reported as
    ``(doc_id, best_pos, window_hits, snippet)`` for the top-``k``
    documents by window hits (ties: lowest doc_id; within a document,
    the earliest best window).

    Plan shape at 10^12 docs: ENTIRELY scan-side — the query terms are
    a tiny constant, the hit-position array comes from one let-bound
    token split (no explode, no shuffle, like ``bm25_topk``), and the
    best window is an O(hits²) per-row array expression bounded by the
    per-document query-hit count, not document length.  ``max_hits``
    caps that count (keyword-STUFFED pages are the adversarial input:
    10^5 repeats of one term would otherwise cost 10^10 comparisons in
    one row) — only positions past the cap are ignored, so any page
    the cap touches is spam by construction and its snippet is still a
    dense window from its head.  The only movement is the top-k
    TakeOrderedAndProject: k rows to the driver."""
    terms = _norm_terms(query)
    if not terms:
        raise ValueError("snippets: empty query")

    def _is_term(tok: Column) -> Column:
        cond = tok == F.lit(terms[0])
        for t in terms[1:]:
            cond = cond | (tok == F.lit(t))
        return cond

    toks = F.split(normalize_text(F.col(text_col)), " ")

    def _build(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(t) - 1)
        ps = F.slice(F.filter(idx,
                              lambda i: _is_term(F.element_at(t, i + 1))),
                     1, max_hits)

        def _with_ps(ps_: Column) -> Column:
            def _cnt(p: Column) -> Column:
                return F.size(F.filter(
                    ps_, lambda q: (q >= p) & (q < p + F.lit(width))))

            def _with_best(best: Column) -> Column:
                best_pos = F.array_min(
                    F.filter(ps_, lambda p: _cnt(p) == best))
                return F.struct(
                    best.alias("hits"), best_pos.alias("pos"),
                    F.array_join(F.slice(t, best_pos + 1, width), " ")
                    .alias("snippet"))

            return _let(F.coalesce(
                F.array_max(F.transform(ps_, _cnt)), F.lit(0)),
                _with_best)

        return _let(ps, _with_ps)

    s = docs.select(F.col(id_col), _let(toks, _build).alias("s"))
    return (s.select(
        F.col(id_col),
        F.col("s.pos").alias("best_pos"),
        F.col("s.hits").cast("long").alias("window_hits"),
        F.col("s.snippet").alias("snippet"))
        .filter(F.col("window_hits") >= 1)
        .orderBy(F.desc("window_hits"), id_col).limit(k))


def snippets_sql(table: str, query: str, width: int = 8, k: int = 10,
                 text_col: str = "text", id_col: str = "doc_id",
                 max_hits: int = 1024) -> str:
    terms = _norm_terms(query)
    norm = SQL.NORMALIZE.format(c=text_col)
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    w = width
    cnt = f"len(list_filter(ps, q -> q >= p and q < p + {w}))"
    cnt2 = f"len(list_filter(ps, q2 -> q2 >= p2 and q2 < p2 + {w}))"
    return f"""
with d as (
  select {id_col}, regexp_split_to_array({norm}, ' ') as toks from {table}
),
t as (
  select {id_col}, unnest(toks) as term,
         generate_subscripts(toks, 1) - 1 as pos
  from d
),
p as (
  select {id_col}, list_sort(list(pos))[1 : {max_hits}] as ps
  from t where term in ({tlist}) group by 1
),
win as (
  select {id_col},
         list_max(list_transform(ps, p -> {cnt})) as window_hits,
         list_min(list_filter(ps, p ->
           {cnt} = list_max(list_transform(ps, p2 -> {cnt2}))))
           as best_pos
  from p
),
s as (
  select win.{id_col}, best_pos, window_hits,
         array_to_string(d.toks[best_pos + 1 : best_pos + {w}], ' ')
           as snippet
  from win join d using ({id_col})
)
select {id_col}, best_pos::int as best_pos,
       window_hits::bigint as window_hits, snippet
from s where window_hits >= 1
order by window_hits desc, {id_col} limit {k}
"""

def serp_dedup(ranked: DataFrame, signatures: DataFrame,
               max_hamming: int = 6, id_col: str = "doc_id",
               order_col: str = "bm25") -> DataFrame:
    """Near-duplicate suppression over a RANKED result list — the
    serve-time diversification every search result page applies
    (Broder 1997's near-dup application; a SERP showing five mirrors
    of one page is broken even when each mirror ranks honestly): walk
    the list in rank order and keep a result unless its simhash is
    within ``max_hamming`` bits of an ALREADY-KEPT higher-ranked
    result.  Greedy by construction (a dropped result does not
    suppress anything below it), so chains A~B~C with A≁C keep A and C.

    Output: (doc_id, rank, simhash, kept) for all k inputs — the
    dropped rows stay visible for relevance debugging.

    Plan shape at scale: ``ranked`` is a top-k (k = a result page,
    bounded by construction), so it BROADCASTS into the signature
    table join — the corpus-sized side never shuffles; the greedy walk
    is inherently sequential in rank, so it runs as ONE applyInPandas
    group over exactly k rows (the ``pack_firstfit`` recipe: bounded
    sequential state in one task, never corpus-scale)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import Window

    j = F.broadcast(ranked.select(id_col, order_col)) \
        .join(signatures.select(id_col, "simhash"), id_col)
    w = Window.orderBy(F.desc(order_col), id_col)
    ranked_k = j.select(F.col(id_col),
                        F.row_number().over(w).alias("rank"),
                        F.col("simhash"))

    def _walk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("rank").reset_index(drop=True)
        kept_sigs: list[int] = []
        kept: list[bool] = []
        for s in pdf["simhash"]:
            ok = all(bin(int(s) ^ int(t)).count("1") > max_hamming
                     for t in kept_sigs)
            kept.append(ok)
            if ok:
                kept_sigs.append(int(s))
        pdf["kept"] = kept
        return pdf[[id_col, "rank", "simhash", "kept"]]

    schema = f"{id_col} long, rank int, simhash long, kept boolean"
    # NB: groupBy(F.lit(0)) would be read as a group-by ORDINAL —
    # ground the constant group in a named column instead.
    return (ranked_k.withColumn("_g", F.lit(0)).groupBy("_g")
            .applyInPandas(lambda _, pdf: _walk(pdf), schema)
            .orderBy("rank"))


def serp_dedup_sql(ranked_sql: str, signatures_sql: str,
                   max_hamming: int = 6, id_col: str = "doc_id",
                   order_col: str = "bm25") -> str:
    """DuckDB mirror: the same greedy walk as a recursive CTE carrying
    the kept-signature list (the ``pack_firstfit_sql`` recipe)."""
    ok = (f"len(list_filter(w.kept_sigs, t -> "
          f"bit_count(xor(t, j.simhash)) <= {max_hamming})) = 0")
    return f"""
with recursive
r as ({ranked_sql}),
sg as ({signatures_sql}),
j as (
  select r.{id_col},
         row_number() over (order by r.{order_col} desc, r.{id_col})::int
           as rank,
         sg.simhash
  from r join sg using ({id_col})
),
walk(rank, {id_col}, simhash, kept, kept_sigs) as (
  select rank, {id_col}, simhash, true as kept, [simhash] as kept_sigs
  from j where rank = 1
  union all
  select j.rank, j.{id_col}, j.simhash,
         ({ok}) as kept,
         case when ({ok}) then list_append(w.kept_sigs, j.simhash)
              else w.kept_sigs end as kept_sigs
  from walk w join j on j.rank = w.rank + 1
)
select {id_col}, rank, simhash, kept from walk order by rank
"""

def merge_postings(base: DataFrame, delta: DataFrame,
                   changed: DataFrame, id_col: str = "doc_id",
                   broadcast_changed: bool = True) -> DataFrame:
    """Incremental inverted-index maintenance: fold a re-crawl's fresh
    postings into an existing index WITHOUT rebuilding it — the
    `cdx_diff` → re-extract → re-index tail of the crawl loop.
    ``changed`` is the one-column set of re-crawled/deleted doc ids
    (deletions appear in ``changed`` but have no ``delta`` rows);
    merged = base minus every posting of a changed doc, plus delta.

    Plan shape at 10^12 docs: an incremental crawl's changed set is
    tiny next to the index, so the anti-join BROADCASTS it by default
    and the base index streams through map-side; the union is
    zero-shuffle.  For a bulk re-crawl whose changed set outgrows the
    broadcast budget, pass ``broadcast_changed=False`` — the anti-join
    becomes an id-keyed shuffle join (AQE still broadcasts it when the
    set turns out small).  Nothing ever re-tokenizes the unchanged
    corpus, which is the whole point: index maintenance cost is
    proportional to the delta, not the index."""
    ch = changed.select(id_col).distinct()
    if broadcast_changed:
        ch = F.broadcast(ch)
    keep = base.join(ch, id_col, "left_anti")
    return keep.unionByName(delta)


def merge_postings_sql(base_sql: str, delta_sql: str, changed_sql: str,
                       id_col: str = "doc_id") -> str:
    return f"""
with b as ({base_sql}),
d as ({delta_sql}),
c as ({changed_sql})
select * from b where {id_col} not in (select {id_col} from c)
union all
select * from d
"""


def bm25_from_postings(postings: DataFrame, query: str, k: int = 10,
                       k1: float = 1.2, b: float = 0.75,
                       id_col: str = "doc_id") -> DataFrame:
    """BM25 top-``k`` served FROM the inverted index — the query-time
    complement of :func:`bm25_topk` (which scans the corpus for one
    ad-hoc query): only the query terms' posting rows move, document
    lengths and corpus stats come from index-side aggregates, and no
    text is ever re-read.  Same formula, same rounding, same
    (doc_id, dl, bm25) output and (score desc, doc_id) tie-break, so
    on a corpus with no token-less documents the two paths return
    IDENTICAL rows (pytest-pinned) — the only semantic delta is that
    an index only knows indexed documents, so empty docs don't count
    toward n/avgdl here.

    Plan shape at 10^12 docs: doc lengths are one map-side-combinable
    agg over the index (or a maintained side table); the query filter
    prunes the postings scan to |terms| keys (bucketed-by-term storage
    makes that partition pruning, cf. ``build_postings``); per-term
    document frequencies are a ≤|terms|-row broadcast; the scoring
    join is doc-keyed; the answer is TakeOrderedAndProject(k)."""
    terms = _norm_terms(query)
    if not terms:
        raise ValueError("bm25_from_postings: empty query")
    doclens = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = doclens.agg(F.count("*").alias("n"),
                        F.avg("dl").alias("avgdl"))
    qp = postings.filter(F.col("term").isin(list(terms))) \
        .select("term", id_col, "tf")
    dfs = qp.groupBy("term").agg(F.count("*").alias("df"))
    tf = F.col("tf").cast("double")
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    part = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * F.col("dl")
                                             / F.col("avgdl")))
    scored = (qp.join(F.broadcast(dfs), "term")
              .join(doclens, id_col)
              .crossJoin(F.broadcast(stats))
              .groupBy(id_col, "dl")
              .agg(F.round(F.sum(part), 4).alias("bm25")))
    return (scored.select(id_col, F.col("dl").cast("long").alias("dl"),
                          "bm25")
            .filter(F.col("bm25") > 0)
            .orderBy(F.desc("bm25"), id_col).limit(k))


def bm25_from_postings_sql(postings_sql: str, query: str, k: int = 10,
                           k1: float = 1.2, b: float = 0.75,
                           id_col: str = "doc_id") -> str:
    """DuckDB mirror over a SELECT producing (term, doc_id, tf)."""
    terms = _norm_terms(query)
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
with p as ({postings_sql}),
dl as (
  select {id_col}, sum(tf)::bigint as dl from p group by {id_col}
),
st as (select count(*)::bigint as n, avg(dl) as avgdl from dl),
qp as (select term, {id_col}, tf from p where term in ({quoted})),
dfs as (select term, count(*)::bigint as df from qp group by term),
scored as (
  select qp.{id_col}, dl.dl,
         round(sum(ln(1.0 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5))
                   * qp.tf * ({k1} + 1)
                   / (qp.tf + {k1} * (1 - {b} + {b} * dl.dl / st.avgdl))),
               4) as bm25
  from qp join dfs using (term) join dl using ({id_col}) cross join st
  group by qp.{id_col}, dl.dl
)
select {id_col}, dl, bm25 from scored
where bm25 > 0 order by bm25 desc, {id_col} limit {k}
"""
