"""BM25 ranking, DSIR importance resampling, temperature rebalancing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lexor_spark import dsir, sampling, search


def _docs(spark):
    rows = [
        (0, "en", "spark join window spark spark"),
        (1, "en", "join window table scan"),
        (2, "en", "the quick brown fox jumps over the lazy dog"),
        (3, "de", "der schnelle braune fuchs"),
        (4, "en", "spark"),
        (5, "en", ""),
        (6, "zh", "table scan filter value"),
        (7, "en", "window window window window window window"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


# ---------------------------------------------------------------- BM25


def test_bm25_ranks_term_dense_docs_first(spark):
    out = search.bm25_topk(_docs(spark), "spark join window", k=8).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 0                       # hits all three terms, densely
    assert 2 not in ids and 3 not in ids and 5 not in ids  # score 0 filtered
    assert all(out[i].bm25 >= out[i + 1].bm25 for i in range(len(out) - 1))


def test_bm25_tf_saturation(spark):
    """k1 saturation: six repeats of one term score less than 6x one hit
    but more than a single hit (same doc length would be needed for an
    exact inequality; here dl differs, so just check monotone bounds)."""
    out = {r.doc_id: r.bm25 for r in
           search.bm25_topk(_docs(spark), "window", k=8).collect()}
    assert out[7] > out[1]                   # 6 hits beats 1 hit
    assert out[7] < 6 * out[1]               # but sublinearly


def test_bm25_case_and_dedup_of_query_terms(spark):
    a = search.bm25_topk(_docs(spark), "SPARK Spark spark", k=3).collect()
    b = search.bm25_topk(_docs(spark), "spark", k=3).collect()
    assert [(r.doc_id, r.bm25) for r in a] == [(r.doc_id, r.bm25) for r in b]


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        search.bm25_topk(_docs(spark), "   ")


def test_bm25_matches_hand_computation(spark):
    """Single-term corpus-checkable value: idf and tf normalization by
    the exact formula."""
    docs = _docs(spark)
    out = {r.doc_id: (r.dl, r.bm25) for r in
           search.bm25_topk(docs, "fox", k=8).collect()}
    n, k1, b = 8, 1.2, 0.75
    lens = [5, 4, 9, 4, 1, 0, 4, 6]
    avgdl = sum(lens) / n
    assert set(out) == {2}                   # only doc 2 contains "fox"
    df, tf, dl = 1, 1.0, 9
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    want = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    got_dl, got = out[2]
    assert got_dl == dl
    assert abs(got - round(want, 4)) < 1e-9


# ---------------------------------------------------------------- DSIR


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs resembling the target slice (lang=en vocabulary) must
    out-weigh docs that only resemble the raw remainder."""
    docs = _docs(spark)
    w = {r.doc_id: r.dsir_logweight for r in dsir.dsir_weights(
        docs, target=docs.filter(F.col("lang") == "en")).collect()}
    assert len(w) == 8                       # every doc scores, even empty
    # the German doc shares no vocabulary with the target slice
    assert w[3] < w[0] and w[3] < w[1]


def test_dsir_weights_self_target_near_zero(spark):
    """target == raw means every bucket ratio is exactly 1 → all log
    weights are identically 0."""
    docs = _docs(spark)
    for r in dsir.dsir_weights(docs).collect():
        assert r.dsir_logweight == 0.0


def test_dsir_sample_is_topk_of_perturbed_weights(spark):
    docs = _docs(spark)
    tgt = docs.filter(F.col("lang") == "en")
    full = dsir.dsir_sample(docs, k=8, target=tgt).collect()
    top3 = dsir.dsir_sample(docs, k=3, target=tgt).collect()
    assert [r.doc_id for r in top3] == [r.doc_id for r in full[:3]]
    keys = [r.dsir_key for r in full]
    assert keys == sorted(keys, reverse=True)


def test_dsir_partitioning_invariant(spark):
    docs = _docs(spark)
    a = {r.doc_id: r.dsir_logweight
         for r in dsir.dsir_weights(docs.repartition(1)).collect()}
    b = {r.doc_id: r.dsir_logweight
         for r in dsir.dsir_weights(docs.repartition(7)).collect()}
    assert a == b


# ------------------------------------------------- temperature sampling


def _skewed(spark, n=3000):
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 100 < 90, "en")
                    .when(F.col("id") % 100 < 99, "de")
                    .otherwise("zh").alias("lang")))


def test_temperature_alpha_one_keeps_everything(spark):
    docs = _skewed(spark)
    out = sampling.temperature_sample(docs, alpha=1.0)
    assert out.count() == 3000
    assert out.select("keep_rate").distinct().collect()[0].keep_rate == 1.0


def test_temperature_flattens_shares(spark):
    """alpha=0 equalizes: every stratum keeps ~min_n rows."""
    docs = _skewed(spark)
    out = sampling.temperature_sample(docs, alpha=0.0)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    mn = 30                                   # zh count = 3000 * 1/100
    assert counts["zh"] == mn                 # smallest stratum keeps all
    for lang in ("en", "de"):
        assert abs(counts[lang] - mn) < 4 * math.sqrt(mn)


def test_temperature_shares_match_target(spark):
    """alpha=0.5: kept share of stratum l ~ n_l^alpha / sum n^alpha."""
    docs = _skewed(spark)
    out = sampling.temperature_sample(docs, alpha=0.5)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n = {"en": 2700, "de": 270, "zh": 30}
    tot_s = sum(v ** 0.5 for v in n.values())
    kept = sum(counts.values())
    for lang, c in counts.items():
        assert abs(c / kept - n[lang] ** 0.5 / tot_s) < 0.03


def test_temperature_alpha_bounds(spark):
    with pytest.raises(ValueError):
        sampling.temperature_sample(_skewed(spark), alpha=1.5)


# ------------------------------------------ seeded random differentials


def _random_corpus(seed, n_docs=40, vocab=("alpha", "beta", "gamma",
                                           "delta", "eps", "zeta")):
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(0, 12)
        rows.append((i, rng.choice(["en", "de"]),
                     " ".join(rng.choice(vocab) for _ in range(n))))
    return rows


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    """Independent plain-Python BM25 (the textbook formula, no Spark)."""
    docs = {i: t.lower().split() for i, _, t in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for t in dict.fromkeys(terms):
            tf = toks.count(t)
            df = sum(1 for tk in docs.values() if t in tk)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl))
        if round(s, 4) > 0:
            out[i] = round(s, 4)
    return out


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_bm25_differential_vs_python(spark, seed):
    rows = _random_corpus(seed)
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r.bm25 for r in
           search.bm25_topk(df, "alpha zeta", k=40).collect()}
    want = _py_bm25(rows, ["alpha", "zeta"])
    assert got == dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
                       [:40])


def _py_dsir(rows, target_langs, n_buckets=256):
    """Independent plain-Python DSIR log weights (md5 bucket hash)."""
    import hashlib

    def grams(text):
        toks = " ".join(text.lower().split()).split(" ")
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    ct, cr = {}, {}
    for _, lang, text in rows:
        for g in grams(text):
            b = bucket(g)
            cr[b] = cr.get(b, 0) + 1
            if lang in target_langs:
                ct[b] = ct.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    out = {}
    for i, _, text in rows:
        w = sum(math.log((ct.get(bucket(g), 0) + 1) / (tt + n_buckets))
                - math.log((cr.get(bucket(g), 0) + 1) / (tr + n_buckets))
                for g in grams(text))
        out[i] = round(w, 4)
    return out


@pytest.mark.parametrize("seed", [3, 55])
def test_dsir_differential_vs_python(spark, seed):
    rows = _random_corpus(seed)
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r.dsir_logweight for r in dsir.dsir_weights(
        df, target=df.filter(F.col("lang") == "en")).collect()}
    assert got == _py_dsir(rows, {"en"})


def test_dsir_empty_target_slice(spark):
    """An empty target slice must not null the weights: add-one
    smoothing degrades to a uniform 1/B target distribution."""
    docs = _docs(spark)
    out = dsir.dsir_weights(
        docs, target=docs.filter(F.col("lang") == "xx")).collect()
    assert len(out) == 8
    assert all(r.dsir_logweight is not None for r in out)


# ------------------------------------------------------ tf-idf keywords


def test_tfidf_keywords_basic(spark):
    docs = _docs(spark)
    out = search.tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.score))
    # empty doc has no terms -> no rows
    assert 5 not in by_doc
    # every present doc has ranks 1..min(k, n_distinct_terms) in order
    for doc, rows in by_doc.items():
        ranks = [r[0] for r in sorted(rows)]
        assert ranks == list(range(1, len(ranks) + 1))
        scores = [r[2] for r in sorted(rows)]
        assert scores == sorted(scores, reverse=True)
    # doc 7 is only "window" x6 -> its single keyword is window
    assert [t for _, t, _ in by_doc[7]] == ["window"]
    # doc 0's top keyword is its repeated rare-ish term "spark"
    assert sorted(by_doc[0])[0][1] == "spark"


def test_tfidf_rare_term_outranks_common(spark):
    """A term unique to one doc must outrank an equally-frequent term
    present everywhere (the idf half of the score)."""
    rows = [(i, "en", "common " + ("rare" if i == 0 else "filler"))
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    top = {r.doc_id: r.term for r in
           search.tfidf_keywords(df, k=1).collect()}
    assert top[0] == "rare"


def test_tfidf_salted_join_identical_values(spark):
    """One term in EVERY document (the degenerate stopword key): the
    salted term join must return byte-identical rankings to the plain
    join — salting is routing, not semantics."""
    rows = [(i, "en",
             f"the the the unique{i} unique{i} shared{i % 7}")
            for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    plain = sorted((r.doc_id, r.term, r.rank, r.score) for r in
                   search.tfidf_keywords(df, k=3).collect())
    salted = sorted((r.doc_id, r.term, r.rank, r.score) for r in
                    search.tfidf_keywords(df, k=3, salt=8).collect())
    assert plain == salted
    # the hot key 'the' is df=3000; every doc still ranks it below its
    # unique term (idf ~ 0 for a term in every doc)
    top = {d: t for d, t, r, _ in plain if r == 1}
    assert top[0] == "unique0"


def test_ngram_counts_basic(spark):
    """Counts, df vs tf, min_df filter, deterministic tie-break."""
    from lexor_spark.search import ngram_counts
    rows = [(1, "a b c a b c"),     # grams: 'a b c' x2, 'b c a', 'c a b'
            (2, "a b c d"),          # 'a b c', 'b c d'
            (3, "z z z")]            # 'z z z'
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = [tuple(r) for r in ngram_counts(docs, n=3, min_df=1, k=10).collect()]
    assert out[0] == ("a b c", 3, 2)      # tf=3 (2 in doc1 + 1 in doc2), df=2
    assert ("z z z", 1, 1) in out
    # min_df=2 keeps only the shared gram
    out2 = [tuple(r) for r in ngram_counts(docs, n=3, min_df=2, k=10).collect()]
    assert out2 == [("a b c", 3, 2)]


# --------------------------------------------- positional postings


def test_postings_positions_and_tf(spark):
    out = {(r.term, r.doc_id): (r.tf, r.positions)
           for r in search.build_postings(_docs(spark)).collect()}
    assert out[("spark", 0)] == (3, "0-3-4")       # spark at 0, 3, 4
    assert out[("window", 7)] == (6, "0-1-2-3-4-5")
    assert out[("the", 2)] == (2, "0-6")
    assert ("", 5) not in out                      # empty doc emits nothing
    assert all(k[1] != 5 for k in out)


def test_phrase_search_adjacency(spark):
    out = {r.doc_id: (r.n_hits, r.first_pos) for r in
           search.phrase_search(_docs(spark), "join window", k=10).collect()}
    # doc 0: "spark join window ..." -> join@1 window@2; doc 1: join@0 window@1
    assert out == {0: (1, 1), 1: (1, 0)}


def test_phrase_search_repeated_term(spark):
    out = {r.doc_id: (r.n_hits, r.first_pos) for r in
           search.phrase_search(_docs(spark), "window window", k=10).collect()}
    # only doc 7 has consecutive windows: positions 0..5 -> 5 starts
    assert out == {7: (5, 0)}


def test_phrase_search_normalizes_case(spark):
    a = search.phrase_search(_docs(spark), "JOIN Window", k=10).collect()
    b = search.phrase_search(_docs(spark), "join window", k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_phrase_search_empty_phrase_raises(spark):
    with pytest.raises(ValueError):
        search.phrase_search(_docs(spark), "   ")


# --------------------------------------------------------- snippets


def test_snippets_best_window(spark):
    out = {r.doc_id: r for r in
           search.snippets(_docs(spark), "spark window", width=3,
                           k=10).collect()}
    # doc 0 "spark join window spark spark": windows of 3 starting at a
    # hit: pos 2 covers {2,3,4} = 3 hits (window, spark, spark) — best
    r0 = out[0]
    assert (r0.window_hits, r0.best_pos) == (3, 2)
    assert r0.snippet == "window spark spark"
    # doc 7 is six windows: any 3-window holds 3
    assert out[7].window_hits == 3 and out[7].best_pos == 0
    # docs without any hit are absent
    assert 3 not in out and 5 not in out


def test_snippets_earliest_tie_and_ordering(spark):
    rows = search.snippets(_docs(spark), "window", width=2, k=10).collect()
    # ordering: hits desc then doc_id asc
    hits = [(r.window_hits, r.doc_id) for r in rows]
    assert hits == sorted(hits, key=lambda h: (-h[0], h[1]))
    first = {r.doc_id: r.best_pos for r in rows}
    assert first[7] == 0                  # tie among windows -> earliest


def test_snippets_empty_query_raises(spark):
    with pytest.raises(ValueError):
        search.snippets(_docs(spark), "")


# ------------------------------------------------------- serp dedup


def test_serp_dedup_greedy_chain(spark):
    # A~B (1 bit), B~C (1 bit), A vs C = 2 bits -> with max_hamming=1:
    # A kept, B dropped (near A), C kept (B wasn't kept, A is 2 away)
    ranked = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, bm25 double")
    sigs = spark.createDataFrame(
        [(1, 0b0000), (2, 0b0001), (3, 0b0011)],
        "doc_id long, simhash long")
    out = {r.doc_id: r for r in search.serp_dedup(
        ranked, sigs, max_hamming=1).collect()}
    assert out[1].kept and not out[2].kept and out[3].kept
    assert [out[i].rank for i in (1, 2, 3)] == [1, 2, 3]


def test_serp_dedup_rank_order_and_identical(spark):
    ranked = spark.createDataFrame(
        [(10, 5.0), (11, 4.0), (12, 3.0)], "doc_id long, bm25 double")
    sigs = spark.createDataFrame(
        [(10, 42), (11, 42), (12, 42)], "doc_id long, simhash long")
    rows = search.serp_dedup(ranked, sigs, max_hamming=0).collect()
    assert [r.kept for r in rows] == [True, False, False]


# ------------------------------------------------------ crawl budget


def test_crawl_budget_caps_and_floor(spark):
    from lexor_spark import frontier
    hosts = spark.createDataFrame(
        [("a.example", 100.0, 50),    # big share
         ("b.example", 100.0, 1),     # capped at 1 known url
         ("c.example", 1.0, 50),      # tiny share -> floored to 1
         ("d.example", 0.0, 50)],     # zero score -> zero
        "host string, score double, n_urls int")
    out = {r.host: r for r in frontier.crawl_budget(
        hosts, budget_pages=100).collect()}
    assert out["b.example"].alloc == 1          # capped by capacity
    assert out["b.example"].spare >= 1          # cap freed budget
    assert out["c.example"].alloc == 1          # min-alloc floor
    assert out["d.example"].alloc == 0          # no score, no pages
    assert out["a.example"].alloc >= 45
    total = sum(r.alloc for r in out.values())
    assert total <= 100


# -------------------------------------------------- postings merge


def test_merge_postings_semantics(spark):
    base = spark.createDataFrame(
        [("a", 1, 2, "0-3"), ("a", 2, 1, "5"), ("b", 2, 1, "1"),
         ("c", 3, 1, "0")],
        "term string, doc_id long, tf long, positions string")
    # doc 2 re-crawled (now contains only 'z'), doc 3 deleted
    delta = spark.createDataFrame(
        [("z", 2, 1, "0")],
        "term string, doc_id long, tf long, positions string")
    changed = spark.createDataFrame([(2,), (3,)], "doc_id long")
    out = sorted((r.term, r.doc_id) for r in
                 search.merge_postings(base, delta, changed).collect())
    assert out == [("a", 1), ("z", 2)]          # doc 1 untouched,
    # doc 2's old a/b postings gone, doc 3 fully deleted
