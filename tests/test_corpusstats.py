"""Corpus diagnostics (Zipf/Heaps), readability, and LSH tuning/recall."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from lexor_spark import corpusstats, dedup, textfns


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- Zipf ------------------------------------------------------------------

def test_zipf_slope_exact_on_constructed_ranks(spark):
    # freq(the)=8, freq(cat)=4, freq(sat)=2: ln-freq vs ln-rank is NOT a
    # perfect line, but the OLS slope is computable by hand
    docs = _docs(spark, [
        (0, "the the the the cat cat sat"),
        (1, "the the the the cat cat sat"),
    ])
    row = corpusstats.zipf_fit(docs, top_n=3).collect()[0]
    assert row.n_terms == 3
    assert row.total_freq == 14
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (8, 4, 2)]
    mx = sum(xs) / 3
    my = sum(ys) / 3
    slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
             / sum((x - mx) ** 2 for x in xs))
    assert row.slope == pytest.approx(round(slope, 4), abs=1e-4)
    assert row.intercept == pytest.approx(round(my - slope * mx, 4),
                                          abs=1e-4)
    # natural-ish frequency decay => negative slope
    assert row.slope < 0


def test_zipf_matches_duckdb(spark):
    got = corpusstats.zipf_fit(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        top_n=50).collect()[0]
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = con.sql(
        corpusstats.zipf_fit_sql("documents", top_n=50)).fetchone()
    assert (got.n_terms, got.total_freq) == (want[0], want[1])
    assert got.slope == pytest.approx(want[2], abs=1e-4)
    assert got.intercept == pytest.approx(want[3], abs=1e-4)


# -- Heaps -----------------------------------------------------------------

def test_heaps_cumulative_monotone_and_bounded(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(corpusstats.heaps_law(docs, n_buckets=8).collect(),
                  key=lambda r: r.bucket)
    assert len(rows) == 8
    toks = [r.tokens_cum for r in rows]
    vocab = [r.vocab_cum for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    # vocabulary can never exceed tokens seen
    assert all(v <= t for v, t in zip(vocab, toks))
    # beta constant on every row; the sf0.001 synthetic corpus is
    # template-generated with a fixed 31-word vocabulary, so the
    # template-crawl alarm fires exactly: beta == 0
    betas = {r.heaps_beta for r in rows}
    assert len(betas) == 1
    assert betas.pop() == 0.0


def test_heaps_growing_vocab_positive_beta(spark):
    # docs introduce genuinely new terms as the corpus grows =>
    # 0 < beta <= 1 (sublinear vocabulary growth)
    docs = _docs(spark, [
        (i, " ".join(f"w{j}" for j in range(3 * i, 3 * i + 6)))
        for i in range(60)])
    rows = sorted(corpusstats.heaps_law(docs, n_buckets=6).collect())
    beta = rows[0].heaps_beta
    assert 0.0 < beta <= 1.001
    vocab = [r.vocab_cum for r in rows]
    assert vocab[-1] > vocab[0]


def test_heaps_matches_duckdb(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(corpusstats.heaps_law(docs, n_buckets=10).collect())
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = con.sql(corpusstats.heaps_law_sql("documents", n_buckets=10)
                   + " order by bucket").fetchall()
    assert len(got) == len(want) == 10
    for r, w in zip(got, want):
        assert (r.bucket, r.tokens_cum, r.vocab_cum) == w[:3]
        assert r.heaps_beta == pytest.approx(w[3], abs=1e-4)


def test_heaps_repeated_template_collapses_vocab(spark):
    # 40 identical docs: vocabulary saturates in bucket 0 while tokens
    # keep growing => beta near 0 (the template-crawl alarm)
    docs = _docs(spark, [(i, "alpha beta gamma delta") for i in range(40)])
    rows = sorted(corpusstats.heaps_law(docs, n_buckets=5).collect())
    assert rows[-1].vocab_cum == 4
    assert rows[0].vocab_cum == 4
    assert rows[-1].heaps_beta == pytest.approx(0.0, abs=1e-6)


# -- readability -----------------------------------------------------------

def test_readability_hand_computed(spark):
    # "The cat sat on the mat." : 6 words, 1 sentence, 6 one-syllable
    # words => flesch = 206.835 - 1.015*6 - 84.6*1 = 116.145
    df = _docs(spark, [(0, "The cat sat on the mat.")])
    r = df.select(textfns.readability(F.col("text")).alias("rd")) \
        .select("rd.*").collect()[0]
    assert (r.n_words, r.n_sentences, r.syllables) == (6, 1, 6)
    assert r.flesch == pytest.approx(116.145, abs=1e-3)
    assert r.fk_grade == pytest.approx(
        0.39 * 6 + 11.8 * 1 - 15.59, abs=1e-3)


def test_readability_complex_text_scores_lower(spark):
    df = _docs(spark, [
        (0, "The dog ran. The cat sat. It was fun."),
        (1, "Nevertheless, institutional heterogeneity substantially "
            "complicates intergovernmental macroeconomic coordination "
            "notwithstanding considerable multilateral deliberation."),
    ])
    rows = {r.doc_id: r for r in df.select(
        "doc_id", textfns.readability(F.col("text")).alias("rd"))
        .select("doc_id", "rd.*").collect()}
    assert rows[0].flesch > rows[1].flesch
    assert rows[0].fk_grade < rows[1].fk_grade


def test_readability_matches_duckdb(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        docs.select("doc_id",
                    textfns.readability(F.col("text")).alias("rd"))
        .select("doc_id", "rd.*").collect())
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            "'/root/testdata/sf0.001/documents.parquet'")
    exprs = textfns.SQL.readability("text")
    want = con.sql(
        "select doc_id, " +
        ", ".join(f"{v} as {k}" for k, v in exprs.items()) +
        " from documents order by doc_id").fetchall()
    assert len(got) == len(want) > 0
    for r, w in zip(got, want):
        assert (r.doc_id, r.n_words, r.n_sentences, r.syllables) == w[:4]
        assert r.flesch == pytest.approx(w[4], abs=1e-3)
        assert r.fk_grade == pytest.approx(w[5], abs=1e-3)


# -- LSH tuning / recall ---------------------------------------------------

def test_lsh_tuning_scurve_properties(spark):
    from lexor_spark.dedup import MINHASH_K
    rows = dedup.lsh_tuning(spark, grid_steps=10).collect()
    # every divisor factorization of k appears
    cfgs = {(r.bands, r.rows_per_band) for r in rows}
    assert all(b * rp == MINHASH_K for b, rp in cfgs)
    by_cfg: dict = {}
    for r in rows:
        by_cfg.setdefault((r.bands, r.rows_per_band), []).append(r)
    for cfg, grid in by_cfg.items():
        grid.sort(key=lambda r: r.s)
        ps = [r.p_detect for r in grid]
        # monotone non-decreasing S-curve in similarity
        assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:]))
        assert all(0.0 <= p <= 1.0 for p in ps)
    # more bands at fixed k => more permissive at low similarity
    k = MINHASH_K
    low_many = [r.p_detect for r in rows
                if r.bands == k and abs(r.s - 0.2) < 1e-9][0]
    low_one = [r.p_detect for r in rows
               if r.bands == 1 and abs(r.s - 0.2) < 1e-9][0]
    assert low_many > low_one


def test_lsh_tuning_matches_duckdb(spark):
    got = sorted(dedup.lsh_tuning(spark, grid_steps=10).collect(),
                 key=lambda r: (r.bands, r.rows_per_band, r.s))
    want = sorted(duckdb.sql(dedup.lsh_tuning_sql(grid_steps=10))
                  .fetchall(), key=lambda w: (w[0], w[1], w[2]))
    assert len(got) == len(want) > 0
    for r, w in zip(got, want):
        assert (r.bands, r.rows_per_band) == w[:2]
        assert r.s == pytest.approx(w[2], abs=1e-12)
        assert r.p_detect == pytest.approx(w[3], abs=1e-12)
        assert r.t_star == pytest.approx(w[4], abs=1e-4)


def test_lsh_recall_bounds(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = dedup.lsh_recall(docs, threshold=0.2).collect()[0]
    assert r.n_true >= r.n_hit >= 0
    assert r.n_lsh >= r.n_hit
    assert 0.0 <= r.recall <= 1.0
    # lsh_pairs verifies exact jaccard on candidates => perfect precision
    if r.n_lsh > 0:
        assert r.precision == 1.0


# -- classifier calibration ------------------------------------------------

def test_calibration_hand_computed(spark):
    from lexor_spark.evals import calibration_bins
    scores = spark.createDataFrame(
        [(0, 0.05), (1, 0.12), (2, 0.18), (3, 0.95), (4, 0.91), (5, 1.0)],
        "doc_id long, prob double")
    labels = spark.createDataFrame(
        [(0, False), (1, False), (2, True), (3, True), (4, True),
         (5, False)],
        "doc_id long, label boolean")
    rows = {r.bin: r for r in
            calibration_bins(scores, labels, n_bins=10).collect()}
    assert set(rows) == {0, 1, 9}          # only occupied bins
    assert rows[0].n == 1 and rows[0].frac_pos == 0.0
    assert rows[1].n == 2 and rows[1].frac_pos == 0.5
    assert rows[1].mean_pred == pytest.approx(0.15, abs=1e-6)
    # prob = 1.0 clamps into the top bin
    assert rows[9].n == 3
    assert rows[9].frac_pos == pytest.approx(round(2 / 3, 6), abs=1e-6)
    # ece = sum(n_b * |gap_b|) / N from the rounded bin stats
    exp_ece = round((1 * abs(rows[0].gap) + 2 * abs(rows[1].gap)
                     + 3 * abs(rows[9].gap)) / 6, 6)
    assert all(r.ece == exp_ece for r in rows.values())


def test_calibration_perfect_predictor_zero_ece(spark):
    from lexor_spark.evals import calibration_bins
    # constant p=0.5 on a half-positive corpus: gap 0, ece 0
    scores = spark.createDataFrame(
        [(i, 0.5) for i in range(10)], "doc_id long, prob double")
    labels = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(10)],
        "doc_id long, label boolean")
    rows = calibration_bins(scores, labels, n_bins=10).collect()
    assert len(rows) == 1
    assert rows[0].gap == 0.0 and rows[0].ece == 0.0


def test_calibration_matches_duckdb(spark):
    import __spark_entry__ as e
    got = e._q_lr_calibration(spark, "/root/testdata/sf0.001").collect()
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = con.sql(e._lr_calibration_sql()).fetchall()
    assert len(got) == len(want) > 0
    for r, w in zip(got, want):
        assert (r.bin, r.n) == w[:2]
        for a, b in zip((r.mean_pred, r.frac_pos, r.gap, r.ece), w[2:]):
            assert a == pytest.approx(b, abs=1e-6)


# -- corpus card -----------------------------------------------------------

def test_corpus_card_hand_computed(spark):
    from lexor_spark.corpusstats import corpus_card
    docs = spark.createDataFrame(
        [(0, "en", "one two three"), (1, "en", "a b c d e f g"),
         (2, "de", "eins zwei")],
        "doc_id long, lang string, text string")
    rows = {r.lang: r for r in corpus_card(docs).collect()}
    assert rows["en"].n_docs == 2 and rows["de"].n_docs == 1
    assert rows["en"].share == pytest.approx(round(2 / 3, 4), abs=1e-6)
    assert rows["en"].total_tokens == 10
    assert rows["en"].mean_tokens == 5.0
    assert rows["en"].p50_tokens == 5.0     # interpolated between 3,7
    assert rows["de"].p50_tokens == 2.0
    assert 0.0 <= rows["en"].keep_frac <= 1.0


def test_corpus_card_matches_duckdb(spark):
    from lexor_spark.corpusstats import corpus_card, corpus_card_sql
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = corpus_card(docs).collect()
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = con.sql(corpus_card_sql("documents")).fetchall()
    assert len(got) == len(want) > 0
    tot_share = 0.0
    for r, w in zip(got, want):
        assert (r.lang, r.n_docs, r.total_tokens) == (w[0], w[1], w[3])
        for a, b in zip((r.share, r.mean_tokens, r.p50_tokens,
                         r.p90_tokens, r.mean_quality, r.keep_frac),
                        (w[2], w[4], w[5], w[6], w[7], w[8])):
            assert a == pytest.approx(b, abs=1e-6)
        tot_share += r.share
    assert tot_share == pytest.approx(1.0, abs=0.01)


# -- index-served BM25 -----------------------------------------------------

def test_bm25_index_path_equals_scan_path(spark):
    """bm25_from_postings over build_postings must return EXACTLY the
    rows of the corpus-scan bm25_topk (same tokenizer, same formula,
    same rounding, same tie-break) on a corpus without empty docs."""
    from lexor_spark import search
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = "spark join window"
    scan = [(r.doc_id, r.dl, r.bm25)
            for r in search.bm25_topk(docs, q, k=20).collect()]
    idx = [(r.doc_id, r.dl, r.bm25)
           for r in search.bm25_from_postings(
               search.build_postings(docs), q, k=20).collect()]
    assert scan == idx and len(scan) > 0


def test_bm25_from_postings_validation_and_pruning(spark):
    from lexor_spark import search
    docs = spark.createDataFrame(
        [(0, "alpha beta beta"), (1, "beta gamma"), (2, "delta")],
        "doc_id long, text string")
    p = search.build_postings(docs)
    with pytest.raises(ValueError):
        search.bm25_from_postings(p, "   ")
    rows = search.bm25_from_postings(p, "beta", k=5).collect()
    # only docs containing the term score; doc 0 (tf=2) outranks doc 1
    assert [r.doc_id for r in rows] == [0, 1]
    assert all(r.bm25 > 0 for r in rows)


# -- PMI collocations ------------------------------------------------------

def test_collocations_frozen_phrase_tops(spark):
    from lexor_spark.corpusstats import collocations
    # "hong kong" always adjacent; "the" everywhere => low PMI
    docs = _docs(spark, [
        (i, "the visit to hong kong was the best trip of the year")
        for i in range(6)])
    rows = collocations(docs, min_count=3, k=20).collect()
    assert rows
    # all frozen singleton-word pairs share the max PMI; hong-kong is
    # one of them, ties broken alphabetically
    max_pmi = rows[0].pmi
    hk = [r for r in rows if (r.a, r.b) == ("hong", "kong")][0]
    assert hk.pmi == max_pmi and hk.n_ab == 6
    # any pair involving the 3x-frequent 'the' scores strictly lower
    the_pmis = [r.pmi for r in rows if "the" in (r.a, r.b)]
    assert the_pmis and all(max_pmi > p for p in the_pmis)


def test_collocations_hand_computed_pmi(spark):
    import math
    from lexor_spark.corpusstats import collocations
    docs = _docs(spark, [(0, "a b a b a c")] * 3)
    rows = {(r.a, r.b): r for r in
            collocations(docs, min_count=1, k=10).collect()}
    # counts over 3 identical docs: N=18, c(a)=9, c(b)=6, c(ab)=6
    ab = rows[("a", "b")]
    assert ab.n_ab == 6
    assert ab.pmi == pytest.approx(
        round(math.log(6 * 18 / (9 * 6)), 4), abs=1e-4)


def test_collocations_min_count_floor(spark):
    from lexor_spark.corpusstats import collocations
    docs = _docs(spark, [(0, "x y"), (1, "p q"), (2, "p q")])
    got = {(r.a, r.b) for r in
           collocations(docs, min_count=2, k=10).collect()}
    assert got == {("p", "q")}          # singleton pair filtered
