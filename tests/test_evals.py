"""Token-level extraction P/R/F1."""

from __future__ import annotations

import pytest

from lexor_spark.evals import eval_extraction


def test_eval_extraction_branches(spark):
    gold = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, "a b c d"), (3, "x y"),
         (4, "only gold")],
        "doc_id long, text string")
    ext = spark.createDataFrame(
        [(0, "a b c d"),          # perfect
         (1, "a b"),              # recall loss
         (2, "a b c d junk junk"),  # precision loss
         (3, ""),                 # nothing extracted
         (5, "hallucinated")],    # doc not in gold
        "doc_id long, text string")
    got = {r.doc_id: r for r in eval_extraction(gold, ext).collect()}
    assert got[0].precision == 1.0 and got[0].recall == 1.0 \
        and got[0].f1 == 1.0
    assert got[1].precision == 1.0 and got[1].recall == 0.5
    assert got[1].f1 == pytest.approx(2 * 2 / 6, abs=1e-6)
    assert got[2].precision == pytest.approx(4 / 6, abs=1e-6) \
        and got[2].recall == 1.0
    assert got[3].n_extracted == 0 and got[3].precision == 0.0 \
        and got[3].recall == 0.0 and got[3].f1 == 0.0
    assert got[4].recall == 0.0          # extractor returned nothing
    assert got[5].precision == 0.0       # hallucinated doc
    assert got[5].n_gold == 0


def test_eval_extraction_multiset_counts(spark):
    # repeating one gold token must not inflate precision (multiset min)
    gold = spark.createDataFrame([(0, "w x y z")], "doc_id long, text string")
    ext = spark.createDataFrame([(0, "w w w w")], "doc_id long, text string")
    r = eval_extraction(gold, ext).collect()[0]
    assert r.n_overlap == 1 and r.precision == 0.25 and r.recall == 0.25


def test_ndcg_perfect_and_inverted(spark):
    from lexor_spark import evals
    labels = spark.createDataFrame(
        [(1, 3), (2, 2), (3, 1), (4, 0)], "doc_id long, rel int")
    perfect = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0), (4, 6.0)],
        "doc_id long, bm25 double")
    r = evals.eval_ranking(perfect, labels, k=4).collect()[0]
    assert r.ndcg == 1.0 and r.dcg == r.idcg
    inverted = spark.createDataFrame(
        [(1, 6.0), (2, 7.0), (3, 8.0), (4, 9.0)],
        "doc_id long, bm25 double")
    r2 = evals.eval_ranking(inverted, labels, k=4).collect()[0]
    assert 0 < r2.ndcg < 1.0
    # DCG arithmetic pinned: ideal = 7/1 + 3/log2(3) + 1/2 + 0
    import math
    want = round(7 + 3 / math.log2(3) + 0.5, 6)
    assert abs(r.idcg - want) < 1e-6


def test_ndcg_missing_labels_and_zero_idcg(spark):
    from lexor_spark import evals
    ranked = spark.createDataFrame(
        [(1, 2.0), (99, 1.0)], "doc_id long, bm25 double")
    labels = spark.createDataFrame([(1, 0)], "doc_id long, rel int")
    r = evals.eval_ranking(ranked, labels, k=5).collect()[0]
    assert r.dcg == 0.0 and r.idcg == 0.0 and r.ndcg == 0.0
