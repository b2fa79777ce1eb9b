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
