"""Hashed-feature logistic-regression quality classifier."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lexor_spark import classify


def _docs(spark, n=120):
    """Half the docs contain the marker token 'good'."""
    rows = [(i, ("good quality prose here" if i % 2 == 0
                 else "junk filler noise here"))
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_features_presence_and_bias(spark):
    df = spark.createDataFrame([(0, "a a b"), (1, "")],
                               "doc_id long, text string")
    f = classify.lr_features(df).collect()
    by_doc = {}
    for r in f:
        by_doc.setdefault(r.doc_id, []).append((r.b, r.x))
    # doc 0: two distinct token buckets + bias; duplicates collapse
    assert len(by_doc[0]) == 3
    # empty doc: the '' token bucket + bias
    assert len(by_doc[1]) == 2
    assert all(x == 1.0 for rows in by_doc.values() for _, x in rows)
    assert all(any(b == -1 for b, _ in rows) for rows in by_doc.values())


def test_train_learns_marker_token(spark):
    docs = _docs(spark)
    w = classify.lr_train(docs, F.col("text").contains("good"))
    s = classify.lr_score(docs, w)
    j = s.join(docs, "doc_id")
    r = {bool(row[0]): row[1] for row in
         j.groupBy(F.col("text").contains("good"))
         .agg(F.avg("prob")).collect()}
    assert r[True] > r[False] + 0.1        # real separation
    # probabilities are probabilities
    mn, mx = s.agg(F.min("prob"), F.max("prob")).collect()[0]
    assert 0.0 <= mn <= mx <= 1.0


def test_train_matches_plain_python(spark):
    """Differential vs an independent driver-side implementation of the
    exact same rounded GD recipe."""
    import hashlib
    docs = _docs(spark, n=40)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    B, iters, lr = 256, 3, 1.0

    def feats(t):
        toks = set(" ".join(t.lower().split()).split(" "))
        bs = {int(hashlib.md5(x.encode()).hexdigest()[:8], 16) % B
              for x in toks}
        return bs | {-1}

    X = {d: feats(t) for d, t in rows}
    y = {d: 1.0 if "good" in t else 0.0 for d, t in rows}
    w = {b: 0.0 for b in range(-1, B)}
    n = len(rows)
    for _ in range(iters):
        marg = {d: round(sum(w[b] for b in X[d]), 6) for d in X}
        resid = {d: round(y[d] - round(1 / (1 + math.exp(-marg[d])), 6), 6)
                 for d in X}
        grad = {b: 0.0 for b in w}
        for d in X:
            for b in X[d]:
                grad[b] += resid[d]
        w = {b: round(w[b] + lr * round(grad[b] / n, 6), 6) for b in w}
    want = {b: v for b, v in w.items() if v != 0.0}
    got = {r.b: r.weight for r in classify.lr_train(
        docs, F.col("text").contains("good"), iters=iters,
        lr=lr).collect()}
    assert got == want


def test_train_partitioning_invariant(spark):
    docs = _docs(spark)
    lbl = F.col("text").contains("good")
    a = {r.b: r.weight for r in
         classify.lr_train(docs.repartition(1), lbl).collect()}
    b = {r.b: r.weight for r in
         classify.lr_train(docs.repartition(7), lbl).collect()}
    assert a == b


def test_score_all_zero_weights_yields_half(spark):
    """Class-symmetric corpus trains to all-zero weights; every doc
    must still score sigmoid(0)=0.5, not vanish from the output."""
    rows = [(0, "aaa bbb"), (1, "aaa bbb")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = classify.lr_train(df, F.col("doc_id") == 0)
    assert w.count() == 0                   # identical features cancel
    out = {r.doc_id: r.prob for r in classify.lr_score(df, w).collect()}
    assert out == {0: 0.5, 1: 0.5}
