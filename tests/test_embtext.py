"""Deterministic text→embedding featurizer (hashed char-3-gram signed
projection) and its end-to-end composition into the sim family."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from lexor_spark import sim


def _emb(spark, rows, dim=8):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.vec_id: list(r.embedding)
            for r in sim.emb_from_text(docs, dim=dim).collect()}


def test_emb_matches_duckdb_bit_identical(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r.vec_id: list(r.embedding)
           for r in sim.emb_from_text(docs, dim=16).collect()}
    con = duckdb.connect()
    con.sql(f"create view documents as select * from "
            f"read_parquet('{sf_dir}/documents.parquet')")
    want = {r[0]: r[1]
            for r in con.sql(sim.emb_from_text_sql("documents", 16))
            .fetchall()}
    assert got == want  # exact equality — round-6 components, no ulps


def test_emb_serial_reference():
    # hand-compute one vector: md5 nibbles, 2n-15 contributions, L2 norm
    import hashlib
    import math
    text = "abcd"
    grams = ["abc", "bcd"]
    dim = 8
    sums = [0] * dim
    for g in grams:
        h = hashlib.md5(g.encode()).hexdigest()
        for j in range(dim):
            sums[j] += 2 * int(h[j], 16) - 15
    nrm = math.sqrt(sum(x * x for x in sums))
    want = [round(x / nrm, 6) for x in sums]
    import pyspark.sql  # noqa: F401  (session from fixture in other tests)
    # reuse duckdb as the fast single-row evaluator of the same SQL
    con = duckdb.connect()
    con.sql("create view d1 as select 0::bigint as doc_id, 'abcd' as text")
    got = con.sql(sim.emb_from_text_sql("d1", dim)).fetchall()[0][1]
    assert got == want


def test_emb_empty_and_short_text(spark):
    rows = [(0, ""), (1, "ab"), (2, "   "), (3, "abcdef")]
    got = _emb(spark, rows)
    assert got[0] == [0.0] * 8          # empty → zero vector
    assert got[2] == [0.0] * 8          # whitespace normalizes to empty
    assert any(v != 0 for v in got[1])  # short text: whole-string gram
    nrm = sum(v * v for v in got[3])
    assert nrm == pytest.approx(1.0, abs=1e-4)


def test_emb_deterministic_and_text_sensitive(spark):
    a = _emb(spark, [(0, "the quick brown fox")])
    b = _emb(spark, [(0, "the quick brown fox")])
    c = _emb(spark, [(0, "a completely different sentence")])
    assert a == b
    assert a[0] != c[0]


def test_emb_dim_bounds(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sim.emb_from_text(docs, dim=33)
    with pytest.raises(ValueError):
        sim.emb_from_text(docs, dim=0)


def test_semantic_dedup_from_text_composes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = sim.emb_from_text(docs, dim=16)
    out = sim.semantic_dedup_emb(emb, k=4, iters=1, threshold=0.9)
    rows = out.collect()
    n = docs.count()
    assert len(rows) == n  # every document assigned
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    for gid, members in by_group.items():
        # exactly one canonical per group, and it is the min vec_id
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1 and canon[0].vec_id == gid
        assert gid == min(m.vec_id for m in members)


def test_kmeans_from_text_composes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = sim.emb_from_text(docs, dim=16)
    out = sim.kmeans_assign(emb, k=4, iters=2).collect()
    assert len(out) == docs.count()
    assert len({r.cluster for r in out}) > 1  # non-degenerate clustering
