"""Round-4 continuation operators: ROC-AUC, DoReMi reweighting,
Count-Min heavy hitters."""

from __future__ import annotations

import math

import pytest

from lexor_spark import sampling, sketches
from lexor_spark.evals import eval_auc


def _auc(spark, rows):
    scores = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(rows)],
        "doc_id long, prob double")
    labels = spark.createDataFrame(
        [(i, y) for i, (_, y) in enumerate(rows)],
        "doc_id long, label boolean")
    return eval_auc(scores, labels).collect()[0]


def test_auc_perfect_inverted_random(spark):
    # perfect separation → 1.0
    r = _auc(spark, [(0.9, True), (0.8, True), (0.2, False), (0.1, False)])
    assert r.auc == 1.0 and r.n_pos == 2 and r.n_neg == 2
    # perfectly inverted → 0.0
    r = _auc(spark, [(0.1, True), (0.2, True), (0.8, False), (0.9, False)])
    assert r.auc == 0.0
    # all scores tied → 0.5 exactly (the half-credit tie rule)
    r = _auc(spark, [(0.5, True), (0.5, False), (0.5, True), (0.5, False)])
    assert r.auc == 0.5


def test_auc_hand_computed_with_ties(spark):
    # pos scores {0.8, 0.5}, neg scores {0.5, 0.2}:
    # pairs: (0.8,0.5)=1, (0.8,0.2)=1, (0.5,0.5)=0.5, (0.5,0.2)=1
    # AUC = 3.5/4
    r = _auc(spark, [(0.8, True), (0.5, True), (0.5, False), (0.2, False)])
    assert r.auc == pytest.approx(0.875, abs=1e-9)


def test_auc_single_class_is_null(spark):
    r = _auc(spark, [(0.8, True), (0.5, True)])
    assert r.auc is None and r.n_neg == 0


def test_doremi_uniform_excess_keeps_shares(spark):
    # identical excess loss everywhere → exp factor cancels → weights
    # equal the (smoothed) baseline shares
    rows = [("a", 5.0, 4.0)] * 3 + [("b", 5.0, 4.0)] * 1
    df = spark.createDataFrame(rows, "source string, proxy_nll double, "
                                     "ref_nll double")
    got = {r.domain: r for r in sampling.doremi_weights(df).collect()}
    assert got["a"].share == 0.75 and got["b"].share == 0.25
    assert got["a"].weight == pytest.approx(0.99 * 0.75 + 0.005, abs=1e-6)
    assert got["b"].weight == pytest.approx(0.99 * 0.25 + 0.005, abs=1e-6)


def test_doremi_upweights_high_excess_domain(spark):
    rows = [("easy", 1.0, 1.0), ("hard", 3.0, 1.0)]
    df = spark.createDataFrame(rows, "source string, proxy_nll double, "
                                     "ref_nll double")
    got = {r.domain: r for r in sampling.doremi_weights(df).collect()}
    assert got["hard"].excess == 2.0 and got["easy"].excess == 0.0
    assert got["hard"].weight > got["easy"].weight
    # closed form: α_hard = .5e²/(.5+.5e²), smoothed
    a = 0.5 * math.exp(2.0) / (0.5 + 0.5 * math.exp(2.0))
    assert got["hard"].weight == pytest.approx(0.99 * a + 0.005, abs=1e-4)
    # weights always sum to 1
    assert sum(r.weight for r in got.values()) == pytest.approx(1.0, abs=1e-5)


def test_doremi_negative_excess_clamped(spark):
    # proxy BETTER than reference → excess clamps to 0, never negative
    rows = [("done", 1.0, 9.0), ("other", 2.0, 1.0)]
    df = spark.createDataFrame(rows, "source string, proxy_nll double, "
                                     "ref_nll double")
    got = {r.domain: r for r in sampling.doremi_weights(df).collect()}
    assert got["done"].excess == 0.0


def test_cm_estimate_one_sided_and_exact_on_sparse(spark):
    # 30-term vocabulary in a 4×1024 sketch: collisions are possible
    # but est ≥ true must hold for EVERY term (CM's one-sided bound)
    docs = spark.createDataFrame(
        [(i, ("alpha " * (i + 1)) + "beta gamma") for i in range(10)],
        "doc_id long, text string")
    rows = sketches.cm_topk(docs, k=10, min_len=3).collect()
    got = {r.term: r for r in rows}
    assert got["alpha"].true_c == 55 and got["beta"].true_c == 10
    for r in rows:
        assert r.overest >= 0
    # 3 distinct terms in 1024 buckets: no collision, est exact
    assert all(r.overest == 0 for r in rows)
    # ordering: est desc, term asc
    ests = [(r.est, r.term) for r in rows]
    assert ests == sorted(ests, key=lambda t: (-t[0], t[1]))


def test_cm_sketch_size_capped(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} word{i+1} shared") for i in range(50)],
        "doc_id long, text string")
    sk = sketches.cm_build(docs)
    n = sk.count()
    assert n <= sketches.CM_DEPTH * sketches.CM_WIDTH
    # total counts per row = stream length (sketch conservation law)
    per_row = {r.row: r.s for r in
               sk.groupBy("row").sum("c")
               .withColumnRenamed("sum(c)", "s").collect()}
    stream_len = 50 * 3
    assert all(v == stream_len for v in per_row.values())


def test_cm_min_len_filters_candidates_not_stream(spark):
    # short tokens still feed the SKETCH (their counters exist) but are
    # not candidate heavy hitters
    docs = spark.createDataFrame([(0, "ab ab ab longword")],
                                 "doc_id long, text string")
    rows = sketches.cm_topk(docs, k=10, min_len=3).collect()
    assert [r.term for r in rows] == ["longword"]
    sk = sketches.cm_build(docs)
    assert sk.agg({"c": "sum"}).collect()[0][0] == 4 * sketches.CM_DEPTH


def test_hll_exact_on_singletons_and_small_sets(spark):
    # HLL registers of a 1-item group: est = alpha*m^2/(m-1+2^-rho) —
    # just pin the audit invariants instead of the raw-bias value:
    # every group present, true_d exact, err = (est-true)/true
    rows = [("a", f"item{i}") for i in range(50)] + \
           [("b", "only"), ("b", "only"), ("b", "only")]
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r.host: r for r in sketches.hll_distinct(df).collect()}
    assert got["a"].true_d == 50 and got["b"].true_d == 1
    for r in got.values():
        assert r.est > 0
        assert r.err == pytest.approx((r.est - r.true_d) / r.true_d,
                                      abs=1e-4)


def test_hll_duplicates_do_not_move_registers(spark):
    # the estimate is a pure function of the DISTINCT item set: feeding
    # each item once vs 10x must give identical registers and estimate
    once = spark.createDataFrame(
        [("h", f"u{i}") for i in range(40)], "host string, url string")
    many = spark.createDataFrame(
        [("h", f"u{i}") for i in range(40)] * 10,
        "host string, url string")
    e1 = sketches.hll_distinct(once).collect()[0]
    e2 = sketches.hll_distinct(many).collect()[0]
    assert e1.est == e2.est and e1.true_d == e2.true_d


def test_hll_register_state_capped(spark):
    # per-group register rows never exceed m, however many items
    from lexor_spark.sketches import _hll_pos, _hll_rho, HLL_M
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("h", f"u{i}") for i in range(500)], "host string, url string")
    regs = (df.select("host", _hll_pos(F.col("url"), HLL_M).alias("pos"),
                      _hll_rho(F.col("url")).alias("val"))
            .groupBy("host", "pos").count())
    assert regs.count() <= HLL_M


def test_epoch_shuffle_partitioning_invariant(spark):
    # the permutation is a pure function of (id, epoch): 1 partition vs
    # 16 partitions must give the identical (id, shard, pos) table
    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    a = sampling.epoch_shuffle(docs.coalesce(1), 8).collect()
    b = sampling.epoch_shuffle(docs.repartition(16), 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_epoch_shuffle_positions_contiguous_and_balanced(spark):
    docs = spark.range(400).withColumnRenamed("id", "doc_id")
    rows = sampling.epoch_shuffle(docs, 4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))  # 0..n-1, no gaps
    # binomial balance: no shard pathologically empty or dominant
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 40 and max(sizes) < 160


def test_epoch_shuffle_epochs_are_distinct_permutations(spark):
    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    e0 = {(r.doc_id): (r.shard, r.pos)
          for r in sampling.epoch_shuffle(docs, 8, epoch=0).collect()}
    e1 = {(r.doc_id): (r.shard, r.pos)
          for r in sampling.epoch_shuffle(docs, 8, epoch=1).collect()}
    moved = sum(1 for k in e0 if e0[k] != e1[k])
    assert moved > 250  # a fresh permutation, not a rotation/no-op


def test_mixture_apply_proportions_and_binding_domain(spark):
    # weights table: target doubles b's share at a's expense; binding
    # domain (largest weight/share ratio) keeps rate exactly 1.0
    docs = spark.createDataFrame(
        [(i, "a" if i < 300 else "b") for i in range(400)],
        "doc_id long, source string")
    weights = spark.createDataFrame(
        [("a", 0.75, 0.5), ("b", 0.25, 0.5)],
        "domain string, share double, weight double")
    rows = sampling.mixture_apply(docs, weights).collect()
    rates = {r.domain: r.keep_rate for r in rows}
    assert rates["b"] == 1.0                       # binding domain
    assert rates["a"] == pytest.approx(1 / 3, abs=1e-4)  # (0.5/0.75)·c
    n = {d: sum(1 for r in rows if r.domain == d) for d in ("a", "b")}
    # kept corpus should be ~50/50 (binomial around 100 vs 100)
    assert abs(n["a"] - n["b"]) < 40 and n["b"] == 100


def test_mixture_apply_uniform_weights_keep_everything(spark):
    docs = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(100)],
        "doc_id long, source string")
    weights = spark.createDataFrame(
        [("x", 0.5, 0.5), ("y", 0.5, 0.5)],
        "domain string, share double, weight double")
    rows = sampling.mixture_apply(docs, weights).collect()
    assert len(rows) == 100 and all(r.keep_rate == 1.0 for r in rows)


def test_auc_matches_quadratic_reference(spark):
    # exact O(n^2) Mann-Whitney pair count on a pseudorandom fixture
    import hashlib
    rows = []
    for i in range(80):
        h = int(hashlib.md5(f"auc{i}".encode()).hexdigest()[:8], 16)
        prob = (h % 1000) / 1000.0          # coarse → plenty of ties
        label = (h >> 12) % 3 != 0
        rows.append((prob, label))
    r = _auc(spark, rows)
    pos = [p for p, y in rows if y]
    neg = [p for p, y in rows if not y]
    num = sum(1.0 if p > q else 0.5 if p == q else 0.0
              for p in pos for q in neg)
    want = round(num / (len(pos) * len(neg)), 6)
    assert r.auc == pytest.approx(want, abs=1e-9)
    assert r.n_pos == len(pos) and r.n_neg == len(neg)


def test_mixture_apply_zero_weight_domain_dropped(spark):
    # weight 0 = policy drops the domain outright: no division error,
    # rate 0, no survivors from it, and it never binds the scale
    docs = spark.createDataFrame(
        [(i, "keep" if i % 2 else "kill") for i in range(100)],
        "doc_id long, source string")
    weights = spark.createDataFrame(
        [("keep", 0.5, 1.0), ("kill", 0.5, 0.0)],
        "domain string, share double, weight double")
    rows = sampling.mixture_apply(docs, weights).collect()
    assert all(r.domain == "keep" for r in rows)
    # with "kill" excluded from the min, "keep" binds: rate exactly 1.0
    assert len(rows) == 50 and all(r.keep_rate == 1.0 for r in rows)


def test_mixture_apply_unknown_domain_zeroed_not_silent(spark):
    # documents whose domain is ABSENT from the weights table draw
    # keep_rate 0 by contract (left join + coalesce), and the coverage
    # audit surfaces exactly that mass with covered=false
    docs = spark.createDataFrame(
        [(i, "known" if i % 2 else "mystery") for i in range(100)],
        "doc_id long, source string")
    weights = spark.createDataFrame(
        [("known", 1.0, 1.0)], "domain string, share double, weight double")
    rows = sampling.mixture_apply(docs, weights).collect()
    assert all(r.domain == "known" for r in rows) and len(rows) == 50
    cov = {r.domain: (r.n_docs, r.covered)
           for r in sampling.mixture_coverage(docs, weights).collect()}
    assert cov == {"known": (50, True), "mystery": (50, False)}


def test_mixture_coverage_matches_duckdb_oracle(spark):
    import duckdb
    docs = spark.createDataFrame(
        [(i, ["a", "b", "ghost"][i % 3]) for i in range(90)],
        "doc_id long, source string")
    weights = spark.sql(
        "select 'a' as domain, 0.5d as share, 0.5d as weight "
        "union all select 'b', 0.5d, 0.5d")
    got = [tuple(r) for r in
           sampling.mixture_coverage(docs, weights).collect()]
    con = duckdb.connect()
    con.register("mixcov_docs", docs.toPandas())
    wsql = ("select 'a' as domain, 0.5 as share, 0.5 as weight "
            "union all select 'b', 0.5, 0.5")
    want = con.sql(sampling.mixture_coverage_sql(
        "mixcov_docs", wsql)).fetchall()
    assert got == [tuple(w) for w in want]


def test_hll_registers_merge_to_union(spark):
    # the cross-crawl merge claim: max-merging two snapshots' register
    # tables is BIT-identical to sketching the union directly — so the
    # estimate of (last month ∪ today) never needs last month's items
    import pyspark.sql.functions as F
    from lexor_spark.sketches import _hll_pos, _hll_rho, HLL_M

    def regs(rows):
        df = spark.createDataFrame(rows, "host string, url string")
        return (df.select("host",
                          _hll_pos(F.col("url"), HLL_M).alias("pos"),
                          _hll_rho(F.col("url")).alias("val"))
                .groupBy("host", "pos").agg(F.max("val").alias("val")))

    a = [("h", f"old{i}") for i in range(60)]
    b = [("h", f"new{i}") for i in range(40)] + a[:10]  # overlap too
    merged = (regs(a).union(regs(b))
              .groupBy("host", "pos").agg(F.max("val").alias("val")))
    direct = regs(a + b)
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want
