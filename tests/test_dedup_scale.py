"""Scale-safety tests for the dedup family.

VERDICT r1 items #2 and #9: LSH_BUCKET_CAP must be *enforced* (a
boilerplate-identical band key at web scale otherwise yields O(bucket²)
candidates in the band self-join), and `_spread` must not re-shuffle a
source that is already well partitioned.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexor_spark import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """1k boilerplate-identical docs: every band bucket holds all 1000
    rows, far over a cap of 50, so the self-join sees zero candidates
    (499,500 pairs × 4 bands uncapped).  Exact dedup is the operator
    that owns this corpus; LSH must refuse to blow up on it."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [text] * 1000)
    pairs = dedup.lsh_pairs(docs, bucket_cap=50)
    assert pairs.count() == 0


def test_lsh_bucket_cap_keeps_small_buckets(spark):
    """Mixed corpus: 30 identical pages (bucket 30 > cap 10 → dropped)
    plus one genuine near-dup pair in its own small bucket — the pair
    must survive the cap filter."""
    boiler = "copyright acme corp all rights reserved terms privacy contact"
    a = "spark makes distributed dataframes easy to reason about at scale"
    b = "spark makes distributed dataframes easy to reason about at any scale"
    docs = _docs(spark, [boiler] * 30 + [a, b])
    pairs = dedup.lsh_pairs(docs, threshold=0.3, bucket_cap=10).collect()
    got = {(r.a, r.b) for r in pairs}
    assert (30, 31) in got
    # no pair of boilerplate docs (ids 0..29) leaked through
    assert all(not (x < 30 and y < 30) for x, y in got)


def test_lsh_cap_noop_on_normal_corpus(spark, sf_dir):
    """On the real test corpus no bucket approaches the default cap, so
    enforcement must not change results vs an effectively-infinite cap."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    capped = {(r.a, r.b, r.jaccard)
              for r in dedup.lsh_pairs(docs).collect()}
    uncapped = {(r.a, r.b, r.jaccard)
                for r in dedup.lsh_pairs(docs, bucket_cap=10**9).collect()}
    assert capped == uncapped


def test_spread_skips_well_partitioned_input(spark):
    """_spread must be a no-op (same DataFrame object, no exchange) when
    the source already has >= defaultParallelism partitions."""
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    assert dedup._spread(df) is df


def test_spread_fans_out_single_split(spark):
    df = spark.range(1000).coalesce(1)
    out = dedup._spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


# ---------------------------------------------------------------------------
# banded sign-LSH pair join (sim.cosine_dup_pairs)
# ---------------------------------------------------------------------------

def test_cosine_dup_pairs_exact_on_survivors(spark):
    """Every reported pair must carry the EXACT cosine (blocking only
    prunes candidates, never changes values) and clear the threshold."""
    from lexor_spark import sim
    sf = "/root/testdata/sf0.001"
    got = {(r.a, r.b): r.sim
           for r in sim.cosine_dup_pairs(spark, sf, threshold=0.25).collect()}
    assert got, "expected some near-dup pairs on the test corpus"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    l = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    r = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    brute = {(x.a, x.b): x.sim for x in
             l.join(r, F.col("a") < F.col("b"))
              .select("a", "b",
                      F.round(sim.cosine(F.col("va"), F.col("vb")), 4)
                       .alias("sim"))
              .filter(F.col("sim") > 0.25).collect()}
    # exact precision: reported pairs are a subset of brute force with
    # identical sims
    for k, v in got.items():
        assert k in brute and brute[k] == v


def test_cosine_pair_bucket_cap_bounds_degenerate(spark, tmp_path):
    """1k identical vectors with a small cap: every band bucket holds all
    rows, so the pair join sees zero candidates instead of ~500k pairs."""
    from lexor_spark import sim
    vec = [float((i % 7) - 3) for i in range(64)]
    df = spark.createDataFrame([(i, vec) for i in range(1000)],
                               "vec_id long, embedding array<double>")
    d = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    pairs = sim.cosine_dup_pairs(spark, d, threshold=0.25, bucket_cap=50)
    assert pairs.count() == 0


def test_jaccard_stop_shingle_cap(spark):
    """A boilerplate shingle present in every doc must not explode the
    inverted-index join when the df cap is on; genuinely similar pairs
    still surface through their rarer shingles."""
    boiler = "all rights reserved by the site owner today"
    core = "unique alpha beta gamma delta epsilon iota kappa lambda mu nu xi"
    a = f"{core} zeta. {boiler}"
    b = f"{core} eta. {boiler}"
    others = [f"doc number {i} talks about topic {i} only. {boiler}"
              for i in range(40)]
    docs = _docs(spark, [a, b] + others)
    capped = dedup.jaccard_pairs(docs, threshold=0.2, max_shingle_df=10)
    got = {(r.a, r.b) for r in capped.collect()}
    assert (0, 1) in got
    exact = dedup.jaccard_pairs(docs, threshold=0.2)
    exact_pairs = {(r.a, r.b): r.jaccard for r in exact.collect()}
    # capped jaccard is a lower bound of the exact one
    for r in capped.collect():
        assert r.jaccard <= exact_pairs[(r.a, r.b)] + 1e-9


def test_span_dedup_strips_shared_boilerplate(spark):
    """Three docs sharing a 10-word boilerplate block plus unique tails:
    the shared block disappears from every doc, unique content stays."""
    boiler = "subscribe to our newsletter for daily updates and special offers"
    uniq = ["alpha beta gamma delta", "epsilon zeta eta theta",
            "iota kappa lambda mu"]
    docs = _docs(spark, [f"{boiler} {u}" for u in uniq])
    out = {r.doc_id: r for r in dedup.span_dedup(docs, w=10).collect()}
    assert len(out) == 3
    for i, u in enumerate(uniq):
        assert out[i].n_blocks == 2
        assert out[i].n_dup_blocks == 1
        assert out[i].text_dedup == u
        assert boiler not in out[i].text_dedup


def test_span_dedup_unique_corpus_untouched(spark):
    """No cross-doc repetition → nothing removed, text round-trips
    (normalized)."""
    texts = ["one two three four five", "six seven eight nine ten"]
    docs = _docs(spark, texts)
    out = {r.doc_id: r for r in dedup.span_dedup(docs, w=3).collect()}
    for i, t in enumerate(texts):
        assert out[i].n_dup_blocks == 0
        assert out[i].text_dedup == t


def test_span_dedup_within_doc_repeat_not_removed(spark):
    """A block repeated only WITHIN one document is not cross-doc
    boilerplate: min_df counts distinct documents, so it survives."""
    docs = _docs(spark, ["spam spam spam spam spam spam",
                         "regular content here totally unique"])
    out = {r.doc_id: r for r in dedup.span_dedup(docs, w=3).collect()}
    assert out[0].n_dup_blocks == 0
    assert "spam" in out[0].text_dedup


def test_lm_score_ranks_inliers_above_gibberish(spark):
    """Self-trained bigram LM: text built from the corpus's common
    bigrams must outscore uniform-random junk."""
    from lexor_spark.lm import lm_score
    common = ["the cat sat on the mat and the dog ran off"] * 5
    docs = _docs(spark, common + ["xq zj vk wp qx jz kv pw bzx"])
    out = {r.doc_id: r.lm_score for r in lm_score(docs).collect()}
    inlier = out[0]
    junk = out[5]
    assert inlier > junk


def test_lm_score_oov_floor(spark):
    """Scoring against a DISJOINT training corpus: every bigram is OOV,
    so the score is exactly ln(1/(T+1)) for all scored bigrams."""
    import math

    from lexor_spark.lm import lm_score
    train = _docs(spark, ["aaaa"])          # T = 3 bigrams
    score_me = _docs(spark, ["zzzz"])        # all bigrams unseen
    out = lm_score(score_me, train=train).collect()
    assert len(out) == 1
    assert out[0].n_bigrams == 3
    assert out[0].lm_score == round(math.log(1.0 / 4), 4)


# ---------------------------------------------------------------------------
# dup_clusters — connected components over the pair graph
# ---------------------------------------------------------------------------

def test_dup_clusters_transitive_chain(spark):
    """A~B and B~C but never A~C directly: cluster assignment must merge
    the chain into ONE cluster (this is exactly what pair output alone
    cannot express) — requires >1 propagation round."""
    docs = _docs(spark, [f"doc {i}" for i in range(6)])
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], ["a", "b"])
    out = dedup.dup_clusters(docs, pairs=pairs)
    rows = {r.doc_id: r for r in out.collect()}
    assert [rows[i].cluster_id for i in range(4)] == [0, 0, 0, 0]
    assert rows[4].cluster_id == 4 and rows[5].cluster_id == 4
    assert rows[0].is_canonical and not rows[1].is_canonical
    assert rows[0].cluster_size == 4 and rows[5].cluster_size == 2


def test_dup_clusters_singletons_survive(spark):
    """Docs in no pair are their own cluster of size 1 — and the
    singleton side is unioned back outside the iteration loop."""
    texts = ["alpha unique text one", "beta unique text two",
             "gamma unique text three"]
    docs = _docs(spark, texts)
    pairs = spark.createDataFrame([], "a long, b long")
    out = dedup.dup_clusters(docs, pairs=pairs).collect()
    assert len(out) == 3
    assert all(r.cluster_id == r.doc_id and r.cluster_size == 1
               and r.is_canonical for r in out)


def test_dup_clusters_end_to_end_lsh(spark):
    """Through the default lsh_pairs edge source: two near-identical
    page families collapse to two clusters; keep-set = canonical rows."""
    fam_a = ["spark engine makes distributed dataframes easy to use " + x
             for x in ("at scale", "at any scale", "at web scale")]
    fam_b = ["completely different content about cooking pasta at home " + x
             for x in ("tonight", "this evening", "for dinner tonight")]
    uniq = ["nothing like the others entirely standalone document here"]
    docs = _docs(spark, fam_a + fam_b + uniq)
    out = dedup.dup_clusters(docs, threshold=0.2)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].cluster_id == rows[1].cluster_id == rows[2].cluster_id == 0
    assert rows[3].cluster_id == rows[4].cluster_id == rows[5].cluster_id == 3
    assert rows[6].cluster_size == 1
    keep = sorted(r.doc_id for r in rows.values() if r.is_canonical)
    assert keep == [0, 3, 6]


def test_dup_clusters_matches_union_find_oracle(spark):
    """Property check against a serial union-find oracle: for random
    edge sets, the distributed min-label propagation must produce
    exactly the connected components (cluster id = component min)."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(2, 14)
        m = rng.randint(0, n * 2)
        edges = sorted({tuple(sorted(rng.sample(range(n), 2)))
                        for _ in range(m)})
        # serial oracle: union-find with min-root labels
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {i: find(i) for i in range(n)}

        docs = spark.createDataFrame([(i, f"t{i}") for i in range(n)],
                                     ["doc_id", "text"])
        pairs = (spark.createDataFrame(edges, "a long, b long") if edges
                 else spark.createDataFrame([], "a long, b long"))
        got = {r.doc_id: r.cluster_id
               for r in dedup.dup_clusters(docs, pairs=pairs).collect()}
        assert got == expect, f"seed={seed} edges={edges}"


def test_minhash_est_pairs_identical_docs(spark):
    """Identical texts: est and exact Jaccard are both 1.0, error 0;
    and est always equals the manual component-match fraction."""
    from lexor_spark import dedup
    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "a completely different document about spark shuffles here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["a"], r["b"]): r
           for r in dedup.minhash_est_pairs(docs, threshold=0.1).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["jaccard"] == 1.0 and r["est_jaccard"] == 1.0
    assert r["abs_err"] == 0.0
    # est must be a multiple of 1/k
    k = dedup.MINHASH_K
    for r in out.values():
        assert abs(r["est_jaccard"] * k - round(r["est_jaccard"] * k)) < 1e-9


def test_containment_asymmetric(spark):
    from lexor_spark.dedup import containment_pairs

    long = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    snippet = "alpha beta gamma delta epsilon zeta eta theta"
    other = "totally different words entirely here now"
    docs = spark.createDataFrame(
        [(1, long), (2, snippet), (3, other)], "doc_id long, text string")
    rows = {(r.src, r.dst): r.containment
            for r in containment_pairs(docs, threshold=0.5).collect()}
    # snippet -> long is near-1; long -> snippet is low (asymmetric)
    assert (2, 1) in rows and rows[(2, 1)] >= 0.9
    assert (1, 2) not in rows
    assert not any(3 in k for k in rows)


def test_cluster_keepers_quality_wins(spark):
    from lexor_spark.dedup import cluster_keepers

    # docs 1/2 are near-dups; 2 is longer/higher quality; 3 standalone
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "going with more and more words that pad this out ") * 4
    docs = spark.createDataFrame(
        [(1, base[:150]), (2, base), (3, "short unrelated thing")],
        "doc_id long, text string")
    got = {r.cluster_id: r for r in
           cluster_keepers(docs, threshold=0.2).collect()}
    dup = got[1]
    assert dup.cluster_size == 2 and dup.n_dropped == 1
    assert dup.keep_id == 2  # higher quality beats lower id
    assert got[3].cluster_size == 1 and got[3].keep_id == 3


def test_winnowing_matches_serial_reference(spark):
    """Spark winnowing vs an independent hashlib/py reimplementation,
    incl. the shared-run guarantee and short-doc edge cases."""
    import hashlib

    from lexor_spark import dedup

    rows = [
        (0, "a b c d e f g a b c d e f g"),     # internal repeat
        (1, "x y"),                              # < k tokens: nothing
        (2, ""),                                 # empty: nothing
        (3, "p q r s t u"),                      # exactly one window
        (4, "the fox jumps over the lazy dog today"),
        (5, "zz the fox jumps over the lazy dog later"),  # shared run
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r.doc_id, r.pos, r.fp) for r in
                 dedup.winnow_fingerprints(df, k=3, w=4).collect())

    def serial(text, k=3, w=4):
        toks = text.lower().split()
        grams = ([" ".join(toks[i:i + k])
                  for i in range(len(toks) - k + 1)]
                 if len(toks) >= k else [])
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
              for g in grams]
        picks = set()
        for i in range(len(hs) - w + 1):
            win = hs[i:i + w]
            mn = min(win)
            picks.add((i + win.index(mn), mn))
        return picks

    want = sorted((d, p, f) for d, t in rows for (p, f) in serial(t))
    assert got == want
    # the winnowing guarantee: docs 4 and 5 share a >= w+k-1 token run,
    # so they must share at least one fingerprint VALUE
    fps4 = {f for d, p, f in got if d == 4}
    fps5 = {f for d, p, f in got if d == 5}
    assert fps4 & fps5
    assert not [x for x in got if x[0] in (1, 2)]
