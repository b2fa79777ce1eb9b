"""Concat-and-chunk training-sequence packing (distributed prefix sum)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexor_spark import packing


def _docs(spark, toks):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_is_exact_prefix_sum(spark):
    toks = [5, 3, 0, 7, 2, 11, 4]          # doc 2 is empty -> dropped
    out = {r.doc_id: r for r in
           packing.pack_bins(_docs(spark, toks), budget=8).collect()}
    assert 2 not in out
    starts, acc = {}, 0
    for i, n in enumerate(toks):
        if n:
            starts[i] = acc
            acc += n
    for i, s in starts.items():
        r = out[i]
        assert r.start_global == s
        assert r.bin_start == s // 8
        assert r.bin_end == (s + toks[i] - 1) // 8
        assert r.offset_in_bin == s % 8
    # doc 3 (start 8? 5+3=8, budget 8) begins exactly at a bin boundary
    assert out[3].offset_in_bin == 0 and out[3].bin_start == 1
    # doc 5 (11 tokens) straddles bins
    assert out[5].bin_end > out[5].bin_start


def test_pack_chunking_invariant(spark):
    """The two-phase plan gives identical placement for ANY chunk
    width (the whole point of the oracle's naive-window mirror)."""
    toks = [3, 9, 1, 4, 6, 2, 8, 5, 7, 10, 2, 3]
    base = None
    for chunk in (1, 3, 5, 1000):
        got = sorted((r.doc_id, r.start_global) for r in packing.pack_bins(
            _docs(spark, toks), budget=16, chunk=chunk).collect())
        if base is None:
            base = got
        assert got == base


def test_pack_sparse_ids(spark):
    """Range-chunking works on sparse ids (post-filter corpora)."""
    rows = [(10, "a b c"), (999, "d e"), (1_000_001, "f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.start_global for r in
           packing.pack_bins(df, budget=4, chunk=100).collect()}
    assert out == {10: 0, 999: 3, 1_000_001: 5}


def test_pack_budget_validation(spark):
    with pytest.raises(ValueError):
        packing.pack_bins(_docs(spark, [1]), budget=0)


def test_pack_chunk_validation(spark):
    for bad in (0, -2):
        with pytest.raises(ValueError):
            packing.pack_bins(_docs(spark, [1]), budget=4, chunk=bad)


# ---------------------------------------------------------------------------
# greedy first-fit (doc-boundary-respecting) packing
# ---------------------------------------------------------------------------

def _firstfit_ref(toks, budget):
    """Plain-Python sequential first-fit — the semantics being
    distributed (single chunk == this exactly)."""
    fills, out = [], []
    for i, n in enumerate(toks):
        for j, f in enumerate(fills):
            if f + n <= budget:
                out.append((i, n, j, f))
                fills[j] = f + n
                break
        else:
            out.append((i, n, len(fills), 0))
            fills.append(n)
    return out


def test_firstfit_single_chunk_matches_sequential(spark):
    """With every doc in one chunk, the distributed placement IS the
    sequential first-fit."""
    toks = [3, 9, 1, 4, 6, 2, 8, 5, 7, 10, 2, 3]
    got = sorted((r.doc_id, r.n_tokens, r.bin_id, r.offset_in_bin)
                 for r in packing.pack_firstfit(
                     _docs(spark, toks), budget=12, chunk=1000).collect())
    assert got == _firstfit_ref(toks, 12)


def test_firstfit_respects_doc_boundaries(spark):
    """No multi-document bin exceeds the budget, and offsets tile each
    bin without overlap."""
    toks = [5, 11, 2, 7, 3, 3, 9, 1, 6, 4, 8, 2, 12, 1]
    rows = packing.pack_firstfit(_docs(spark, toks), budget=12,
                                 chunk=5).collect()
    bins = {}
    for r in rows:
        bins.setdefault(r.bin_id, []).append(r)
    for b, docs in bins.items():
        docs.sort(key=lambda r: r.offset_in_bin)
        if len(docs) > 1:
            assert sum(d.n_tokens for d in docs) <= 12
        pos = 0
        for d in docs:
            assert d.offset_in_bin == pos      # densely tiled, no overlap
            pos += d.n_tokens


def test_firstfit_oversized_doc_gets_own_bin(spark):
    """A document longer than the budget opens a bin alone."""
    toks = [3, 50, 4]
    rows = {r.doc_id: r for r in packing.pack_firstfit(
        _docs(spark, toks), budget=10, chunk=1000).collect()}
    big = rows[1]
    assert big.offset_in_bin == 0
    assert all(r.bin_id != big.bin_id for i, r in rows.items() if i != 1)


def test_firstfit_chunks_pack_independently(spark):
    """Chunk boundaries reset the open-bin state; global bin ids are
    the prefix-sum offsets of per-chunk bin counts."""
    toks = [6, 6, 6, 6]                    # budget 12: pairs pack together
    got = sorted((r.doc_id, r.bin_id, r.offset_in_bin)
                 for r in packing.pack_firstfit(
                     _docs(spark, toks), budget=12, chunk=2).collect())
    # chunk 0 = docs 0,1 -> bin 0; chunk 1 = docs 2,3 -> bin 1
    assert got == [(0, 0, 0), (1, 0, 6), (2, 1, 0), (3, 1, 6)]


def test_firstfit_validation(spark):
    for bad in (0, -1):
        with pytest.raises(ValueError):
            packing.pack_firstfit(_docs(spark, [1]), budget=bad)
        with pytest.raises(ValueError):
            packing.pack_firstfit(_docs(spark, [1]), budget=4, chunk=bad)


def test_pack_counts_matches_pack_bins(spark):
    """pack_bins is now a token_count projection over pack_counts; the
    two must agree exactly on the same corpus."""
    from lexor_spark.textfns import token_count
    docs = _docs(spark, [5, 0, 12, 7, 3, 40, 1])
    via_bins = sorted(map(tuple, packing.pack_bins(
        docs, budget=16, chunk=3).collect()))
    counts = docs.select("doc_id",
                         token_count(F.col("text")).alias("n_tokens"))
    via_counts = sorted(map(tuple, packing.pack_counts(
        counts, budget=16, chunk=3).collect()))
    assert via_bins == via_counts


def test_pack_counts_custom_count_column(spark):
    """Precomputed (tokenizer-real) counts drive the placement — the
    bpe_encode -> pack_counts composition point."""
    counts = spark.createDataFrame(
        [(0, 7), (1, 9), (2, 0), (3, 4)],
        "doc_id long, n_bpe_tokens long")
    rows = {r.doc_id: r for r in packing.pack_counts(
        counts, budget=8, chunk=100,
        count_col="n_bpe_tokens").collect()}
    assert set(rows) == {0, 1, 3}          # zero-token doc dropped
    assert rows[0].start_global == 0
    assert (rows[0].bin_start, rows[0].bin_end) == (0, 0)
    assert rows[1].start_global == 7
    assert (rows[1].bin_start, rows[1].bin_end) == (0, 1)  # splits
    assert rows[3].start_global == 16
    assert rows[3].offset_in_bin == 0


def test_pack_counts_validation(spark):
    counts = spark.createDataFrame([(0, 3)], "doc_id long, n_tokens long")
    for bad in (0, -2):
        with pytest.raises(ValueError):
            packing.pack_counts(counts, budget=bad)
        with pytest.raises(ValueError):
            packing.pack_counts(counts, budget=4, chunk=bad)


def test_tokenize_pack_stream_invariants(spark):
    """The composed BPE->pack gate entry: bins tile the real token
    stream exactly (next start = prev start + prev tokens, offsets
    inside budget, bin ids consistent with the arithmetic)."""
    import __spark_entry__ as e
    rows = sorted(e._q_tokenize_pack(spark, "/root/testdata/sf0.001")
                  .collect(), key=lambda r: r.start_global)
    assert rows
    budget = 512
    pos = 0
    for r in rows:
        assert r.start_global == pos
        assert 0 <= r.offset_in_bin < budget
        assert r.bin_start == r.start_global // budget
        assert r.bin_end == (r.start_global + r.n_bpe_tokens - 1) // budget
        pos += r.n_bpe_tokens
