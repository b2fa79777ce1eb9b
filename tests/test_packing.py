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
