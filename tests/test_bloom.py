"""Relational Bloom filter (lexor_spark.bloom): build + probe.

The filter words are differential-tested against an independent pure-
Python recomputation (hashlib.md5, the same salted scheme), and the
probe is checked for the Bloom invariants: zero false negatives, and
false positives only where the recomputed filter genuinely collides.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lexor_spark import bloom

M, K = 1 << 12, 5  # small m so the test corpus sets a meaningful fraction


def _py_positions(key: str) -> list[int]:
    return [int(hashlib.md5(f"{key}#b{i}".encode()).hexdigest()[:8], 16) % M
            for i in range(K)]


def _py_filter(keys: list[str]) -> dict[int, int]:
    words: dict[int, int] = {}
    for key in keys:
        for pos in _py_positions(key):
            words[pos // 63] = words.get(pos // 63, 0) | (1 << (pos % 63))
    return words


def _py_hit(words: dict[int, int], key: str) -> bool:
    return all(words.get(p // 63, 0) & (1 << (p % 63))
               for p in _py_positions(key))


@pytest.fixture(scope="module")
def seen_keys() -> list[str]:
    return [f"https://site{i % 7}.example/p{i}" for i in range(300)]


def test_build_matches_python(spark, seen_keys):
    df = spark.createDataFrame([(k,) for k in seen_keys], "url string")
    got = {r["word_idx"]: r["word"]
           for r in bloom.bloom_build(df, F.col("url"), M, K).collect()}
    want = _py_filter(seen_keys)
    assert got == want  # 63-bit words: every value positive, no sign games


def test_probe_no_false_negatives(spark, seen_keys):
    df = spark.createDataFrame([(k,) for k in seen_keys], "url string")
    bf = bloom.bloom_build(df, F.col("url"), M, K)
    out = bloom.bloom_probe(df, F.col("url"), bf, M, K).collect()
    assert len(out) == len(set(seen_keys))
    assert all(r["bloom_hit"] for r in out)


def test_probe_novel_matches_python(spark, seen_keys):
    """Novel keys hit IFF the independently recomputed filter says so
    (false positives are a property of the bits, not a bug)."""
    novel = [f"https://new.example/q{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in seen_keys], "url string")
    bf = bloom.bloom_build(df, F.col("url"), M, K)
    cand = spark.createDataFrame([(k,) for k in novel], "url string")
    got = {r["url"]: r["bloom_hit"]
           for r in bloom.bloom_probe(cand, F.col("url"), bf, M, K).collect()}
    words = _py_filter(seen_keys)
    for k in novel:
        assert got[k] == _py_hit(words, k)
    # at 300*5/4096 fill (~31%) the fp rate is ~0.3%: most novels miss
    assert sum(got.values()) < len(novel) // 4


def test_probe_empty_filter(spark):
    """An empty seen-set filter rejects everything (left-join null path)."""
    empty = spark.createDataFrame([], "url string")
    bf = bloom.bloom_build(empty, F.col("url"), M, K)
    cand = spark.createDataFrame([("x",), ("y",)], "url string")
    out = bloom.bloom_probe(cand, F.col("url"), bf, M, K).collect()
    assert all(not r["bloom_hit"] for r in out)


def test_shuffle_join_path(spark, seen_keys):
    """broadcast=False (frontier-scale path) returns identical verdicts."""
    df = spark.createDataFrame([(k,) for k in seen_keys[:50]], "url string")
    bf = bloom.bloom_build(df, F.col("url"), M, K)
    a = sorted(map(tuple, bloom.bloom_probe(
        df, F.col("url"), bf, M, K, broadcast=True).collect()))
    b = sorted(map(tuple, bloom.bloom_probe(
        df, F.col("url"), bf, M, K, broadcast=False).collect()))
    assert a == b
