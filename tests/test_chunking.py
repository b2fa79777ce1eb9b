"""Passage chunking: coverage/overlap invariants + DuckDB mirror parity."""

from __future__ import annotations

import duckdb
import pytest

from lexor_spark.chunking import chunk_passages, chunk_passages_sql

SF = "/root/testdata/sf0.001"


def test_chunk_invariants_small(spark):
    """Hand-sized docs: every token covered, stride spacing, short tail."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150))),   # 150 tokens
         (2, "only four tokens here"),                 # < width: one chunk
         (3, "   "),                                   # blank: no rows
         (4, "x")],
        ["doc_id", "text"])
    rows = chunk_passages(docs, width=64, stride=48) \
        .orderBy("doc_id", "chunk_id").collect()

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)

    assert 3 not in by_doc                       # blank doc dropped
    assert [r.n_tokens for r in by_doc[4]] == [1]
    assert [r.n_tokens for r in by_doc[2]] == [4]

    # doc 1: starts 0,48,96 -> widths 64,64,54 (start 144 is skipped:
    # its window [144,150) is fully inside chunk 2's coverage [96,150))
    assert [r.chunk_id for r in by_doc[1]] == [0, 1, 2]
    assert [r.n_tokens for r in by_doc[1]] == [64, 64, 54]
    # stride-aligned reconstruction: first `stride` tokens of each chunk,
    # then the tail of the last chunk, is exactly the original stream
    toks: list[str] = []
    for r in by_doc[1][:-1]:
        toks.extend(r.passage.split(" ")[:48])
    toks.extend(by_doc[1][-1].passage.split(" "))
    assert toks == [f"t{i}" for i in range(150)]


def test_chunk_bad_params():
    with pytest.raises(ValueError):
        chunk_passages(None, width=8, stride=0)
    with pytest.raises(ValueError):
        chunk_passages(None, width=8, stride=9)


def test_chunk_duckdb_mirror(spark):
    """Value parity with the oracle SQL on the real documents table."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = chunk_passages(docs).orderBy("doc_id", "chunk_id") \
        .select("doc_id", "chunk_id", "n_tokens", "passage").collect()

    con = duckdb.connect()
    con.execute(f"create view documents as "
                f"select * from read_parquet('{SF}/documents.parquet')")
    want = con.execute(
        chunk_passages_sql() + " order by doc_id, chunk_id").fetchall()

    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g.doc_id, g.chunk_id, g.n_tokens, g.passage) == tuple(w)

def test_chunk_no_contained_trailing_window(spark):
    """A doc of exactly `width` tokens yields ONE chunk: the would-be
    second start (s=stride) is fully covered by chunk 0 and must be
    skipped (it would duplicate content into passages)."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(64))),    # n == width
         (2, " ".join(f"t{i}" for i in range(70)))],   # tail extends
        ["doc_id", "text"])
    rows = chunk_passages(docs, width=64, stride=48) \
        .orderBy("doc_id", "chunk_id").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.n_tokens for r in by_doc[1]] == [64]
    # doc 2: start 48 covers [48,70) — new tokens 64..69, so it stays
    assert [r.n_tokens for r in by_doc[2]] == [64, 22]
