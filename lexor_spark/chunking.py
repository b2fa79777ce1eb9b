"""Passage chunking: sliding token windows over documents.

The step between a cleaned corpus and a tokenizer shard job: split each
document into fixed-width overlapping token windows (width W, stride S,
overlap W-S) so every passage fits a model context and no content is lost
at chunk boundaries.

Spark-first shape: tokenize with ``split`` (JVM regex), generate window
starts with ``sequence`` (one array per doc — no join, no UDF), then
``explode``.  The whole plan is scan → generate → project: embarrassingly
parallel per document, zero shuffles, whole-stage codegen throughout.  At
100 TB the explode multiplies rows ~(n_tokens/S)× but each output row is
narrow; downstream writers see a well-partitioned stream in input order.

The DuckDB oracle mirror uses ``regexp_split_to_array`` +
``generate_series`` + list slicing — semantics (inclusive bounds,
clamped slices) line up with Spark's ``sequence``/``slice`` exactly, so
the gate compares values, not approximations.

No reference counterpart (the reference is a per-document converter,
SURVEY.md §2.3): this is harness-side training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_passages", "chunk_passages_sql"]

WIDTH = 64    # tokens per passage
STRIDE = 48   # start-to-start distance (overlap = WIDTH - STRIDE)


def chunk_passages(docs: DataFrame, width: int = WIDTH,
                   stride: int = STRIDE, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Explode ``docs`` into (doc_id, chunk_id, n_tokens, passage) rows.

    Every token lands in at least one chunk (starts are 0, S, 2S, …);
    the final chunk may be short.  A trailing start whose window would
    be fully contained in the previous window (s > 0 and the previous
    window already reached the last token, i.e. s >= n - W + S) is
    skipped — it would duplicate content into passages without covering
    anything new.  Blank documents produce no rows.  chunk_id is
    start/stride, so consecutive ids mean consecutive (overlapping)
    windows.
    """
    if not 0 < stride <= width:
        raise ValueError("need 0 < stride <= width")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # last useful start: the largest s with s < n - W + S (clamped to
    # [0, n-1]) — beyond it the window [s, min(s+W, n)) is a subset of
    # the previous window's coverage.
    last_start = F.greatest(
        F.lit(0),
        F.least(F.size("t") - 1,
                F.size("t") - width + stride - 1))
    out = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("doc_id"), toks.alias("t"))
        .select("doc_id", "t",
                F.explode(F.sequence(F.lit(0), last_start,
                                     F.lit(stride))).alias("s"))
        .select(
            "doc_id",
            F.floor(F.col("s") / stride).cast("int").alias("chunk_id"),
            F.size(F.slice("t", F.col("s") + 1, width)).alias("n_tokens"),
            F.array_join(F.slice("t", F.col("s") + 1, width), " ")
            .alias("passage"),
        )
    )
    return out


def chunk_passages_sql(width: int = WIDTH, stride: int = STRIDE,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB mirror of :func:`chunk_passages` (same aliases/types:
    chunk_id int, n_tokens int, passage varchar)."""
    return f"""
with toks as (
  select {id_col} as doc_id,
         regexp_split_to_array(trim({text_col}), '\\s+') as t
  from {table}
  where trim({text_col}) <> ''),
starts as (
  select doc_id, t,
         unnest(generate_series(
             0,
             greatest(0, least(len(t) - 1,
                               len(t) - {width} + {stride} - 1)),
             {stride})) as s
  from toks)
select doc_id,
       (s // {stride})::int as chunk_id,
       len(t[s + 1 : s + {width}])::int as n_tokens,
       array_to_string(t[s + 1 : s + {width}], ' ') as passage
from starts
"""
