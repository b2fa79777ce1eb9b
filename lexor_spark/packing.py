"""Training-sequence packing (concat-and-chunk).

LLM pretraining consumes fixed-length token sequences; the standard
packing (GPT-2 onward) concatenates all documents in a deterministic
order and slices the stream every ``budget`` tokens.  The operator a
pipeline needs is the PLACEMENT: for every document, its global start
offset in the concatenated token stream, hence which training bin(s)
it lands in and where — i.e. an exact distributed prefix sum over the
per-document token counts.

A naive window (``sum() over (order by doc_id)``) puts the whole
corpus in ONE task.  This module computes the identical prefix sum in
two bounded levels:

* level 1 — documents are range-chunked by ``doc_id // chunk`` (works
  on sparse ids; chunks are value ranges, not equal counts) and each
  chunk's token total is one map-side-combinable agg row;
* level 2 — chunk totals get their own running sum.  With
  ``chunk = 10^6`` a 10^12-doc corpus yields 10^6 chunk rows, so this
  window is a single small task over ~megabytes; a third level of the
  same construction bounds it again if ever needed;
* the per-document offset is then chunk-prefix + an in-chunk window
  cumsum (partitioned by chunk — bounded by the chunk width).

The DuckDB oracle runs the naive single-window form — same values,
which is exactly the point: the two-phase plan is a pure optimization.
No reference counterpart; method per the public pretraining
literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lexor_spark.textfns import SQL, token_count

__all__ = ["pack_bins", "pack_bins_sql"]


def pack_bins(docs: DataFrame, budget: int, chunk: int = 1_000_000,
              text_col: str = "text", id_col: str = "doc_id"
              ) -> DataFrame:
    """(doc_id, n_tokens, start_global, bin_start, bin_end,
    offset_in_bin) for every document with at least one token, in
    concatenation order (= ``id_col`` ascending).  ``bin_start`` /
    ``bin_end`` are the first/last training sequences the document's
    tokens land in (concat-and-chunk splits documents mid-stream);
    ``offset_in_bin`` is the position of the first token inside
    ``bin_start``."""
    if budget <= 0:
        raise ValueError(f"pack_bins: budget must be positive, "
                         f"got {budget}")
    if chunk <= 0:
        # a negative chunk would silently REVERSE the level-2 offset
        # order (trunc(id/chunk) is non-increasing), corrupting every
        # placement; zero divides by zero
        raise ValueError(f"pack_bins: chunk must be positive, "
                         f"got {chunk}")
    d = (docs.select(F.col(id_col),
                     token_count(F.col(text_col)).cast("long")
                     .alias("n_tokens"))
         .filter(F.col("n_tokens") > 0)
         .withColumn("_chunk", (F.col(id_col) / chunk).cast("long")))
    csum = d.groupBy("_chunk").agg(F.sum("n_tokens").alias("_ctotal"))
    wprev = (Window.orderBy("_chunk")
             .rowsBetween(Window.unboundedPreceding, -1))
    coff = csum.select("_chunk", F.coalesce(F.sum("_ctotal").over(wprev),
                                            F.lit(0)).alias("_coff"))
    win = (Window.partitionBy("_chunk").orderBy(id_col)
           .rowsBetween(Window.unboundedPreceding, -1))
    out = (d.join(F.broadcast(coff), "_chunk")
           .select(
               id_col, "n_tokens",
               (F.col("_coff")
                + F.coalesce(F.sum("n_tokens").over(win), F.lit(0)))
               .alias("start_global")))
    # exact integer bin arithmetic: floor(double_div) can misassign a
    # boundary document once ulp(start/budget) exceeds 1/budget (real at
    # 10^15-token streams with 2^20+ budgets); (x - x%b)/b divides an
    # exact multiple, whose true quotient is representable, so the
    # double division is exact for streams under 2^53 tokens
    start = F.col("start_global")
    last = start + F.col("n_tokens") - 1
    return out.select(
        id_col, "n_tokens", "start_global",
        ((start - F.pmod(start, F.lit(budget))) / budget).cast("long")
        .alias("bin_start"),
        ((last - F.pmod(last, F.lit(budget))) / budget).cast("long")
        .alias("bin_end"),
        F.pmod(start, F.lit(budget)).cast("long").alias("offset_in_bin"))


def pack_bins_sql(table: str, budget: int, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    """Naive single-window mirror — identical values to the two-phase
    plan (the oracle verifies the optimization changed nothing)."""
    tc = SQL.TOKEN_COUNT.format(c=text_col)
    return f"""
with d as (
  select {id_col}, ({tc})::bigint as n_tokens from {table}
),
p as (
  select {id_col}, n_tokens,
         coalesce(sum(n_tokens) over (order by {id_col}
                                      rows between unbounded preceding
                                      and 1 preceding), 0)::bigint
           as start_global
  from d where n_tokens > 0
)
select {id_col}, n_tokens, start_global,
       (start_global // {budget})::bigint as bin_start,
       ((start_global + n_tokens - 1) // {budget})::bigint as bin_end,
       (start_global % {budget})::bigint as offset_in_bin
from p
"""
