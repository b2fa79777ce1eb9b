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

__all__ = ["pack_bins", "pack_bins_sql", "pack_counts", "pack_firstfit",
           "pack_firstfit_sql"]


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
    counts = docs.select(F.col(id_col),
                         token_count(F.col(text_col)).cast("long")
                         .alias("n_tokens"))
    return pack_counts(counts, budget, chunk, id_col=id_col,
                       count_col="n_tokens")


def pack_counts(counts: DataFrame, budget: int, chunk: int = 1_000_000,
                id_col: str = "doc_id",
                count_col: str = "n_tokens") -> DataFrame:
    """The same concat-and-chunk placement over PRECOMPUTED per-document
    token counts — the composition point for tokenizer-aware packing
    (``bpe_encode`` → ``pack_counts`` is the real extract→tokenize→pack
    tail of a pretraining data job; ``pack_bins``'s whitespace
    ``token_count`` is only a proxy).  Identical two-level prefix-sum
    plan and output schema as :func:`pack_bins`."""
    if budget <= 0:
        raise ValueError(f"pack_counts: budget must be positive, "
                         f"got {budget}")
    if chunk <= 0:
        # a negative chunk would silently REVERSE the level-2 offset
        # order (trunc(id/chunk) is non-increasing), corrupting every
        # placement; zero divides by zero
        raise ValueError(f"pack_counts: chunk must be positive, "
                         f"got {chunk}")
    d = (counts.select(F.col(id_col),
                       F.col(count_col).cast("long").alias("n_tokens"))
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


# ---------------------------------------------------------------------------
# doc-boundary-respecting packing: greedy first-fit
# ---------------------------------------------------------------------------
#
# The second standard placement: documents must NOT split across
# training sequences (instruction tuning, contrastive pairs, any
# objective where a truncated document is a corrupted example).  Greedy
# first-fit in doc_id order: place each document into the FIRST open
# bin with room, else open a new bin.  A document longer than the
# budget gets a bin of its own (truncation is the trainer's decision,
# not the packer's).
#
# Distribution contract: a global sequential first-fit is a recurrence
# over the whole corpus — it does not exist at 10^12 documents.  The
# standard compromise (and what every published packing pipeline does)
# packs WITHIN bounded ranges: documents are range-chunked by
# ``doc_id // chunk`` exactly like ``pack_bins``; each chunk packs
# independently inside one ``applyInPandas`` group (per-chunk state is
# bounded by the chunk width), and chunk-local bin ids are offset by a
# prefix sum over per-chunk bin counts (one small window over
# n_chunks rows).  The semantics are DETERMINISTIC given (doc_id order,
# budget, chunk), so the DuckDB oracle mirrors them exactly with a
# recursive CTE carrying the open-bin fill list — the oracle is the
# same algorithm, not an approximation.

def pack_firstfit(docs: DataFrame, budget: int, chunk: int = 1_000_000,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> DataFrame:
    """(doc_id, n_tokens, bin_id, offset_in_bin) under greedy first-fit
    with whole-document placement.  ``bin_id`` is global (chunk-offset
    prefix sum); ``offset_in_bin`` is the token position where the
    document starts inside its bin."""
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"pack_firstfit: budget must be positive, "
                         f"got {budget}")
    if chunk <= 0:
        raise ValueError(f"pack_firstfit: chunk must be positive, "
                         f"got {chunk}")
    d = (docs.select(F.col(id_col),
                     token_count(F.col(text_col)).cast("long")
                     .alias("n_tokens"))
         .filter(F.col("n_tokens") > 0)
         .withColumn("_chunk", (F.col(id_col) / chunk).cast("long")))

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        fills: list[int] = []          # open-bin loads, bin order = open order
        bins = []
        offs = []
        for n in pdf["n_tokens"]:
            n = int(n)
            for j, f in enumerate(fills):      # first open bin with room
                if f + n <= budget:
                    bins.append(j)
                    offs.append(f)
                    fills[j] = f + n
                    break
            else:                              # none fits: open a new bin
                bins.append(len(fills))
                offs.append(0)
                fills.append(n)
        pdf["bin_in_chunk"] = pd.Series(bins, dtype="int64")
        pdf["offset_in_bin"] = pd.Series(offs, dtype="int64")
        return pdf

    schema = (f"{id_col} long, n_tokens long, _chunk long, "
              f"bin_in_chunk long, offset_in_bin long")
    packed = d.groupBy("_chunk").applyInPandas(pack, schema)
    # level 2: global bin offset per chunk — one agg row per chunk, one
    # window over n_chunks rows (bounded exactly like pack_bins)
    counts = packed.groupBy("_chunk").agg(
        (F.max("bin_in_chunk") + 1).alias("_nbins"))
    wprev = (Window.orderBy("_chunk")
             .rowsBetween(Window.unboundedPreceding, -1))
    boff = counts.select(
        "_chunk", F.coalesce(F.sum("_nbins").over(wprev),
                             F.lit(0)).alias("_boff"))
    return (packed.join(F.broadcast(boff), "_chunk")
            .select(id_col, "n_tokens",
                    (F.col("_boff") + F.col("bin_in_chunk")).alias("bin_id"),
                    "offset_in_bin"))


def pack_firstfit_sql(table: str, budget: int, chunk: int = 1_000_000,
                      text_col: str = "text", id_col: str = "doc_id"
                      ) -> str:
    """Exact DuckDB mirror: the same greedy first-fit as a recursive
    CTE whose state column is the open-bin fill list (one recursion
    step places row ``rn`` of EVERY chunk — depth = widest chunk)."""
    tc = SQL.TOKEN_COUNT.format(c=text_col)
    return f"""
with recursive d as (
  select {id_col}, n_tokens, chk,
         row_number() over (partition by chk order by {id_col}) as rn
  from (select {id_col}, ({tc})::bigint as n_tokens,
               ({id_col} // {chunk})::bigint as chk
        from {table})
  where n_tokens > 0
),
steps as (
  select chk, rn, {id_col}, n_tokens,
         0::bigint as bin_in_chunk, 0::bigint as offset_in_bin,
         [n_tokens]::bigint[] as fills
  from d where rn = 1
  union all
  select d.chk, d.rn, d.{id_col}, d.n_tokens,
         coalesce(x.idx - 1, len(s.fills))::bigint,
         case when x.idx is null then 0
              else s.fills[x.idx] end::bigint,
         case when x.idx is null then list_append(s.fills, d.n_tokens)
              else s.fills[1:x.idx-1] || [s.fills[x.idx] + d.n_tokens]
                   || s.fills[x.idx+1:]
         end
  from steps s
  join d on d.chk = s.chk and d.rn = s.rn + 1
  cross join lateral (
    -- nullif: this DuckDB's array_position yields 0 (not NULL) when
    -- nothing matches; normalize so "no open bin fits" is NULL
    select nullif(array_position(
             list_transform(s.fills, f -> f + d.n_tokens <= {budget}),
             true), 0) as idx) x
),
counts as (
  select chk, max(bin_in_chunk) + 1 as nbins from steps group by chk
),
offs as (
  select chk, coalesce(sum(nbins) over (order by chk
                                        rows between unbounded preceding
                                        and 1 preceding), 0)::bigint as boff
  from counts
)
select s.{id_col}, s.n_tokens,
       (o.boff + s.bin_in_chunk)::bigint as bin_id,
       s.offset_in_bin
from steps s join offs o using (chk)
"""
