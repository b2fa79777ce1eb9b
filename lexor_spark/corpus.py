"""End-to-end training-corpus pipeline: the composition every other
module exists for.

    pages ──extract──▶ text ──quality──▶ kept ──exact-dedup──▶ uniques
          ──near-dup (minhash/LSH)──▶ canonical corpus + reject ledger

Every stage is one of this engine's first-class operators; this module
only composes them.  At 100 TB each arrow (``──▶``) is a materialization
boundary in practice (write + snapshot), which is exactly what
``job.run_job``'s group commits provide; here the composition is a single
lazy plan so tests and the driver can run it end-to-end.

Rejects are data, not discards: the ledger records WHY each url left the
corpus (error row / quality floor / exact dup / near dup) — at training
scale the reject distribution is the first thing a data audit asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lexor_spark import dedup, textfns
from lexor_spark.job import extract_pages
from lexor_spark.pages import pages_df

__all__ = ["build_corpus", "corpus_summary"]


def build_corpus(pages: DataFrame, min_quality: float = 0.3,
                 min_chars: int = 100, jaccard_threshold: float = 0.9,
                 salt_buckets: int = 256) -> tuple[DataFrame, DataFrame]:
    """Returns (corpus, rejects).

    corpus:  url, text, title, lang_attr, n_tokens, quality
    rejects: url, stage, reason
    """
    extracted = extract_pages(pages, salt_buckets=salt_buckets).select(
        "url", "text", "title", "lang_attr", "ok", "err", "n_chars_out")

    err = extracted.filter(~F.col("ok")).select(
        "url", F.lit("extract").alias("stage"),
        F.coalesce("err", F.lit("error")).alias("reason"))
    good = extracted.filter(F.col("ok"))

    scored = good.select(
        "url", "text", "title", "lang_attr",
        textfns.token_count(F.col("text")).alias("n_tokens"),
        textfns.quality_score(F.col("text")).alias("quality"),
        "n_chars_out")
    low = scored.filter((F.col("quality") < min_quality)
                        | (F.col("n_chars_out") < min_chars)).select(
        "url", F.lit("quality").alias("stage"),
        F.concat(F.lit("quality="), F.col("quality").cast("string"),
                 F.lit(" chars="), F.col("n_chars_out").cast("string"))
        .alias("reason"))
    kept = scored.filter((F.col("quality") >= min_quality)
                         & (F.col("n_chars_out") >= min_chars))

    # exact dedup: keep the lexicographically-first url per fingerprint
    # (deterministic keeper — min() is order-insensitive)
    fp = kept.select("url", textfns.fingerprint(F.col("text")).alias("fp"))
    keepers = fp.groupBy("fp").agg(F.min("url").alias("keep_url"))
    exact_dups = (fp.join(keepers, "fp")
                  .filter(F.col("url") != F.col("keep_url"))
                  .select("url", F.lit("exact_dup").alias("stage"),
                          F.concat(F.lit("dup_of="), F.col("keep_url"))
                          .alias("reason")))
    uniq = (fp.join(keepers, "fp")
            .filter(F.col("url") == F.col("keep_url"))
            .select("url").join(kept, "url"))

    # near-dup: LSH pairs above threshold; drop the greater url of each
    # pair (stable: url order is deterministic)
    pairs = dedup.lsh_pairs(uniq.withColumnRenamed("url", "doc_id"),
                            text_col="text", id_col="doc_id",
                            threshold=jaccard_threshold)
    near = (pairs.select(F.col("b").alias("url"),
                         F.lit("near_dup").alias("stage"),
                         F.concat(F.lit("jaccard="),
                                  F.col("jaccard").cast("string"),
                                  F.lit(" with="), F.col("a"))
                         .alias("reason"))
            .dropDuplicates(["url"]))

    corpus = uniq.join(near.select("url"), "url", "left_anti").select(
        "url", "text", "title", "lang_attr", "n_tokens", "quality")
    rejects = err.unionByName(low).unionByName(exact_dups).unionByName(near)
    return corpus, rejects


def corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: per-stage accounting of the full pipeline.
    Thresholds sit inside the synthetic corpus's quality/length
    distribution (5th pct quality 0.5, median length 385) so every
    pipeline stage visibly fires."""
    pages = pages_df(spark, sf_dir)
    corpus, rejects = build_corpus(pages, min_quality=0.7, min_chars=250,
                                   jaccard_threshold=0.5)
    kept = corpus.select(F.lit("corpus").alias("stage"),
                         F.lit("kept").alias("outcome"))
    rej = rejects.select("stage", F.lit("rejected").alias("outcome"))
    return (kept.unionByName(rej)
            .groupBy("stage", "outcome").agg(F.count("*").alias("n"))
            .orderBy("stage", "outcome"))
