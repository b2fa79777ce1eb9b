"""sf-scaling sweep of the pair-generating dedup family (VERDICT r4
'Next round' #5): run each query at x1 (sf0.1, 5k docs) and x10 (50k
docs) and report the wall-time ratio.  Capped pair paths should scale
≈linearly (ratio ≈ 10 or below once fixed costs amortize);
``lsh_recall`` is EXPECTED superlinear — by construction it computes
the exhaustive shingle-Jaccard ground truth and is documented as a
sampled-SF tuning tool, never a production pass (dedup.py:999-1004).

The x10 input is synthesized deterministically from sf0.1 (no external
data, per the driver brief): 10 replicas with ``doc_id' = doc_id*10+r``
and every word suffixed ``_r{r}`` — per-document statistics (length,
word count, repetition structure) are preserved while replica
vocabularies are DISJOINT, so no artificial cross-replica near-dups
inflate the pair count; the corpus is 10x the docs with 10x the true
pair structure, which is exactly what a linear-scaling measurement
needs.

Usage: PYTHONPATH=/root/repo python scripts/bench_sfscale.py
Writes the scaled corpus under /root/repo/.cache_sfscale/ (gitignored)
and prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
X10_DIR = os.path.join(REPO, ".cache_sfscale", "x10")
QUERIES = ("containment_pairs", "dedup_lsh_pairs", "minhash_est",
           "dup_clusters", "lsh_recall")
REPLICAS = 10


def build_x10(spark) -> None:
    out = os.path.join(X10_DIR, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = None
    for r in range(REPLICAS):
        sfx = F.lit(f"_r{r}")
        rep = docs.select(
            (F.col("doc_id") * REPLICAS + r).alias("doc_id"),
            F.array_join(
                F.transform(F.split(F.col("text"), " "),
                            lambda w: F.concat(w, sfx)),
                " ").alias("text"),
            "lang", "source", "n_chars")
        reps = rep if reps is None else reps.unionAll(rep)
    reps.repartition(32).write.mode("overwrite").parquet(out)


def main() -> None:
    import bench  # repo-root bench.py: make_spark/run_noop

    spark = bench.make_spark(32)
    build_x10(spark)
    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    results: dict[str, dict] = {}
    for name in QUERIES:
        row: dict = {}
        for label, sf_dir in (("x1", SRC), ("x10", X10_DIR)):
            t0 = time.time()
            bench.run_noop(qs[name](spark, sf_dir))
            row[label] = round(time.time() - t0, 2)
        row["ratio"] = round(row["x10"] / row["x1"], 2)
        results[name] = row
        print(f"{name}: x1={row['x1']}s x10={row['x10']}s "
              f"ratio={row['ratio']}", file=sys.stderr)
    print(json.dumps({"metric": "sf_scaling_pair_family",
                      "replicas": REPLICAS, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
