"""Two-parallelism scaling benchmark (BASELINE.json north_rule evidence).

No real multi-node cluster exists in this sandbox, so — per the driver's
instruction — the N→4N *cluster-size* criterion is evidenced by running the
IDENTICAL extraction job at two local parallelism levels on the SAME input
and reporting throughput at both plus efficiency = (thru_4N / thru_N) / 4.

Each measurement is a fresh ``spark-submit``-equivalent subprocess (fresh
JVM, fresh Python workers) so no warm-cache leaks between levels.

Usage:
    python scripts/bench_scaling.py              # run 8 vs 32, write BENCH/BASELINE.md
    python scripts/bench_scaling.py --worker N   # internal: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("BENCH_REPEAT", "96"))
LEVELS = (8, 32)


def measure(cores: int) -> None:
    """One timed extraction run at local[cores]; prints a JSON line."""
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import SparkSession

    from lexor_spark.job import extract_pages
    from lexor_spark.pages import materialized_pages

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = materialized_pages(spark, SF_DIR, REPEAT,
                               os.path.join(REPO, ".bench"))
    n_docs = pages.count()
    total_bytes = pages.select(F.sum(F.length("html"))).collect()[0][0]
    # warm-up pass: JIT + Python worker pool spin-up excluded from timing,
    # exactly as cluster steady-state throughput would be measured
    warm = pages.limit(2000)
    extract_pages(warm, salt_buckets=256, partitions=cores * 2) \
        .write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    extract_pages(pages, salt_buckets=256, partitions=cores * 2) \
        .write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "cores": cores, "n_docs": n_docs, "html_bytes": int(total_bytes),
        "wall_s": round(wall, 3), "docs_per_sec": round(n_docs / wall, 1),
    }))
    spark.stop()


def run_level(cores: int) -> dict:
    # taskset confines the WHOLE process tree (JVM + Python workers) to
    # `cores` CPUs — an N-core cluster does not get spare cores for shuffle
    # and Arrow IPC, so neither may the N-core measurement.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        measure(int(sys.argv[2]))
        return
    results = {c: run_level(c) for c in LEVELS}
    lo, hi = LEVELS
    thru_lo = results[lo]["docs_per_sec"]
    thru_hi = results[hi]["docs_per_sec"]
    eff = (thru_hi / thru_lo) / (hi / lo)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as fh:
        fh.write(f"""# BENCH/BASELINE.md — measured scaling evidence

Protocol: BASELINE.md §Measurement protocol. Identical extraction job
(`lexor_spark.job.extract_pages`: salted repartition on
`pmod(xxhash64(url), 256)` → `mapInArrow` fused kernel → noop sink), same
input ({results[lo]['n_docs']} pages, {results[lo]['html_bytes']:,} html
bytes, pages table materialized once to parquet from
`pages_df('{SF_DIR}', repeat={REPEAT})`), two parallelism levels in fresh
JVM subprocesses. Sandbox stand-in for N vs 4N executors per driver
instruction (no real cluster here). Warm-up pass (2k docs) excluded from
timing — steady-state throughput, as on a cluster; timed section is the
full distributed scan→salt→extract action.

| parallelism | wall (s) | throughput (docs/sec) |
|---|---|---|
| local[{lo}]  (N)  | {results[lo]['wall_s']} | {thru_lo} |
| local[{hi}] (4N) | {results[hi]['wall_s']} | {thru_hi} |

**Scaling efficiency (N→4N) = (thru_4N / thru_N) / 4 = {eff:.3f}**
(requirement: ≥ 0.8 — {"MET" if eff >= 0.8 else "NOT MET"})

Config: `spark.sql.execution.arrow.maxRecordsPerBatch=512`,
`spark.sql.shuffle.partitions=cores`, AQE on, salt_buckets=256,
partitions=2×cores. Host: {os.cpu_count()} cores.
""")
    print(json.dumps({"levels": results, "efficiency": round(eff, 3),
                      "met": eff >= 0.8}))


if __name__ == "__main__":
    main()
