"""Heap-size A/B at a fixed parallelism level (run U evidence).

Round-4 scaling runs P-T all show the wide (16-core) level capped at
~40-49k docs/s while the same job measured 53.7-55.1k in round 3 on a
strictly slower kernel, and the equal-hardware fair-share control shows
4 x local[4] (4 x 8g heap) beating one local[16] (1 x 8g heap) on the
same 16 cores by 1.22x.  Hypothesis: the fixed 8 GB heap starves the
wide arm -- the round-4 kernel allocates faster, GC share grows with
allocation rate x thread count, and a real 4N-executor cluster would
bring 4N x the memory (per-core memory constant).  This script A/Bs
ONLY the heap at 16 cores, interleaved, fresh pinned JVMs, same input:

    A = BENCH_DRIVER_MEM=8g   (the round-3/4 fixed heap)
    B = BENCH_DRIVER_MEM=32g  (per-core-proportional: 2g x 16 cores)

Output: BENCH/runU_heapab.jsonl, one JSON line per measurement plus a
summary line.  Interleaved A/B/A/B/A/B so any host-epoch drift hits
both arms alike.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_scaling import run_level  # noqa: E402

OUT = os.path.join(REPO, "BENCH", "runU_heapab.jsonl")
CORES = int(os.environ.get("HEAPAB_CORES", "16"))
ARMS = os.environ.get("HEAPAB_ARMS", "8g,32g").split(",")
PAIRS = int(os.environ.get("HEAPAB_PAIRS", "3"))


def main() -> None:
    rows = []
    with open(OUT, "a") as fh:
        for rep in range(PAIRS):
            for mem in ARMS:
                os.environ["BENCH_DRIVER_MEM"] = mem
                res = run_level(CORES)
                res["heap"] = mem
                res["rep"] = rep
                rows.append(res)
                fh.write(json.dumps(res) + "\n")
                fh.flush()
        med = {}
        for mem in ARMS:
            vals = sorted(r["docs_per_sec"] for r in rows if r["heap"] == mem)
            med[mem] = vals[len(vals) // 2]
        summary = {"cores": CORES, "median_docs_per_sec": med,
                   "ratio_B_over_A": round(med[ARMS[1]] / med[ARMS[0]], 3)}
        fh.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
