"""Host-delivery calibration probe: NO Spark, NO pipeline code.

Measures how much CPU the sandbox host actually delivers to an
embarrassingly-parallel pure-Python spin loop pinned (taskset, same
confinement as scripts/bench_scaling.py) at N and 4N cores.  If a
trivial multiprocessing busy-loop — no JVM, no Arrow, no shuffle, no
memory traffic beyond a few registers — scales at less than 4x from 4
to 16 pinned cores, the shortfall is the HOST (hypervisor cap /
frequency policy / neighbor contention), not any property of the
extraction pipeline.  Run interleaved with the scaling protocol to
timestamp the epoch it calibrates.

Output: one JSON line per level + a summary line with
``delivered_ratio`` (= spins_4N / spins_N; 4.0 means the host scales a
perfect workload perfectly) and ``host_ceiling_eff`` (= ratio / 4) —
the upper bound any 4->16 measurement can achieve on this box at this
moment, against which the pipeline's measured efficiency should be
read.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

SPIN_SECONDS = float(os.environ.get("HOSTPROBE_SECONDS", "20"))
LEVELS = tuple(int(x) for x in
               os.environ.get("HOSTPROBE_LEVELS", "4,16").split(","))


def _spin(seconds: float, q: mp.Queue) -> None:
    deadline = time.perf_counter() + seconds
    n = 0
    x = 0
    while time.perf_counter() < deadline:
        # ~1e5 trivial integer ops between clock checks
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 1
    q.put((n, x))


def measure(cores: int) -> None:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_spin, args=(SPIN_SECONDS, q))
             for _ in range(cores)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    total = sum(q.get()[0] for _ in procs)
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "cores": cores,
        "spins_per_sec": round(total / SPIN_SECONDS, 1),
        "wall_s": round(wall, 2),
    }))


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        measure(int(sys.argv[2]))
        return
    results = {}
    # alternate levels twice so a mid-probe epoch shift shows up
    for cores in (*LEVELS, *LEVELS):
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable,
             os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True, text=True, timeout=600,
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        res = json.loads(line)
        results.setdefault(cores, []).append(res["spins_per_sec"])
        print(line, flush=True)
    lo, hi = LEVELS[0], LEVELS[-1]
    med = {c: round(sum(v) / len(v), 1) for c, v in results.items()}
    ratio = med[hi] / med[lo]
    print(json.dumps({
        "mean_spins_per_sec": med,
        "delivered_ratio": round(ratio, 3),
        "host_ceiling_eff": round(ratio / (hi / lo), 3),
    }))


if __name__ == "__main__":
    main()
