"""Pure-CPU box-scaling probe — the measurement ceiling for
BENCH/BASELINE.md's efficiency numbers.

Runs the same total work (integer spin loop, no memory traffic beyond
L1, no Spark, no JVM) split across 2 / 8 / 32 PROCESSES and reports
the N -> 4N efficiency T_N / (4 * T_4N). Anything below 1.0 here is
the box itself (turbo-clock droop as more cores activate, scheduler
overhead), not software: engine efficiencies in BENCH/BASELINE.md
should be read against this ceiling.

    python tools/bench_probe.py
"""

from __future__ import annotations

import multiprocessing as mp
import time


def spin(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def runp(procs: int, total: int = 400_000_000) -> float:
    per = total // procs
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(spin, [per] * procs)
    return time.perf_counter() - t0


if __name__ == "__main__":
    for _ in range(3):
        t2 = runp(2)
        t8 = runp(8)
        t32 = runp(32)
        print(f"t2={t2:.2f} t8={t8:.2f} t32={t32:.2f} "
              f"eff2->8={t2 / (4 * t8):.3f} "
              f"eff8->32={t8 / (4 * t32):.3f}")
