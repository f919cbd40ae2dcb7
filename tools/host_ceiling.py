"""Measure the HOST's own parallel-scaling ceiling with pure-CPU work
(process-pool sha256 chains — no Spark, no memory pressure, no IO).

A perfectly parallel program cannot scale better than this box does; the
engine's measured efficiency must be read against this ceiling. On a real
N → 4N executor cluster each executor brings its own cores, memory bus and
disks, so this single-box ceiling does not apply there.
"""

from __future__ import annotations

import json
import sys
import time
import hashlib
from concurrent.futures import ProcessPoolExecutor


def work(units: int) -> int:
    h = b"x"
    for _ in range(units * 150000):
        h = hashlib.sha256(h).digest()
    return 1


def measure(procs: int, units_per_proc: int, trials: int = 5) -> float:
    best = 0.0
    for _ in range(trials):
        with ProcessPoolExecutor(procs) as ex:
            t0 = time.perf_counter()
            list(ex.map(work, [units_per_proc] * procs))
            dt = time.perf_counter() - t0
        best = max(best, procs * units_per_proc / dt)
    return best


def ceiling(n: int = 2, trials: int = 5) -> dict:
    b_lo = measure(n, 8 // n if n <= 8 else 1, trials)
    b_hi = measure(4 * n, max(1, 8 // (4 * n)) if 4 * n <= 8 else 1, trials)
    return {
        "n": n,
        "tput_low": round(b_lo, 2),
        "tput_high": round(b_hi, 2),
        "host_ceiling": round(b_hi / (4 * b_lo), 3),
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    print(json.dumps(ceiling(n)))
