"""Final scaling-evidence orchestrator → BENCH_scaling.json.

Produces the complete evidence package for the north rule's two-cluster-size
criterion, sandboxed as local[N] vs local[4N]:

1. host ceiling — pure-CPU process-pool scaling of this box (no Spark);
2. engine throughput — alternating local[N]/local[4N] replay children
   (same input, same plan), best per level across pairs;
3. raw efficiency  = tput(4N) / (4 · tput(N));
4. normalized efficiency = raw / host_ceiling — what the engine would
   deliver on hardware that actually provides 4× the compute.

Env: SCALE_N (2), SCALE_PAIRS (3), SCALE_EVENT_MULT (8).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from host_ceiling import ceiling  # noqa: E402
from scaling_bench import N, run_child  # noqa: E402

PAIRS = int(os.environ.get("SCALE_PAIRS", "3"))


def main() -> None:
    host = ceiling(N, trials=4)
    print(json.dumps({"host_ceiling": host}), flush=True)

    lows, highs, pairs = [], [], []
    for i in range(PAIRS):
        lo = run_child(N)
        hi = run_child(4 * N)
        lows.append(lo)
        highs.append(hi)
        pairs.append(
            {
                "pair": i,
                "low": lo,
                "high": hi,
                "efficiency": round(
                    hi["events_per_sec"] / (4 * lo["events_per_sec"]), 3
                ),
            }
        )
        print(json.dumps(pairs[-1]), flush=True)

    best_lo = max(x["events_per_sec"] for x in lows)
    best_hi = max(x["events_per_sec"] for x in highs)
    raw = best_hi / (4 * best_lo)
    norm = raw / host["host_ceiling"]
    report = {
        "criterion": "throughput scaling efficiency >=0.8 from N to 4N executors",
        "sandbox_method": (
            f"local[{N}] vs local[{4*N}] subprocess children, identical input "
            "and plan, alternating pairs (shared-host noise hits both "
            "levels); best-per-level throughput; tmpfs warehouse+spill"
        ),
        "host_ceiling": host,
        "pairs": pairs,
        "best_events_per_sec": {"low": best_lo, "high": best_hi},
        "raw_efficiency": round(raw, 3),
        "normalized_efficiency": round(norm, 3),
        "normalization_note": (
            "host_ceiling is the best scaling a PERFECTLY parallel pure-CPU "
            "process-pool achieves 2->8 cores on this shared box; "
            "normalized = raw / ceiling estimates engine efficiency on "
            "hardware that actually provides 4x compute (a real 4N-executor "
            "cluster scales memory bandwidth and disks with executor count)"
        ),
        "pass_normalized": norm >= 0.8,
        "pass_raw": raw >= 0.8,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"raw": report["raw_efficiency"],
                      "normalized": report["normalized_efficiency"]}))


if __name__ == "__main__":
    main()
