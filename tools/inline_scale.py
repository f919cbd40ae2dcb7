"""Scaling measurement inside ONE warm JVM: parallelism is controlled by
partition counts (input repartition + spark.sql.shuffle.partitions), so the
N-way and 4N-way runs execute seconds apart on identical warmed code —
eliminating JVM startup, JIT, and most shared-host drift that made
process-per-level measurements (tools/scaling_bench.py) swing 2× between
trials.

local[4N] threads are available; an N-partition stage keeps at most N of
them busy — the standard single-box stand-in for an N-executor cluster.

Writes BENCH_scaling.json. Env: SCALE_N (2), SCALE_ROUNDS (3),
SCALE_EVENT_MULT (4), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# N=8 → the driver-visible local[8] vs local[32] pair
N = int(os.environ.get("SCALE_N", "8"))
ROUNDS = int(os.environ.get("SCALE_ROUNDS", "5"))
MULT = int(os.environ.get("SCALE_EVENT_MULT", "8"))
REPEAT = int(os.environ.get("SCALE_CONTENT_REPEAT", "8"))


def main() -> None:
    from etl_pipeline_rdf_star_spark.data import synth
    from etl_pipeline_rdf_star_spark.session import get_spark
    from etl_pipeline_rdf_star_spark.streaming.cdc import CdcEngine

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    hi_cores = 4 * N
    spark = get_spark("inline-scale", cores=hi_cores, shuffle_partitions=hi_cores)
    spark.sparkContext.setLogLevel("ERROR")

    p = synth.scale_params(synth.n_docs(SF_DIR))
    nf, ne = p.n_files * MULT, p.n_events * MULT

    def run(par: int) -> dict:
        spark.conf.set("spark.sql.shuffle.partitions", str(par))
        ev = (
            synth.cdc_events(
                spark, SF_DIR, n_files=nf, n_events=ne, content_repeat=REPEAT
            )
            .repartition(par)
            .cache()
        )
        n = ev.count()
        wh = tempfile.mkdtemp(prefix=f"is{par}_", dir="/dev/shm")
        try:
            # merge-on-read: the sustained-ingest path the north rule
            # benchmarks (single shuffle + write per micro-batch)
            eng = CdcEngine(spark, wh, n_buckets=par * 2, mode="mor")
            t0 = time.perf_counter()
            eng.replay(ev, num_batches=2, id_prefix="s")
            dt = time.perf_counter() - t0
        finally:
            shutil.rmtree(wh, ignore_errors=True)
            ev.unpersist()
        return {"par": par, "n_events": n, "sec": round(dt, 3),
                "events_per_sec": round(n / dt, 1)}

    # warm both paths once (codegen compile, parquet reader init)
    run(N)
    run(hi_cores)

    rounds = []
    for i in range(ROUNDS):
        lo = run(N)
        hi = run(hi_cores)
        eff = hi["events_per_sec"] / (4 * lo["events_per_sec"])
        rounds.append({"round": i, "low": lo, "high": hi, "efficiency": round(eff, 3)})
        print(json.dumps(rounds[-1]), flush=True)

    effs = [r["efficiency"] for r in rounds]
    best = max(rounds, key=lambda r: r["efficiency"])
    report = {
        "method": (
            f"single warm local[{hi_cores}] JVM; parallelism set by partition "
            f"count ({N} vs {hi_cores}) with matching shuffle.partitions; "
            "interleaved rounds; tmpfs warehouse+spill (per-node disk "
            "bandwidth scales with executors on a real cluster)"
        ),
        "sf_dir": SF_DIR,
        "n_events": rounds[0]["low"]["n_events"],
        "content_repeat": REPEAT,
        "rounds": rounds,
        "median_efficiency": round(statistics.median(effs), 3),
        "best_efficiency": best["efficiency"],
        "criterion": ">=0.8",
        "pass": statistics.median(effs) >= 0.8,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"median_efficiency": report["median_efficiency"],
                      "best_efficiency": report["best_efficiency"]}))


if __name__ == "__main__":
    main()
