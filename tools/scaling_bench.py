"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors, sandboxed as local[N] vs local[4N]).

Runs the identical CDC replay (same deterministic event log, same batch
split) in two fresh subprocess JVMs and reports throughput at both plus
efficiency = tput(4N) / (4 × tput(N)).

Usage:
  python tools/scaling_bench.py                 # parent: run both, report
  python tools/scaling_bench.py --child N       # child: one measurement
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SCALE_EVENT_MULT (default 8),
     SCALE_N (default 8 → compares local[8] vs local[32]).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_EVENT_MULT", "16"))
N = int(os.environ.get("SCALE_N", "8"))
TRIALS = int(os.environ.get("SCALE_TRIALS", "3"))
# identical logical plan at both levels: same shuffle partitioning, same
# batch split — only the executor-thread count differs (the sandbox stand-in
# for N vs 4N executors)
SHUFFLE = int(os.environ.get("SCALE_SHUFFLE", "64"))
BATCHES = int(os.environ.get("SCALE_BATCHES", "2"))
MODE = os.environ.get("SCALE_MODE", "mor")
REPEAT = int(os.environ.get("SCALE_CONTENT_REPEAT", "4"))


def child(cores: int) -> None:
    from etl_pipeline_rdf_star_spark.data import synth
    from etl_pipeline_rdf_star_spark.session import get_spark
    from etl_pipeline_rdf_star_spark.streaming.cdc import CdcEngine

    spark = get_spark(f"scale-{cores}", cores=cores, shuffle_partitions=SHUFFLE)
    spark.sparkContext.setLogLevel("ERROR")
    p = synth.scale_params(synth.n_docs(SF_DIR))
    n_files, n_events = p.n_files * MULT, p.n_events * MULT
    ev = (
        synth.cdc_events(spark, SF_DIR, n_files=n_files, n_events=n_events,
                         content_repeat=REPEAT)
        .repartition(SHUFFLE)
        .cache()
    )
    n = ev.count()
    # tmpfs warehouse + spill: one local disk would serialize table IO,
    # which on a real cluster scales with executor count (per-node disks /
    # object-store bandwidth). RAM-backed storage is the faithful stand-in.
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix=f"scale_{cores}_", dir=shm)
    try:
        # untimed warmup replays into a throwaway table: JIT compilation
        # otherwise lands inside the timed window and costs the SMALL level
        # relatively more wall-clock (compiler threads compete for its few
        # pinned cores), which would INFLATE measured efficiency — warm
        # first so the timed replay compares steady-state engines
        for w in range(int(os.environ.get("SCALE_WARM_REPLAYS", "1"))):
            wwh = tempfile.mkdtemp(prefix=f"scalew_{cores}_", dir=shm)
            try:
                CdcEngine(spark, wwh, n_buckets=64, mode=MODE).replay(
                    ev, num_batches=BATCHES, id_prefix=f"warm{w}",
                    seq_hi=n_events - 1,
                )
            finally:
                shutil.rmtree(wwh, ignore_errors=True)
        eng = CdcEngine(spark, wh, n_buckets=64, mode=MODE)
        t0 = time.perf_counter()
        eng.replay(ev, num_batches=BATCHES, id_prefix="scale", seq_hi=n_events - 1)
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    print(json.dumps({"cores": cores, "n_events": n, "sec": round(dt, 3),
                      "mode": MODE, "events_per_sec": round(n / dt, 1)}))


def run_child(cores: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "24g")
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    # hard-cap the child to exactly `cores` CPUs: a local[N] JVM otherwise
    # runs GC/JIT/IO threads on extra cores, inflating the low level and
    # deflating measured scaling efficiency
    cpu_list = ",".join(str(c) for c in range(cores))
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable,
         os.path.abspath(__file__), "--child", str(cores)],
        capture_output=True, text=True, check=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    import statistics

    lows, highs, rounds = [], [], []
    prev_description = None
    for i in range(TRIALS):  # interleaved: host drift hits both levels
        lo = run_child(N)
        hi = run_child(4 * N)
        print(json.dumps(lo), flush=True)
        print(json.dumps(hi), flush=True)
        lows.append(lo["events_per_sec"])
        highs.append(hi["events_per_sec"])
        rounds.append({"round": i, "low": lo, "high": hi})
    method = os.environ.get("SCALE_METHOD", "pinned_subprocess")
    prev_ceilings = []
    if os.environ.get("SCALE_APPEND") == "1":
        # accumulate rounds across sessions (same convention as
        # inline_scale.py): medians run over the UNION, degraded host
        # windows included — never replace earlier rounds with a
        # better-weather re-run
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH_scaling.json")) as f:
                prev = json.load(f)["methods"][method]
            lows = prev["low_evps"] + lows
            highs = prev["high_evps"] + highs
            rounds = prev["rounds"] + [
                {**r, "round": len(prev["rounds"]) + i}
                for i, r in enumerate(rounds)
            ]
            prev_ceilings = prev.get("host_ceiling_samples") or (
                [prev["host_ceiling_pure_cpu"]]
                if prev.get("host_ceiling_pure_cpu") else []
            )
            # a method's description may carry hand-written rationale
            # (e.g. the in-envelope N→4N argument) — appending rounds
            # must not regenerate it from the template
            prev_description = prev.get("description")
        except Exception:
            pass
    med_lo, med_hi = statistics.median(lows), statistics.median(highs)
    # pure-CPU process-pool ceiling for THIS N→4N pair (what a perfectly
    # parallel program achieves on this box; see inline_scale._host_ceiling)
    ceiling = None
    try:
        tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "host_ceiling.py")
        out = subprocess.run(
            [sys.executable, tool, str(N)], capture_output=True, text=True,
            timeout=300, check=True,
        ).stdout.strip().splitlines()[-1]
        ceiling = float(json.loads(out)["host_ceiling"])
    except Exception:
        pass
    section = {
        "description": (
            f"fresh taskset-pinned subprocess JVMs: local[{N}] pinned to "
            f"{N} CPUs vs local[{4 * N}] pinned to {4 * N} CPUs — pinning "
            "stops the low level's GC/JIT/netty threads from borrowing "
            "extra cores; one untimed warmup replay per child so JIT "
            "compilation doesn't penalize the small level inside the timed "
            "window; interleaved trials, appendable across sessions "
            "(medians over the union, degraded windows included); tmpfs "
            "warehouse+spill"
        ),
        "sf_dir": SF_DIR,
        "event_mult": MULT,
        "mode": MODE,
        "rounds": rounds,
        **({"description": prev_description} if prev_description else {}),
        "low_evps": lows,
        "high_evps": highs,
        "median_low_evps": round(med_lo, 1),
        "median_high_evps": round(med_hi, 1),
        "efficiency_median_per_level": round(med_hi / (4 * med_lo), 3),
    }
    # the ceiling is a property of the box; a pure-CPU probe in a degraded
    # window can only UNDER-measure it (there is nothing to inflate a
    # perfectly-parallel process pool), so across sessions keep the max
    samples = prev_ceilings + ([round(ceiling, 3)] if ceiling else [])
    section["host_ceiling_samples"] = samples
    section["host_ceiling_pure_cpu"] = max(samples) if samples else None
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_common import write_method

    headline = write_method(method, section)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
