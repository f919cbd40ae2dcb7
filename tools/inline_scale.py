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

SCALE_APPEND=1 merges this session's rounds with the rounds already
recorded for the same method+config in BENCH_scaling.json and recomputes
the per-level medians over the UNION. A shared box has weather — single
sessions land entirely inside one good or bad window; accumulating
interleaved rounds across sessions hours apart is the robust version of
the same median statistic (all rounds stay recorded, nothing is
discarded or cherry-picked).

SCALE_METHOD names the BENCH_scaling.json section. Different input sizes
are DIFFERENT methods (e.g. inline_warm_jvm_sustained for the 3.84M-event
regime): efficiency is input-size dependent on one box — a larger input
lifts the 8-way level out of its fixed-cost penalty while the 32-way
level stays capped by the host's shared memory bandwidth — so mixing
sizes in one rounds list would corrupt the median. Both regimes stay
recorded side by side.
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
# SCALE_WEAK=1: weak scaling (Gustafson) — the high level processes 4× the
# events so per-core work density matches; efficiency = (hi/4)/lo on
# per-event rate. The strong-scaling run (same input both levels) stays the
# headline; weak scaling shows fixed per-batch costs amortize identically
# as the cluster grows WITH the data — the actual 10^10-event question.
WEAK = os.environ.get("SCALE_WEAK", "0") == "1"


def _host_ceiling(n: int) -> float | None:
    """Pure-CPU process-pool scaling ceiling n → 4n on THIS box (no Spark,
    no IO) — measured in a CLEAN subprocess (forking the live-JVM Spark
    driver process hangs). A perfectly parallel program cannot beat this."""
    import subprocess

    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "host_ceiling.py")
    try:
        out = subprocess.run(
            [sys.executable, tool, str(n)],
            capture_output=True, text=True, timeout=300, check=True,
        ).stdout.strip().splitlines()[-1]
        return float(json.loads(out)["host_ceiling"])
    except Exception:
        return None


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

    # one cached event log per parallelism level, reused across rounds;
    # weak scaling gives the high level 4× the events (same work density)
    n_events_for = {N: ne, hi_cores: ne * 4 if WEAK else ne}
    cached: dict[int, object] = {}
    for par in (N, hi_cores):
        ne_p = n_events_for[par]
        ev = (
            synth.cdc_events(
                spark,
                SF_DIR,
                n_files=nf * (ne_p // ne),
                n_events=ne_p,
                content_repeat=REPEAT,
            )
            .repartition(par)
            .persist()
        )
        ev.count()
        cached[par] = ev

    def run(par: int) -> dict:
        spark.conf.set("spark.sql.shuffle.partitions", str(par))
        ev = cached[par]
        ne_p = n_events_for[par]
        wh = tempfile.mkdtemp(prefix=f"is{par}_", dir="/dev/shm")
        try:
            # merge-on-read: the sustained-ingest path the north rule
            # benchmarks (single shuffle + write per micro-batch)
            eng = CdcEngine(spark, wh, n_buckets=par * 2, mode="mor")
            t0 = time.perf_counter()
            eng.replay(ev, num_batches=2, id_prefix="s", seq_hi=ne_p - 1)
            dt = time.perf_counter() - t0
        finally:
            shutil.rmtree(wh, ignore_errors=True)
        return {"par": par, "n_events": ne_p, "sec": round(dt, 3),
                "events_per_sec": round(ne_p / dt, 1)}

    # warm both paths (codegen compile, parquet reader init, heap sizing —
    # measured highs kept improving through ~2 warm cycles: 18.3→10.6→6.9s)
    for _ in range(int(os.environ.get("SCALE_WARMUPS", "2"))):
        run(N)
        run(hi_cores)

    rounds = []
    name = os.environ.get(
        "SCALE_METHOD", "inline_warm_jvm_weak" if WEAK else "inline_warm_jvm"
    )
    if os.environ.get("SCALE_APPEND", "0") == "1":
        # start from prior rounds of the SAME method+config (see module
        # docstring: cross-session accumulation, same median statistic)
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from scaling_common import PATH

            prev = json.load(open(PATH))["methods"].get(name, {})
            if (
                prev.get("n_events") == ne
                and prev.get("content_repeat") == REPEAT
            ):
                rounds = list(prev.get("rounds", []))
                print(f"appending to {len(rounds)} prior rounds", flush=True)
            elif prev.get("rounds"):
                # refuse to silently DESTROY recorded rounds of a
                # different config (this exact mistake once wiped a
                # 4-round weak section) — pick a new SCALE_METHOD name
                raise SystemExit(
                    f"SCALE_APPEND=1 but section {name!r} holds "
                    f"{len(prev['rounds'])} rounds at n_events="
                    f"{prev.get('n_events')}/repeat="
                    f"{prev.get('content_repeat')} (this run: {ne}/"
                    f"{REPEAT}); overwriting would discard them. Use a "
                    "different SCALE_METHOD for a new config."
                )
        except Exception:  # SystemExit passes through (BaseException)
            pass
    for i in range(ROUNDS):
        lo = run(N)
        hi = run(hi_cores)
        eff = hi["events_per_sec"] / (4 * lo["events_per_sec"])
        rounds.append(
            {"round": len(rounds), "low": lo, "high": hi,
             "efficiency": round(eff, 3)}
        )
        print(json.dumps(rounds[-1]), flush=True)
    for ev in cached.values():
        ev.unpersist()

    lows = [r["low"]["events_per_sec"] for r in rounds]
    highs = [r["high"]["events_per_sec"] for r in rounds]
    # robust statistic: per-LEVEL medians, not adjacent-pair ratios —
    # pairing doubles the noise of a shared host (ADVICE r1)
    med_lo, med_hi = statistics.median(lows), statistics.median(highs)
    eff_median = med_hi / (4 * med_lo)
    spark.stop()  # free the cores before the pure-CPU ceiling measurement
    ceiling = _host_ceiling(N)
    report = {
        "description": (
            f"single warm local[{hi_cores}] JVM; parallelism set by partition "
            f"count ({N} vs {hi_cores}) with matching shuffle.partitions; "
            "interleaved rounds over per-level cached inputs; tmpfs "
            "warehouse+spill (per-node disk bandwidth scales with executors "
            "on a real cluster)"
        ),
        "sf_dir": SF_DIR,
        "n_events": ne,
        "weak_scaling": WEAK,
        "content_repeat": REPEAT,
        "rounds": rounds,
        "low_evps": lows,
        "high_evps": highs,
        "median_low_evps": round(med_lo, 1),
        "median_high_evps": round(med_hi, 1),
        "efficiency_median_per_level": round(eff_median, 3),
        "host_ceiling_pure_cpu": round(ceiling, 3) if ceiling else None,
    }
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_common import write_method

    headline = write_method(name, report)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
