"""Scale-proof correctness at sf1 (round-5 verdict ask #5).

Synthesizes a deterministic sf1-shaped directory (10x sf0.1 == 100x the
driver's sf0.01 correctness gate) via data/sf_scale.py, then runs the
bench HEADLINE queries through BOTH the Spark engine and their DuckDB
oracle SQL over the SAME parquet files, comparing row counts, column
sets, and sorted value hashes exactly like tools/check_oracles.py.
Writes CHECK_sf1.json {query: {rows, wall_spark_sec, wall_duck_sec,
hash_match, ...}} at the repo root.

Usage: python tools/check_sf1.py [out_json] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from check_oracles import TABLES, frame_hash  # noqa: E402


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "CHECK_sf1.json"
    sf1_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rdfstar_sf1"

    from bench import HEADLINE  # repo-root bench.py

    from etl_pipeline_rdf_star_spark.data.sf_scale import scale_dir
    from etl_pipeline_rdf_star_spark.queries import QUERIES
    from etl_pipeline_rdf_star_spark.session import get_spark

    spark = get_spark("check-sf1", cores=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    scale_dir(spark, "/root/testdata/sf0.1", sf1_dir, factor=10)
    build_sec = round(time.perf_counter() - t0, 1)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf1_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")

    results: dict[str, dict] = {}
    failures = []
    for name in HEADLINE:
        entry = QUERIES[name]
        t0 = time.perf_counter()
        sdf = entry.fn(spark, sf1_dir)
        s_rows = sdf.collect()
        wall_s = round(time.perf_counter() - t0, 2)
        s_cols = sdf.columns
        if entry.sql is None:
            results[name] = {"rows": len(s_rows), "wall_spark_sec": wall_s,
                             "oracle": "rows-only"}
            continue
        t0 = time.perf_counter()
        d = con.sql(entry.sql)
        d_cols = list(d.columns)
        d_rows = d.fetchall()
        wall_d = round(time.perf_counter() - t0, 2)
        ok = (
            sorted(s_cols) == sorted(d_cols)
            and len(s_rows) == len(d_rows)
            and frame_hash([[r[c] for c in s_cols] for r in s_rows], s_cols)
            == frame_hash(d_rows, d_cols)
        )
        results[name] = {
            "rows": len(s_rows),
            "oracle_rows": len(d_rows),
            "wall_spark_sec": wall_s,
            "wall_duck_sec": wall_d,
            "hash_match": ok,
        }
        print(f"{name:28s} {'OK' if ok else 'FAIL'} rows={len(s_rows)} "
              f"spark={wall_s}s duck={wall_d}s", flush=True)
        if not ok:
            failures.append(name)

    doc = {
        "sf": 1,
        "sf1_dir": sf1_dir,
        "factor_vs_driver_gate": 100,
        "build_sec": build_sec,
        "queries": results,
        "failures": failures,
    }
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\nwrote {out_json}; {len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
