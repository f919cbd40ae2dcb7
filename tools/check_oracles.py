"""Driver-mimic: run every corpus query on Spark AND its DuckDB oracle,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from etl_pipeline_rdf_star_spark.queries import QUERIES
    from etl_pipeline_rdf_star_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, entry in QUERIES.items():
        if only and name not in only:
            continue
        sdf = entry.fn(spark, sf_dir)
        s_rows = sdf.collect()
        s_cols = sdf.columns
        if entry.sql is None:
            print(f"{name:28s} rows-only: {len(s_rows)} rows")
            continue
        d = con.sql(entry.sql)
        d_cols = [c for c in d.columns]
        d_rows = d.fetchall()
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_rows = len(s_rows) == len(d_rows)
        # strict TYPE parity: the driver's normalization is stricter than
        # ours (round-1 lesson: HUGEINT/DECIMAL/DOUBLE render differently
        # even when values are equal) — require matching type families
        _FAM = {
            "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int",
            "TINYINT": "int", "UBIGINT": "int", "HUGEINT": "hugeint",
            "DOUBLE": "float", "FLOAT": "float", "VARCHAR": "str",
            "BOOLEAN": "bool", "DATE": "date", "TIMESTAMP": "ts",
            "TIMESTAMP_NS": "ts",
        }
        _SFAM = {
            "bigint": "int", "int": "int", "smallint": "int",
            "tinyint": "int", "double": "float", "float": "float",
            "string": "str", "boolean": "bool", "date": "date",
            "timestamp": "ts", "timestamp_ntz": "ts",
        }
        s_types = dict(sdf.dtypes)
        bad_types = []
        for c, t in zip(d_cols, [str(t) for t in d.types]):
            fam_d = _FAM.get(t.split("(")[0], t)
            fam_s = _SFAM.get(s_types.get(c, "?"), s_types.get(c, "?"))
            if c in s_types and fam_d != fam_s:
                bad_types.append(f"{c}: duck={t} spark={s_types[c]}")
        ok_types = not bad_types
        ok_hash = frame_hash(
            [[r[c] for c in s_cols] for r in s_rows], s_cols
        ) == frame_hash(d_rows, d_cols)
        status = "OK" if (ok_cols and ok_rows and ok_hash and ok_types) else "FAIL"
        print(
            f"{name:28s} {status}  spark={len(s_rows)} duck={len(d_rows)} "
            f"cols={'=' if ok_cols else f'{s_cols} vs {d_cols}'} "
            f"hash={'=' if ok_hash else '!'} "
            f"types={'=' if ok_types else bad_types}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_cols and ok_rows:
                # show a few differing rows for debugging
                ss = {tuple(norm_cell(r[c]) for c in sorted(s_cols)) for r in s_rows}
                order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                dd = {tuple(norm_cell(r[i]) for i in order) for r in d_rows}
                print("  spark-only:", list(ss - dd)[:2])
                print("  duck-only :", list(dd - ss)[:2])
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
