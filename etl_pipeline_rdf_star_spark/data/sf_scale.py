"""Deterministic scale-up of a testdata directory (round-5 verdict ask
#5: scale-proof correctness at sf1).

The driver's correctness gate runs at sf0.01; this module synthesizes an
sf1-shaped directory (~100x the driver's row counts) so the SAME
Spark-vs-DuckDB oracle comparison can run at a scale where a plan bug —
a non-deterministic tie-break, an overflow, a partial-aggregation
mistake — would actually surface. No external data: each table is the
source table unioned with key-shifted replicas (keys offset by
replica * (max_key + 1), foreign keys shifted consistently so joins
stay referentially intact), written once to parquet; Spark queries and
DuckDB oracles then read the SAME files, so no derivation needs
mirroring.

Fixed dimensions (region, nation) are copied 1x — replicating them
would break the bounded-dimension property real star schemas have.
Embeddings get a per-replica deterministic epsilon on one coordinate so
nearest-neighbor top-k stays tie-free at every scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# (table, key column) pairs whose shift must be shared by every foreign
# reference: shift = replica * (max(key in SOURCE table) + 1)
_PK = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}

# column -> owning table (for foreign-key shifts)
_FK = {
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
}


def _max_plus_one(spark: SparkSession, src: str, table: str, col: str) -> int:
    return int(
        spark.read.parquet(f"{src}/{table}.parquet")
        .agg(F.max(col))
        .collect()[0][0]
    ) + 1


def _replicate(
    df: DataFrame, factor: int, shifts: dict[str, int], table: str
) -> DataFrame:
    parts = []
    for r in range(factor):
        p = df
        for c in df.columns:
            owner = table if c == _PK.get(table) else _FK.get(c)
            if owner is not None:
                p = p.withColumn(c, F.col(c) + F.lit(r * shifts[owner]))
        if table == "embeddings" and r > 0:
            # break exact-duplicate vectors across replicas: identical
            # copies would tie every cosine top-k at the boundary and the
            # comparison would test tie-break luck, not the operator
            p = p.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (F.element_at("embedding", 1) + r * 1e-3).cast(
                            "float"
                        )
                    ),
                    F.slice(
                        "embedding", 2, F.size("embedding") - F.lit(1)
                    ),
                ),
            )
        if table == "events" and r > 0:
            # keep user sessions replica-local (a shared user_id would
            # interleave sessions across replicas — a different dataset,
            # not a bigger one) and keep ts unique per event
            p = p.withColumn("user_id", F.col("user_id") + F.lit(r * 1_000_000))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_dir(
    spark: SparkSession, src: str, out: str, factor: int = 10
) -> str:
    """Write a factor-x key-shifted replication of ``src`` into ``out``.
    Idempotent: a completed build (marker file) is reused."""
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    shifts = {
        t: _max_plus_one(spark, src, t, k) for t, k in _PK.items()
    }
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t not in ("region", "nation"):  # fixed dims stay 1x
            df = _replicate(df, factor, shifts, t)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    with open(marker, "w") as f:
        f.write(f"src={src} factor={factor}\n")
    return out
