"""Explicit skew handling for hot keys (north rule: "salted, key-partitioned
upsert stage with explicit skew handling for hot repos at 10^10-event scale").

Three layers of defense, outermost first:

1. **Full-key bucketing** (storage/lake.py): the sink hashes (repo, path),
   never repo alone — a hot repo's files spread uniformly over buckets.
2. **AQE skew-join splitting** (session.py: ``spark.sql.adaptive.skewJoin``)
   for joins whose build side AQE can re-plan at runtime.
3. **Salting** (this module) for the shapes AQE cannot fix: single-key
   aggregations and windows where one key (repo_0 ≈ 21% of rows here,
   a monorepo in the wild) lands on one reducer.

``salted_agg`` implements the classic two-stage aggregation:
key → (key, salt) partial agg (fans the hot key over S reducers) → final agg
by key. Works for any algebraic aggregate (count/sum/min/max); AVG must be
decomposed to sum+count by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Uniform deterministic salt derived from the row (no rand() — replay
    must be reproducible). Uses a cheap hash of all columns."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n_salts)
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output-column name → *partial* aggregate expression (must
    be re-aggregable: count→sum, sum→sum, min→min, max→max).

    Example::

        salted_agg(ev, ["repo"], {"n": F.count("*"), "mx": F.max("seq")})
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(f"__p_{name}") for name, c in aggs.items()]
    )
    refold = {
        "count": F.sum,  # counts re-fold by summing
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }

    def final_col(name: str, partial_expr: Column) -> Column:
        # infer refold from the partial expression's name; callers needing
        # exotic re-folds pass them via salted_agg_custom
        expr_str = partial_expr._jc.toString().lower()
        for k, fn in refold.items():
            if expr_str.startswith(k):
                return fn(f"__p_{name}").alias(name)
        return F.sum(f"__p_{name}").alias(name)

    return partial.groupBy(*keys).agg(
        *[final_col(name, c) for name, c in aggs.items()]
    )


def salted_topk_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe top-k per key: local top-k within (key, salt) first, then
    global top-k per key over ≤ S·k survivors — the hot key's window work
    spreads over S reducers instead of one."""
    from pyspark.sql import Window

    salted = with_salt(df, n_salts)
    w1 = Window.partitionBy(key, "_salt").orderBy(F.col(order_col).desc())
    local = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        local.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
