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

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Uniform deterministic salt derived from the row (no rand() — replay
    must be reproducible). Uses a cheap hash of all columns."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n_salts)
    )


_REFOLDS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,  # also correct for count partials (counts re-fold by sum)
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column | tuple[Column, str | Callable[[str], Column]]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation with an EXPLICIT re-fold per column.

    ``aggs`` maps output-column name → either

    * ``(partial_expr, refold)`` where ``refold`` is ``"sum" | "min" | "max"``
      or any callable ``col_name -> Column`` for exotic merges, or
    * a bare partial ``Column`` — re-folded with ``sum``, which is correct
      ONLY for ``count``/``sum`` partials. ``min``/``max`` partials must
      pass the tuple form; non-algebraic aggregates (``countDistinct``,
      ``avg``) are NOT salted-safe as a single expression — decompose them
      (distinct-project first / sum+count) before salting.

    Example::

        salted_agg(ev, ["repo"],
                   {"n": F.count("*"), "mx": (F.max("seq"), "max")})

    (The round-1 implementation inferred the re-fold by string-sniffing the
    private ``_jc`` JVM expression — wrong for countDistinct and unavailable
    under Spark Connect; the explicit map replaces it.)
    """
    parts: dict[str, Column] = {}
    refolds: dict[str, Callable[[str], Column]] = {}
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            expr, rf = spec
            refolds[name] = _REFOLDS[rf] if isinstance(rf, str) else rf
        else:
            expr, refolds[name] = spec, F.sum
        parts[name] = expr

    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(f"__p_{name}") for name, c in parts.items()]
    )
    return partial.groupBy(*keys).agg(
        *[refolds[name](f"__p_{name}").alias(name) for name in parts]
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
