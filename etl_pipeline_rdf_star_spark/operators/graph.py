"""Graph operators over the triples relation — the class-explorer analogue
(reference rdf-workbench.py:720-1186; transitive closure :1087-1112).

The reference walks ``rdfs:subClassOf`` edges in a Python loop against the
store. Here closure is iterative DataFrame self-joins with a fixpoint test —
each iteration doubles the reachable path length (exponential squaring), so
depth-d closure needs ⌈log2 d⌉ + 1 joins, not d.

Scale notes: each iteration is one equi-join + distinct (two shuffles);
`checkpoint`/`persist` between iterations truncates the exploding lineage.
For 100 TB graphs you'd bound iterations and partition edges by src.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 12,
) -> DataFrame:
    """All (src, dst) pairs connected by a directed path. Exponential
    squaring: paths(2k) = paths(k) ⋈ paths(k); stops at fixpoint."""
    paths = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    paths = paths.persist()
    n = paths.count()
    for _ in range(max_iterations):
        hop = (
            paths.alias("a")
            .join(paths.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        new_paths = paths.unionByName(hop).distinct().persist()
        m = new_paths.count()
        paths.unpersist()
        paths = new_paths
        if m == n:  # fixpoint
            break
        n = m
    return paths


def neighbors(
    triples: DataFrame, subject_iri: str, direction: str = "both"
) -> DataFrame:
    """One-hop neighborhood of a node (class-explorer 'neighbors' —
    rdf-workbench.py:720-777's 4-way union collapses to a filter + union)."""
    out = triples.where(F.col("subject") == subject_iri).select(
        F.lit("out").alias("direction"), "predicate", F.col("object").alias("node")
    )
    inc = triples.where(F.col("object") == subject_iri).select(
        F.lit("in").alias("direction"), "predicate", F.col("subject").alias("node")
    )
    if direction == "out":
        return out
    if direction == "in":
        return inc
    return out.unionByName(inc)


def subclass_closure(
    triples: DataFrame,
    subclass_pred: str = "http://www.w3.org/2000/01/rdf-schema#subClassOf",
) -> DataFrame:
    """Transitive subclass closure from the triples relation (reference
    expands it into a VALUES list, rdf-workbench.py:1127-1136)."""
    edges = triples.where(F.col("predicate") == subclass_pred).select(
        F.col("subject").alias("src"), F.col("object").alias("dst")
    )
    return transitive_closure(edges).select(
        F.col("src").alias("subclass"), F.col("dst").alias("superclass")
    )
