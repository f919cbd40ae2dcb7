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


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def class_properties(triples: DataFrame) -> DataFrame:
    """Per class: which predicates its instances use and how widely —
    the class-explorer 'properties of class' panel
    (rdf-workbench.py:779-860). One self-join on subject + hash agg."""
    types = triples.where(F.col("predicate") == RDF_TYPE).select(
        "subject", F.col("object").alias("cls")
    )
    return (
        types.join(triples, "subject")
        .groupBy("cls", "predicate")
        .agg(
            F.countDistinct("subject").alias("n_subjects"),
            F.count("*").alias("n_uses"),
        )
    )


def class_individuals(
    triples: DataFrame,
    class_iri: str,
    label_predicate: str = "http://purl.org/dc/terms/identifier",
    limit: int = 20,
) -> DataFrame:
    """Instances of a class with their label value, first ``limit`` by IRI —
    the 'individuals of class' panel (rdf-workbench.py:862-930)."""
    inst = triples.where(
        (F.col("predicate") == RDF_TYPE) & (F.col("object") == class_iri)
    ).select("subject")
    labels = triples.where(F.col("predicate") == label_predicate).select(
        "subject", F.col("object").alias("label")
    )
    return (
        inst.join(labels, "subject", "left")
        .orderBy("subject")
        .limit(limit)
    )


def node_neighbor_union(
    triples: DataFrame,
    annotations: DataFrame | None,
    focus: DataFrame,
) -> DataFrame:
    """The explorer's multi-way neighbor union for one focus node
    (rdf-workbench.py:720-777): outgoing edges ∪ incoming edges ∪ RDF-star
    annotation edges on the node's quoted facts. ``focus`` is a 1-row
    DataFrame with column ``focus`` (broadcast), so the node can be
    computed lazily (e.g. min subject) without an eager collect."""
    out = triples.select(
        F.lit("out").alias("direction"),
        "subject",
        "predicate",
        F.col("object").alias("node"),
    )
    inc = triples.select(
        F.lit("in").alias("direction"),
        F.col("object").alias("subject"),
        "predicate",
        F.col("subject").alias("node"),
    )
    parts = [out, inc]
    if annotations is not None:
        parts.append(
            annotations.select(
                F.lit("ann").alias("direction"),
                F.col("quoted.s").alias("subject"),
                "predicate",
                F.col("object").alias("node"),
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return (
        union.join(F.broadcast(focus), union["subject"] == focus["focus"])
        .select("direction", "predicate", "node")
    )


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
