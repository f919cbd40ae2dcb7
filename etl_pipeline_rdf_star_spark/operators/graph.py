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
    max_iterations: int = 20,
) -> DataFrame:
    """All (src, dst) pairs connected by a directed path. Exponential
    squaring: paths(2k) = paths(k) ⋈ paths(k), so a diameter-d graph
    converges in ⌈log₂ d⌉ rounds (the default covers diameter 2^20).

    Each round ends in an eager ``localCheckpoint`` — iterative
    DataFrames otherwise double their lineage every round until Catalyst
    chokes on plan strings alone (same fix as
    functions.dedup.connected_components); ``persist`` alone keeps the
    data but not the plan bounded. Raises on non-convergence instead of
    silently returning a truncated closure (review finding: the SPARQL
    property-path engine and this operator had diverged on exactly
    those two behaviors). Also the ALP kernel for SPARQL ``p+``/``p*``
    (queries/sparql.py)."""
    paths = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = paths.count()
    for _ in range(max_iterations):
        nxt = (
            paths.alias("a")
            .join(paths.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .unionByName(paths)
            .distinct()
            .localCheckpoint(eager=True)
        )
        m = nxt.count()
        if m == n:  # fixpoint
            return paths
        paths, n = nxt, m
    raise RuntimeError(
        f"transitive closure did not converge in {max_iterations} rounds "
        f"(diameter > 2^{max_iterations})"
    )


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


OWL = "http://www.w3.org/2002/07/owl#"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"

# cardinality predicate → display label, exactly the six the reference
# panel queries one-by-one (rdf-workbench.py:864-930 _query_cardinality)
_CARDINALITY_PREDS = [
    (OWL + "qualifiedCardinality", "exactly"),
    (OWL + "minQualifiedCardinality", "min"),
    (OWL + "maxQualifiedCardinality", "max"),
    (OWL + "cardinality", "exactly"),
    (OWL + "minCardinality", "min"),
    (OWL + "maxCardinality", "max"),
]


def class_restrictions(triples: DataFrame) -> DataFrame:
    """OWL restriction panel for ALL classes at once (the reference runs
    six SPARQL queries per class per request, rdf-workbench.py:864-930;
    here one declarative plan covers every class and Catalyst broadcasts
    the tiny predicate-filtered sides):

    ``cls rdfs:subClassOf ?r . ?r a owl:Restriction ; owl:onProperty ?p ;
    <card> ?v`` with optional ``owl:onClass`` / ``owl:onDataRange``.

    Returns (cls, property, cardinality, on_class, on_data_range)."""

    def by_pred(pred: str, value_alias: str) -> DataFrame:
        return triples.where(F.col("predicate") == pred).select(
            F.col("subject").alias("r"), F.col("object").alias(value_alias)
        )

    sub = triples.where(F.col("predicate") == RDFS_SUBCLASS).select(
        F.col("subject").alias("cls"), F.col("object").alias("r")
    )
    is_restriction = triples.where(
        (F.col("predicate") == RDF_TYPE) & (F.col("object") == OWL + "Restriction")
    ).select(F.col("subject").alias("r"))
    cards = None
    for pred, label in _CARDINALITY_PREDS:
        part = by_pred(pred, "card_value").withColumn("card_label", F.lit(label))
        cards = part if cards is None else cards.unionByName(part)
    return (
        sub.join(is_restriction, "r")
        .join(cards, "r")
        .join(by_pred(OWL + "onProperty", "property"), "r")
        .join(by_pred(OWL + "onClass", "on_class"), "r", "left")
        .join(by_pred(OWL + "onDataRange", "on_data_range"), "r", "left")
        .select(
            "cls",
            "property",
            F.concat_ws(" ", "card_label", "card_value").alias("cardinality"),
            "on_class",
            "on_data_range",
        )
    )


def disjoint_class_pairs(triples: DataFrame) -> DataFrame:
    """Unordered disjoint class pairs from BOTH owl:disjointWith edges and
    ``[ a owl:AllDisjointClasses ; owl:members (...) ]`` lists (the
    reference's disjointness section of the restrictions panel). RDF list
    chains are walked with the same exponential-squaring closure the
    subclass explorer uses — no driver-side loops."""
    direct = triples.where(F.col("predicate") == OWL + "disjointWith").select(
        F.col("subject").alias("x"), F.col("object").alias("y")
    )
    djc = triples.where(
        (F.col("predicate") == RDF_TYPE)
        & (F.col("object") == OWL + "AllDisjointClasses")
    ).select(F.col("subject").alias("d"))
    heads = djc.join(
        triples.where(F.col("predicate") == OWL + "members").select(
            F.col("subject").alias("d"), F.col("object").alias("node")
        ),
        "d",
    )
    rests = triples.where(F.col("predicate") == RDF_REST).select(
        F.col("subject").alias("src"), F.col("object").alias("dst")
    )
    reach = transitive_closure(rests)
    nodes = heads.unionByName(
        heads.join(reach, heads["node"] == reach["src"]).select(
            "d", F.col("dst").alias("node")
        )
    )
    firsts = triples.where(F.col("predicate") == RDF_FIRST).select(
        F.col("subject").alias("node"), F.col("object").alias("item")
    )
    items = nodes.join(firsts, "node").select("d", "item")
    listed = (
        items.alias("a")
        .join(items.alias("b"), "d")
        .where(F.col("a.item") < F.col("b.item"))
        .select(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
    )
    both = direct.unionByName(listed)
    return both.select(
        F.least("x", "y").alias("class_a"), F.greatest("x", "y").alias("class_b")
    ).distinct()


def property_characteristics(triples: DataFrame) -> DataFrame:
    """(property, characteristic) for the owl property-characteristic
    classes the reference panel reports (Functional, InverseFunctional,
    Transitive, Symmetric + the declaration types)."""
    kinds = [
        "FunctionalProperty",
        "InverseFunctionalProperty",
        "TransitiveProperty",
        "SymmetricProperty",
        "ObjectProperty",
        "DatatypeProperty",
        "AnnotationProperty",
    ]
    mapping = {OWL + k: k for k in kinds}
    kind_col = None
    for iri, name in mapping.items():
        branch = F.when(F.col("object") == iri, name)
        kind_col = branch if kind_col is None else kind_col.when(
            F.col("object") == iri, name
        )
    return (
        triples.where(
            (F.col("predicate") == RDF_TYPE)
            & (F.col("object").isin(list(mapping)))
        )
        .select(
            F.col("subject").alias("property"),
            kind_col.alias("characteristic"),
        )
        .distinct()
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
