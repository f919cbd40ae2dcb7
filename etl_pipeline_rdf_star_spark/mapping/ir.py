"""Intermediate representation of a YARRRML(-star) mapping document.

Mirrors the semantic model of the reference parser (yarrrml_parser.py:25-72
``Source``/``SubjectMapping``/``PredicateObject``/``TriplesMap`` dataclasses)
but is a fresh design: the IR here is the *compiler input*, consumed by
``compiler.py`` to produce Spark ``Column`` expressions, not by a row loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class SourceSpec:
    """One tabular source. Reference: yarrrml_parser.py (source shorthand
    ``['file.csv~csv']`` and named root-level sources with access /
    referenceFormulation / iterator / delimiter)."""

    access: str
    fmt: str = "csv"  # csv | tsv | json | xml | parquet | jdbc | http | sparql
    iterator: str | None = None  # JSONPath / XPath for nested sources
    delimiter: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    name: str | None = None


@dataclass(frozen=True)
class QuotedJoin:
    """RDF-star subject ``function: join(quoted=TM, equal(str1=$(a), str2=$(b)))``.

    Reference: yarrrml_parser.py:253-273 (special-cased join parse) and the
    probe loop rdf_star_etl_yarrrml.py:451-530. In Spark this compiles to an
    equi-join between the annotation source and the quoted triples map's
    output (SURVEY.md J1).
    """

    quoted_map: str  # name of the triples map whose triples get annotated
    child_key: str  # column in the annotation (outer) source
    parent_key: str  # column in the quoted (inner) source


@dataclass(frozen=True)
class ObjectSpec:
    """One object of a predicate-object: literal/IRI/mapping-ref."""

    value: str | None = None  # template, e.g. "$(title)" or "ex:org/$(owner)"
    kind: str = "literal"  # literal | iri | blank
    datatype: str | None = None  # fixed IRI or a $(col) reference template
    language: str | None = None  # fixed tag or a $(col) reference template
    mapping_ref: str | None = None  # o.mapping → parent triples map (J3)
    join_condition: tuple[str, str] | None = None  # (child_col, parent_col)
    quoted_ref: str | None = None  # o.quoted → quoted triples map (RDF-star
    # object position, YARRRML spec ex. 110/114); non-asserted when flagged
    quoted_non_asserted: bool = False
    function: str | None = None  # YARRRML function name (executed — §2.8)
    fn_args: tuple[str, ...] = ()  # positional arg templates


@dataclass(frozen=True)
class ConditionSpec:
    """PO/mapping-level condition. The reference parses but never executes
    these (yarrrml_parser.py:608-612); we compile and APPLY them (P8)."""

    function: str  # equal | notEqual | contains | startsWith | ...
    parameters: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class PredicateObjectSpec:
    predicates: tuple[str, ...]
    objects: tuple[ObjectSpec, ...]
    graphs: tuple[str, ...] = ()
    condition: ConditionSpec | None = None
    inverse_predicates: tuple[str, ...] = ()


@dataclass(frozen=True)
class SubjectSpec:
    templates: tuple[str, ...] = ()  # one or more subject IRI templates
    quoted_join: QuotedJoin | None = None  # RDF-star annotation subject


@dataclass(frozen=True)
class TriplesMapIR:
    name: str
    sources: tuple[SourceSpec, ...]
    subject: SubjectSpec
    predicate_objects: tuple[PredicateObjectSpec, ...]
    graphs: tuple[str, ...] = ()
    condition: ConditionSpec | None = None


@dataclass(frozen=True)
class MappingDocumentIR:
    prefixes: dict[str, str]
    base_iri: str | None
    triples_maps: dict[str, TriplesMapIR]
    external: dict[str, str] = field(default_factory=dict)
    authors: tuple[Any, ...] = ()
    sources: dict[str, SourceSpec] = field(default_factory=dict)
    targets: dict[str, dict[str, str]] = field(default_factory=dict)

    def asserted_maps(self) -> list[TriplesMapIR]:
        return [
            tm for tm in self.triples_maps.values() if tm.subject.quoted_join is None
        ]

    def annotation_maps(self) -> list[TriplesMapIR]:
        return [
            tm
            for tm in self.triples_maps.values()
            if tm.subject.quoted_join is not None
        ]
