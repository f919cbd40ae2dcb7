"""Compile YARRRML IR to Spark ``Column`` expressions.

This replaces the reference's per-row interpretation loop
(rdf_star_etl_yarrrml.py:86-103 vectorized templates, :545-558 single-row,
:324-447 pass-1 emission, :451-530 pass-2 annotation probe) with one-time
compilation to Catalyst expressions — whole-stage-codegen'd, columnar,
distributed. No Python executes per row.

Key correspondences (SURVEY.md §2.2):
- P1 template instantiation  → ``F.concat`` of literal/sanitized-ref segments
- P2 URI sanitization        → ``F.regexp_replace(c, "[^\\w\\-.]", "_")``
                               with empty→"unknown" (reference
                               rdf_star_etl_yarrrml.py:45-58)
- P3 prefix expansion        → done here at compile time (constant folding)
- P4 null/blank-row filter   → ``WHERE`` on the subject key columns
- P5 IRI passthrough         → ``F.when(startswith http)`` per
                               rdf_star_etl_yarrrml.py:361-374
- P8 conditions              → compiled boolean Columns (executed, unlike
                               the reference which only parses them)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from .ir import ConditionSpec, MappingDocumentIR, ObjectSpec

TEMPLATE_REF_RE = re.compile(r"\$\(([^)]+)\)")
_SANITIZE_PATTERN = r"[^\w\-.]"  # mirrors reference URI_SANITIZE_PATTERN

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"


def expand_prefix(term: str, prefixes: dict[str, str], base: str | None = None) -> str:
    """Expand ``dcat:theme`` → full IRI at compile time (reference lru_cache
    runtime expansion rdf_star_etl_yarrrml.py:61-74 — obsolete under Spark:
    prefixes are literals, so this is constant folding by hand)."""
    if term == "a":
        return RDF_TYPE
    if term.startswith(("http://", "https://", "urn:", "_:")):
        return term
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in prefixes:
            return prefixes[pfx] + local
    if base:
        return base + term
    return term


def template_refs(template: str) -> list[str]:
    """Column references ``$(col)`` in a template (mapping validation;
    reference get_required_columns_for_source yarrrml_parser.py:512-532 —
    Catalyst prunes columns automatically, we keep this for validation)."""
    return TEMPLATE_REF_RE.findall(template)


def sanitize_for_iri(col: Column) -> Column:
    """Reference sanitize_uri_component (rdf_star_etl_yarrrml.py:45-58):
    non-``[\\w\\-.]`` → ``_``; null/empty → ``"unknown"``."""
    cleaned = F.regexp_replace(col.cast("string"), _SANITIZE_PATTERN, "_")
    return F.coalesce(F.nullif(cleaned, F.lit("")), F.lit("unknown"))


def template_column(
    template: str,
    prefixes: dict[str, str],
    base: str | None = None,
    *,
    sanitize: bool = True,
) -> Column:
    """Compile an IRI/literal template to a single ``concat`` Column.

    ``ex:dataset/$(dataset_id)`` →
    ``concat(lit("http://example.org/dataset/"), sanitize(col("dataset_id")))``
    """
    expanded = _expand_template_prefix(template, prefixes, base)
    parts: list[Column] = []
    pos = 0
    for m in TEMPLATE_REF_RE.finditer(expanded):
        if m.start() > pos:
            parts.append(F.lit(expanded[pos : m.start()]))
        ref = F.col(m.group(1))
        parts.append(sanitize_for_iri(ref) if sanitize else ref.cast("string"))
        pos = m.end()
    if pos < len(expanded):
        parts.append(F.lit(expanded[pos:]))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)


def _expand_template_prefix(
    template: str, prefixes: dict[str, str], base: str | None
) -> str:
    """Expand a leading prefix in a template (``ex:dataset/$(id)``)."""
    if template.startswith("$(") or template.startswith(("http://", "https://")):
        return template
    m = re.match(r"^([A-Za-z][\w-]*):(.*)$", template)
    if m and m.group(1) in prefixes:
        return prefixes[m.group(1)] + m.group(2)
    return template


def object_value_column(
    obj: ObjectSpec, prefixes: dict[str, str], base: str | None
) -> Column:
    """Compile an object spec's value.

    IRI objects get the passthrough rule (P5, rdf_star_etl_yarrrml.py:361-374):
    if the single referenced column already holds an absolute IRI, use it
    verbatim; otherwise instantiate the template with sanitization.

    Function objects (``function: ex:toLowerCase(input=$(x))``) compile the
    registered implementation over their argument templates — executed for
    real, unlike the reference (yarrrml_parser.py:577-606 parse-only).
    """
    if obj.function is not None:
        from ..functions.registry import resolve_function

        impl = resolve_function(obj.function)
        args = [
            template_column(a, prefixes, base, sanitize=False) for a in obj.fn_args
        ]
        return impl(*args)
    assert obj.value is not None
    if obj.kind == "iri":
        minted = template_column(obj.value, prefixes, base, sanitize=True)
        only_ref = re.fullmatch(r"\$\(([^)]+)\)", obj.value.strip())
        if only_ref:
            raw = F.col(only_ref.group(1)).cast("string")
            return F.when(raw.startswith("http"), raw).otherwise(minted)
        refs = template_refs(obj.value)
        if refs:
            raw0 = F.col(refs[0]).cast("string")
            return F.when(raw0.startswith("http"), raw0).otherwise(minted)
        return minted
    # literal: raw value, no sanitization
    return template_column(obj.value, prefixes, base, sanitize=False)


def datatype_column(
    obj: ObjectSpec, prefixes: dict[str, str], base: str | None
) -> Column:
    """Datatype IRI column: fixed (compile-time expanded) or dynamic
    (``datatype: $(valueType)`` — reference test
    test_yarrrml_spec_comprehensive.py:773-799)."""
    if obj.datatype is None:
        return F.lit(None).cast("string")
    if TEMPLATE_REF_RE.search(obj.datatype):
        return template_column(obj.datatype, prefixes, base, sanitize=False)
    return F.lit(expand_prefix(obj.datatype, prefixes, base))


def language_column(obj: ObjectSpec) -> Column:
    if obj.language is None:
        return F.lit(None).cast("string")
    if TEMPLATE_REF_RE.search(obj.language):
        parts = []
        pos = 0
        for m in TEMPLATE_REF_RE.finditer(obj.language):
            if m.start() > pos:
                parts.append(F.lit(obj.language[pos : m.start()]))
            parts.append(F.col(m.group(1)).cast("string"))
            pos = m.end()
        if pos < len(obj.language):
            parts.append(F.lit(obj.language[pos:]))
        return F.concat(*parts) if len(parts) > 1 else parts[0]
    return F.lit(obj.language)


def compile_condition(
    cond: ConditionSpec, prefixes: dict[str, str], base: str | None
) -> Column:
    """Compile a mapping/PO condition to a boolean Column (P8 — the
    reference parses conditions, yarrrml_parser.py:608-612, but never
    evaluates them; we execute them for real)."""

    def operand(text: str) -> Column:
        if TEMPLATE_REF_RE.search(text):
            return template_column(text, prefixes, base, sanitize=False)
        return F.lit(text)

    params = [v for k, v in cond.parameters.items()]
    a = operand(params[0]) if params else F.lit(None)
    b = operand(params[1]) if len(params) > 1 else F.lit(None)
    fn = cond.function.lower()
    if fn in {"equal", "equals", "eq"}:
        return a == b
    if fn in {"notequal", "not_equal", "neq"}:
        return a != b
    if fn == "contains":
        return a.contains(b)
    if fn in {"startswith", "starts_with"}:
        return a.startswith(b)
    if fn in {"endswith", "ends_with"}:
        return a.endswith(b)
    if fn in {"isnull", "is_null"}:
        return a.isNull()
    if fn in {"isnotnull", "is_not_null", "bound"}:
        return a.isNotNull()
    if fn in {"greaterthan", "gt"}:
        return a > b
    if fn in {"lessthan", "lt"}:
        return a < b
    raise ValueError(f"unsupported condition function: {cond.function}")


def subject_not_blank_filter(template: str) -> Column | None:
    """P4 null/blank-row filter (reference rdf_star_etl_engine.py:267-269):
    drop rows whose subject key columns are null/blank."""
    refs = template_refs(template)
    if not refs:
        return None
    pred: Column | None = None
    for r in refs:
        c = F.col(r)
        this = c.isNotNull() & (F.trim(c.cast("string")) != "")
        pred = this if pred is None else (pred & this)
    return pred


def required_columns(ir: MappingDocumentIR, tm_name: str) -> set[str]:
    """All source columns a triples map references (P6 — reference
    get_required_columns_for_source, yarrrml_parser.py:512-532). Catalyst
    prunes scans automatically; this exists for compile-time validation."""
    tm = ir.triples_maps[tm_name]
    refs: set[str] = set()
    for t in tm.subject.templates:
        refs.update(template_refs(t))
    if tm.subject.quoted_join:
        refs.add(tm.subject.quoted_join.child_key)
    for po in tm.predicate_objects:
        for obj in po.objects:
            for t in (obj.value, obj.datatype, obj.language):
                if t:
                    refs.update(template_refs(t))
            for a in obj.fn_args:
                refs.update(template_refs(a))
            if obj.join_condition:
                refs.add(obj.join_condition[0])
    if tm.condition:
        for v in tm.condition.parameters.values():
            refs.update(template_refs(v))
    for po in tm.predicate_objects:
        if po.condition:
            for v in po.condition.parameters.values():
                refs.update(template_refs(v))
    return refs


def validate_mapping_against_schema(
    ir: MappingDocumentIR, source_columns: dict[str, list[str]]
) -> list[str]:
    """Compile-time check: every ``$(col)`` reference must exist in its
    source's schema. Returns human-readable problem strings (empty=valid)."""
    problems = []
    for name, tm in ir.triples_maps.items():
        if name not in source_columns:
            problems.append(f"triples map {name!r}: no source bound")
            continue
        have = set(source_columns[name])
        missing = required_columns(ir, name) - have
        for col in sorted(missing):
            problems.append(f"triples map {name!r}: missing column {col!r}")
    return problems


@dataclass(frozen=True)
class CompiledTriplePattern:
    """One (subject, predicate, object) emission rule, fully compiled."""

    tm_name: str
    subject: Column
    predicate: str  # constant IRI (predicates are always constant terms)
    obj: Column
    obj_datatype: Column
    obj_lang: Column
    graph: Column
    row_filter: Column | None
    obj_kind: str = "literal"  # iri | literal | blank — known at compile
    # time; carried through so serializers never guess term kinds
    # constant-folded metadata (None when absent). meta_static=False marks
    # dynamic datatype/lang templates (``datatype: $(col)``) — those need
    # the source row; everything else can be re-derived from a stored
    # object VALUE alone (the wide-row serving fast path).
    const_datatype: str | None = None
    const_lang: str | None = None
    const_graph: str | None = None
    meta_static: bool = True


def compile_asserted_patterns(
    ir: MappingDocumentIR, tm_name: str
) -> list[CompiledTriplePattern]:
    """All emission rules of one asserted (non-quoted) triples map."""
    tm = ir.triples_maps[tm_name]
    prefixes, base = ir.prefixes, ir.base_iri
    patterns: list[CompiledTriplePattern] = []
    tm_filter = (
        compile_condition(tm.condition, prefixes, base) if tm.condition else None
    )
    default_graphs = tm.graphs or ("",)
    for subj_template in tm.subject.templates:
        subj = template_column(subj_template, prefixes, base, sanitize=True)
        blank_filter = subject_not_blank_filter(subj_template)
        for po in tm.predicate_objects:
            po_filter = (
                compile_condition(po.condition, prefixes, base)
                if po.condition
                else None
            )
            row_filter = _and(_and(tm_filter, blank_filter), po_filter)
            graphs = po.graphs or default_graphs
            for g in graphs:
                graph_col = (
                    F.lit(expand_prefix(g, prefixes, base)) if g else F.lit(None)
                ).cast("string")
                graph_const = expand_prefix(g, prefixes, base) if g else None
                for pred in po.predicates:
                    pred_iri = expand_prefix(pred, prefixes, base)
                    for obj in po.objects:
                        if obj.mapping_ref is not None:
                            continue  # handled by materializer join (J3)
                        if obj.quoted_ref is not None:
                            continue  # quoted-object: materializer join (J1)
                        dyn_dt = bool(
                            obj.datatype and TEMPLATE_REF_RE.search(obj.datatype)
                        )
                        dyn_lang = bool(
                            obj.language and TEMPLATE_REF_RE.search(obj.language)
                        )
                        patterns.append(
                            CompiledTriplePattern(
                                tm_name=tm_name,
                                subject=subj,
                                predicate=pred_iri,
                                obj=object_value_column(obj, prefixes, base),
                                obj_datatype=datatype_column(obj, prefixes, base),
                                obj_lang=language_column(obj),
                                graph=graph_col,
                                row_filter=row_filter,
                                obj_kind=obj.kind,
                                const_datatype=None
                                if dyn_dt or obj.datatype is None
                                else expand_prefix(obj.datatype, prefixes, base),
                                const_lang=None
                                if dyn_lang
                                else obj.language,
                                const_graph=graph_const,
                                meta_static=not (dyn_dt or dyn_lang),
                            )
                        )
                for ipred in po.inverse_predicates:
                    # inverse: object becomes subject (only valid for IRIs)
                    ipred_iri = expand_prefix(ipred, prefixes, base)
                    for obj in po.objects:
                        if obj.mapping_ref is not None or obj.kind != "iri":
                            continue
                        patterns.append(
                            CompiledTriplePattern(
                                tm_name=tm_name,
                                subject=object_value_column(obj, prefixes, base),
                                predicate=ipred_iri,
                                obj=subj,
                                obj_datatype=F.lit(None).cast("string"),
                                obj_lang=F.lit(None).cast("string"),
                                graph=graph_col,
                                row_filter=row_filter,
                                obj_kind="iri",  # inverse object = subject IRI
                            )
                        )
    return patterns


def _and(a: Column | None, b: Column | None) -> Column | None:
    if a is None:
        return b
    if b is None:
        return a
    return a & b
