"""YARRRML(-star) document parser → :mod:`ir` dataclasses.

Feature coverage mirrors the reference parser (yarrrml_parser.py:88-128
``parse`` and helpers) and its spec-conformance suite
(test_yarrrml_spec_comprehensive.py): base IRI, prefixes, authors, external
references, root-level sources/targets, subject shorthands, predicate-object
shorthand lists (``[p, o]``, ``[p, o, xsd:type]``, ``[p, o, en~lang]``),
expanded objects with datatype/language/type, multiple predicates/objects,
``~iri`` / ``~lang`` suffixes, graphs at mapping/PO level, conditions,
inverse predicates, mapping references (``o.mapping`` / parentTriplesMap)
and the RDF-star ``function: join(quoted=TM, equal(str1=$(a), str2=$(b)))``
subject form (yarrrml_parser.py:253-273).

This is a fresh implementation — the output is a compiler IR, not an
interpreter tree.
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

from .ir import (
    ConditionSpec,
    MappingDocumentIR,
    ObjectSpec,
    PredicateObjectSpec,
    QuotedJoin,
    SourceSpec,
    SubjectSpec,
    TriplesMapIR,
)

_JOIN_RE = re.compile(
    r"join\s*\(\s*quoted\s*=\s*([\w-]+)\s*,\s*equal\s*\("
    r"\s*str1\s*=\s*\$\(([^)]+)\)\s*,\s*str2\s*=\s*\$\(([^)]+)\)\s*\)\s*\)"
)
_ENV_RE = re.compile(r"\$\{(\w+)\}")
_EXT_RE = re.compile(r"\$\(_(\w+)\)")

_FMT_BY_EXT = {
    ".csv": "csv",
    ".tsv": "tsv",
    ".json": "json",
    ".xml": "xml",
    ".parquet": "parquet",
}


class YarrrmlParseError(ValueError):
    pass


def _interp_env(text: str) -> str:
    """``${VAR}`` env interpolation (reference: sources/__init__.py:30-65)."""
    return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), m.group(0)), text)


def _as_list(v: Any) -> list[Any]:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def parse_source(entry: Any, named: dict[str, SourceSpec]) -> SourceSpec:
    """Parse one ``sources:`` entry (inline shorthand, dict, or named ref)."""
    if isinstance(entry, str):
        if entry in named:
            return named[entry]
        return _parse_access_shorthand(entry)
    if isinstance(entry, list):
        # shorthand: ['file.csv~csv'] or ['file.csv~csv', '$.items[*]']
        spec = _parse_access_shorthand(str(entry[0]))
        if len(entry) > 1:
            spec = SourceSpec(
                access=spec.access,
                fmt=spec.fmt,
                iterator=str(entry[1]),
                delimiter=spec.delimiter,
                options=spec.options,
                name=spec.name,
            )
        return spec
    if isinstance(entry, dict):
        access = _interp_env(str(entry.get("access", "")))
        fmt = str(
            entry.get("referenceFormulation", entry.get("reference_formulation", ""))
        ).lower()
        if not fmt:
            fmt = _guess_fmt(access)
        opts = {
            k: str(v)
            for k, v in entry.items()
            if k
            not in {
                "access",
                "referenceFormulation",
                "reference_formulation",
                "iterator",
                "delimiter",
                "type",
                "credentials",
                "queryFormulation",
                "query",
            }
        }
        if "query" in entry:
            opts["query"] = _interp_env(str(entry["query"]))
        if str(entry.get("type", "")):
            fmt = str(entry["type"]).lower() or fmt
        return SourceSpec(
            access=access,
            fmt=fmt or "csv",
            iterator=entry.get("iterator"),
            delimiter=entry.get("delimiter"),
            options=opts,
        )
    raise YarrrmlParseError(f"unsupported source spec: {entry!r}")


def _guess_fmt(access: str) -> str:
    lower = access.lower()
    for ext, fmt in _FMT_BY_EXT.items():
        if lower.endswith(ext):
            return fmt
    if lower.startswith(("http://", "https://")):
        return "http"
    if lower.startswith("jdbc:") or "://" in lower:
        return "jdbc"
    return "csv"


def _parse_access_shorthand(text: str) -> SourceSpec:
    """``'file.csv~csv'`` / ``'data.json~jsonpath'`` shorthand."""
    text = _interp_env(text)
    if "~" in text:
        access, fmt = text.rsplit("~", 1)
        fmt = {"jsonpath": "json", "xpath": "xml"}.get(fmt.lower(), fmt.lower())
        return SourceSpec(access=access, fmt=fmt)
    return SourceSpec(access=text, fmt=_guess_fmt(text))


def _parse_condition(raw: Any) -> ConditionSpec | None:
    if raw is None:
        return None
    if isinstance(raw, list):
        raw = raw[0] if raw else None
        if raw is None:
            return None
    fn = str(raw.get("function", "equal"))
    # strip an idlab-fn:/grel: style prefix down to the local name
    fn = fn.rsplit(":", 1)[-1].rsplit("#", 1)[-1]
    params: dict[str, str] = {}
    for p in _as_list(raw.get("parameters")):
        if isinstance(p, list) and len(p) >= 2:
            params[str(p[0]).lstrip("str").lstrip("_") or str(p[0])] = str(p[1])
        elif isinstance(p, dict):
            params[str(p.get("parameter"))] = str(p.get("value"))
    # also allow flat dict form: {function: equal, str1: "$(a)", str2: "b"}
    for k, v in raw.items():
        if k not in {"function", "parameters"}:
            params[str(k)] = str(v)
    return ConditionSpec(function=fn, parameters=params)


def _expand_external(text: str, external: dict[str, str]) -> str:
    return _EXT_RE.sub(lambda m: str(external.get(m.group(1), m.group(0))), text)


def _split_value_suffix(value: str) -> tuple[str, str | None, str | None]:
    """Handle ``...~iri`` and ``en~lang`` shorthand suffixes.

    Returns (value, kind_override, lang_override-sentinel). A ``X~lang``
    element is a *third list element* marker handled by the caller; here we
    only strip ``~iri`` from object values.
    """
    if value.endswith("~iri"):
        return value[: -len("~iri")], "iri", None
    return value, None, None


def _parse_object(raw: Any, external: dict[str, str]) -> list[ObjectSpec]:
    out: list[ObjectSpec] = []
    for obj in _as_list(raw):
        if isinstance(obj, str):
            value, kind, _ = _split_value_suffix(_expand_external(obj, external))
            out.append(ObjectSpec(value=value, kind=kind or "literal"))
        elif isinstance(obj, list):
            # object shorthand: [value] | [value, datatype] | [value, ll~lang]
            if not obj:
                raise YarrrmlParseError("empty object shorthand list")
            value, kind, _ = _split_value_suffix(
                _expand_external(str(obj[0]), external)
            )
            datatype = language = None
            if len(obj) > 1:
                second = str(obj[1])
                if second.endswith("~lang"):
                    language = second[: -len("~lang")]
                else:
                    datatype = second
            out.append(
                ObjectSpec(
                    value=value,
                    kind=kind or "literal",
                    datatype=datatype,
                    language=language,
                )
            )
        elif isinstance(obj, dict):
            if "mapping" in obj:
                cond = _parse_condition(obj.get("condition"))
                join_cond = None
                if cond is not None:
                    p = cond.parameters
                    a = p.get("str1") or p.get("1") or next(iter(p.values()), None)
                    vals = list(p.values())
                    b = p.get("str2") or p.get("2") or (vals[1] if len(vals) > 1 else a)
                    join_cond = (_strip_ref(a), _strip_ref(b))
                out.append(
                    ObjectSpec(
                        kind="iri",
                        mapping_ref=str(obj["mapping"]),
                        join_condition=join_cond,
                    )
                )
                continue
            if "quoted" in obj or "quotedNonAsserted" in obj:
                # RDF-star quoted triple in object position (spec ex. 110/114)
                name = str(obj.get("quoted", obj.get("quotedNonAsserted")))
                out.append(
                    ObjectSpec(
                        kind="quoted",
                        quoted_ref=name,
                        quoted_non_asserted="quotedNonAsserted" in obj,
                    )
                )
                continue
            if "function" in obj:
                fn_raw = str(obj["function"])
                m = re.match(r"^([^()\s]+)\((.*)\)$", fn_raw.strip())
                if m:  # inline: ex:toLowerCase(input=$(x), y=...)
                    fn_name = m.group(1)
                    args = tuple(
                        a.split("=", 1)[-1].strip()
                        for a in m.group(2).split(",")
                        if a.strip()
                    )
                else:  # structured: function: + parameters: [[p, v], ...]
                    fn_name = fn_raw
                    args = tuple(
                        str(p[-1] if isinstance(p, list) else p.get("value", p))
                        for p in _as_list(obj.get("parameters"))
                    )
                out.append(
                    ObjectSpec(
                        kind=str(obj.get("type", "literal")).lower(),
                        datatype=obj.get("datatype"),
                        language=obj.get("language"),
                        function=fn_name,
                        fn_args=tuple(_expand_external(a, external) for a in args),
                    )
                )
                continue
            value = obj.get("value")
            if value is None:
                raise YarrrmlParseError(f"object without value: {obj!r}")
            value, kind_sfx, _ = _split_value_suffix(
                _expand_external(str(value), external)
            )
            kind = str(obj.get("type", kind_sfx or "literal")).lower()
            out.append(
                ObjectSpec(
                    value=value,
                    kind=kind if kind in {"literal", "iri", "blank"} else "literal",
                    datatype=obj.get("datatype"),
                    language=obj.get("language"),
                )
            )
        else:
            raise YarrrmlParseError(f"unsupported object spec: {obj!r}")
    return out


def _strip_ref(text: str | None) -> str:
    if text is None:
        return ""
    m = re.fullmatch(r"\$\(([^)]+)\)", text.strip())
    return m.group(1) if m else text.strip()


def _parse_po(raw: Any, external: dict[str, str]) -> PredicateObjectSpec:
    if isinstance(raw, list):
        # shorthand: [p, o] | [p, o, datatype] | [p, o, lang~lang]
        if len(raw) < 2:
            raise YarrrmlParseError(f"short predicate-object needs ≥2 items: {raw!r}")
        pred = str(raw[0])
        value, kind, _ = _split_value_suffix(_expand_external(str(raw[1]), external))
        datatype = language = None
        if len(raw) >= 3:
            third = str(raw[2])
            if third.endswith("~lang"):
                language = third[: -len("~lang")]
            else:
                datatype = third
        return PredicateObjectSpec(
            predicates=(pred,),
            objects=(
                ObjectSpec(
                    value=value,
                    kind=kind or "literal",
                    datatype=datatype,
                    language=language,
                ),
            ),
        )
    if isinstance(raw, dict):
        preds = tuple(str(p) for p in _as_list(raw.get("predicates", raw.get("p"))))
        inv = tuple(str(p) for p in _as_list(raw.get("inversepredicates")))
        objects = tuple(
            _parse_object(raw.get("objects", raw.get("o")), external)
        )
        graphs = tuple(str(g) for g in _as_list(raw.get("graphs", raw.get("g"))))
        cond = _parse_condition(raw.get("condition") or raw.get("conditions"))
        if not preds or not objects:
            raise YarrrmlParseError(f"predicate-object missing parts: {raw!r}")
        return PredicateObjectSpec(
            predicates=preds,
            objects=objects,
            graphs=graphs,
            condition=cond,
            inverse_predicates=inv,
        )
    raise YarrrmlParseError(f"unsupported predicate-object: {raw!r}")


def _parse_target(v: Any) -> dict[str, str]:
    """One ``targets:`` entry — long dict form, or the spec shortcut list
    ``[access~type, serialization, compression]`` / bare string
    (YARRRML spec §targets; crashes in round 1 came from the list form)."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return {str(kk): str(vv) for kk, vv in v.items()}
    if isinstance(v, str):
        v = [v]
    if isinstance(v, list):
        out: dict[str, str] = {}
        if v:
            access = str(v[0])
            if "~" in access:
                access, t = access.rsplit("~", 1)
                out["type"] = t
            out["access"] = access
        if len(v) > 1:
            out["serialization"] = str(v[1])
        if len(v) > 2:
            out["compression"] = str(v[2])
        return out
    raise YarrrmlParseError(f"unsupported target spec: {v!r}")


def _parse_subject(raw: Any, external: dict[str, str]) -> SubjectSpec:
    templates: list[str] = []
    quoted: QuotedJoin | None = None
    for s in _as_list(raw):
        if isinstance(s, str):
            templates.append(_expand_external(s, external))
        elif isinstance(s, dict) and "function" in s:
            m = _JOIN_RE.search(str(s["function"]))
            if not m:
                raise YarrrmlParseError(f"unsupported subject function: {s!r}")
            quoted = QuotedJoin(
                quoted_map=m.group(1), child_key=m.group(2), parent_key=m.group(3)
            )
        elif isinstance(s, dict) and "value" in s:
            # long subject form: {value: template, targets: ...} (spec §subjects)
            templates.append(_expand_external(str(s["value"]), external))
        elif isinstance(s, dict) and "quoted" in s:
            cond = _parse_condition(s.get("condition"))
            params = cond.parameters if cond else {}
            vals = list(params.values())
            quoted = QuotedJoin(
                quoted_map=str(s["quoted"]),
                child_key=_strip_ref(vals[0] if vals else ""),
                parent_key=_strip_ref(vals[1] if len(vals) > 1 else ""),
            )
        else:
            raise YarrrmlParseError(f"unsupported subject: {s!r}")
    return SubjectSpec(templates=tuple(templates), quoted_join=quoted)


def parse_document(doc: dict[str, Any] | str) -> MappingDocumentIR:
    """Parse a YARRRML document (YAML text or pre-loaded dict) to IR."""
    if isinstance(doc, str):
        loaded = [d for d in yaml.safe_load_all(doc) if d]
        merged: dict[str, Any] = {}
        for d in loaded:  # multi-doc YAML: later mappings merge in
            for k, v in d.items():
                if k == "mappings" and "mappings" in merged:
                    merged["mappings"].update(v)
                else:
                    merged[k] = v
        doc = merged
    if not isinstance(doc, dict):
        raise YarrrmlParseError("document is not a mapping")

    prefixes = {str(k): str(v) for k, v in (doc.get("prefixes") or {}).items()}
    prefixes.setdefault("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#")
    base_iri = doc.get("base")
    external = {str(k): str(v) for k, v in (doc.get("external") or {}).items()}
    authors = tuple(_as_list(doc.get("authors")))

    named_sources: dict[str, SourceSpec] = {}
    for name, raw in (doc.get("sources") or {}).items():
        spec = parse_source(raw, {})
        named_sources[str(name)] = SourceSpec(
            access=spec.access,
            fmt=spec.fmt,
            iterator=spec.iterator,
            delimiter=spec.delimiter,
            options=spec.options,
            name=str(name),
        )

    targets = {
        str(k): _parse_target(v) for k, v in (doc.get("targets") or {}).items()
    }

    triples_maps: dict[str, TriplesMapIR] = {}
    for name, m in (doc.get("mappings") or doc.get("mapping") or {}).items():
        if not isinstance(m, dict):
            raise YarrrmlParseError(f"mapping {name!r} is not a dict")
        srcs = tuple(
            parse_source(s, named_sources)
            for s in _as_list(m.get("sources", m.get("source")))
        )
        subject = _parse_subject(
            m.get("subjects", m.get("subject", m.get("s"))), external
        )
        pos = tuple(
            _parse_po(po, external)
            for po in _as_list(m.get("predicateobjects", m.get("po")))
        )
        graphs = tuple(str(g) for g in _as_list(m.get("graphs", m.get("graph"))))
        cond = _parse_condition(m.get("condition") or m.get("conditions"))
        triples_maps[str(name)] = TriplesMapIR(
            name=str(name),
            sources=srcs,
            subject=subject,
            predicate_objects=pos,
            graphs=graphs,
            condition=cond,
        )

    ir = MappingDocumentIR(
        prefixes=prefixes,
        base_iri=str(base_iri) if base_iri else None,
        triples_maps=triples_maps,
        external=external,
        authors=authors,
        sources=named_sources,
        targets=targets,
    )
    _validate(ir)
    return ir


def _validate(ir: MappingDocumentIR) -> None:
    for tm in ir.triples_maps.values():
        qj = tm.subject.quoted_join
        if qj is not None and qj.quoted_map not in ir.triples_maps:
            raise YarrrmlParseError(
                f"{tm.name}: quoted join references unknown map {qj.quoted_map!r}"
            )
        for po in tm.predicate_objects:
            for obj in po.objects:
                if obj.mapping_ref and obj.mapping_ref not in ir.triples_maps:
                    raise YarrrmlParseError(
                        f"{tm.name}: object mapping ref {obj.mapping_ref!r} unknown"
                    )
                if obj.quoted_ref and obj.quoted_ref not in ir.triples_maps:
                    raise YarrrmlParseError(
                        f"{tm.name}: quoted object ref {obj.quoted_ref!r} unknown"
                    )


def parse_file(path: str) -> MappingDocumentIR:
    with open(path, encoding="utf-8") as fh:
        return parse_document(fh.read())
