"""SPARQL-Update maintenance subset (round-3 VERDICT missing #3).

The reference's query library (sparql/batch_queries.rq) mixes SELECTs
with INSERT/DELETE *maintenance templates* over the batch-metadata graph
— CREATE_BATCH, ACTIVATE_BATCH, ARCHIVE_BATCH, ARCHIVE_OLD_BATCHES
(batch_queries.rq:572-596), DELETE_BATCH_SOFT. On the reference those
rewrite ``ex:status`` triples in ``<http://example.org/graph/metadata>``;
on this engine the same lifecycle lives in the batch LEDGER
(streaming/cdc.py ``set_batch_status`` / ``ledger_view``), so this module
parses the update text and routes each recognized intent to the
corresponding ledger transition — update-by-query-TEXT parity without
pretending a lake supports arbitrary write-by-query.

Scope (by design, documented):

* ``INSERT DATA`` registering an ``ex:Batch`` with a status → ledger
  status row (CREATE_BATCH).
* ``DELETE {status} INSERT {status'} WHERE {status…}`` on the metadata
  graph → status transition for the matched batches, honoring a specific
  ``$BATCH_URI`` subject, a required current status, ``FILTER(?b != X)``
  exclusions, and the ``?now - ?created > "PnD"^^xsd:duration`` age
  filter (ARCHIVE_OLD_BATCHES) evaluated against the ledger commit
  timestamps.
* Anything else — graph-level writes (``DROP GRAPH``), quad-count
  rewrites (engine-derived), arbitrary data updates — raises
  :class:`SparqlUnsupported` with a pointer to the engine API that owns
  that operation (retention/purge/CDC ingest).

Multiple operations separated by ``;`` run in order (ACTIVATE_BATCH is a
two-step request).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .sparql import (
    Expr,
    Group,
    Optional_,
    SparqlParseError,
    SparqlUnsupported,
    Term,
    TriplePattern,
    _Parser,
)

EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
BATCH_PREFIX = f"{EX}batch/"
_STATUS_PRED = f"{EX}status"
_CREATED_PRED = "http://purl.org/dc/terms/created"

# reference BatchStatus individuals ↔ engine ledger statuses
STATUS_URI_TO_LEDGER = {
    f"{EX}BatchStatus/pending": "PENDING",
    f"{EX}BatchStatus/active": "ACTIVE",
    f"{EX}BatchStatus/superseded": "SUPERSEDED",
    f"{EX}BatchStatus/archived": "ARCHIVED",
    f"{EX}BatchStatus/deleted": "DELETED",
}


@dataclass
class UpdateOp:
    kind: str  # insert_data | modify | drop_graph
    delete: Group | None = None
    insert: Group | None = None
    where: Group | None = None
    graph: Term | None = None  # DROP GRAPH target
    applied: list = field(default_factory=list)


class _UpdateParser(_Parser):
    """Reuses the SPARQL lexer/group/expression machinery; adds the
    update operation grammar. INSERT/DELETE/DATA/DROP lex as plain
    words (they are not query keywords), matched case-insensitively."""

    def parse_update(self) -> list[UpdateOp]:
        ops: list[UpdateOp] = []
        while True:
            tok = self.lx.peek()
            if tok is None:
                break
            if tok == (";", None):
                self.lx.next()
                continue
            if tok == ("kw", "prefix"):
                self.lx.next()
                p = self.lx.next()
                if p is None or p[0] != "pname" or not p[1].endswith(":"):
                    raise SparqlParseError(f"bad prefix decl {p!r}")
                iri = self.lx.expect("iri")
                self.prefixes[p[1][:-1]] = iri[1]
                continue
            if tok == ("kw", "base"):
                self.lx.next()
                self.lx.expect("iri")
                continue
            word = tok[1].lower() if tok[0] == "word" else None
            if word == "insert":
                self.lx.next()
                nxt = self.lx.peek()
                if nxt is not None and nxt[0] == "word" and nxt[1].lower() == "data":
                    self.lx.next()
                    ops.append(UpdateOp("insert_data", insert=self._group()))
                    continue
                # bare INSERT {...} WHERE {...}
                ins = self._group()
                self.lx.expect("kw", "where")
                ops.append(UpdateOp("modify", insert=ins, where=self._group()))
                continue
            if word == "delete":
                self.lx.next()
                delete = self._group()
                ins = None
                nxt = self.lx.peek()
                if nxt is not None and nxt[0] == "word" and nxt[1].lower() == "insert":
                    self.lx.next()
                    ins = self._group()
                self.lx.expect("kw", "where")
                ops.append(
                    UpdateOp("modify", delete=delete, insert=ins, where=self._group())
                )
                continue
            if word == "drop":
                self.lx.next()
                self.lx.expect("kw", "graph")
                ops.append(UpdateOp("drop_graph", graph=self._term()))
                continue
            raise SparqlUnsupported(f"update operation starting at {tok!r}")
        if not ops:
            raise SparqlParseError("empty update request")
        return ops


def parse_sparql_update(text: str, params: dict | None = None) -> list[UpdateOp]:
    """Parse an update request. ``params`` textually instantiates the
    library's ``$NAME`` / ``${NAME}`` template placeholders first (the
    reference substitutes before execution too)."""
    for k, v in (params or {}).items():
        text = text.replace("${" + k + "}", str(v)).replace("$" + k, str(v))
    return _UpdateParser(text).parse_update()


# ---------------------------------------------------------------------------
# interpretation
# ---------------------------------------------------------------------------


def _flat_triples(g: Group | None) -> list[TriplePattern]:
    if g is None:
        return []
    out = []
    for p in g.patterns:
        if isinstance(p, TriplePattern):
            out.append(p)
        elif isinstance(p, Optional_):
            out.extend(_flat_triples(p.group))
    return out


def _flat_filters(g: Group | None) -> list:
    if g is None:
        return []
    out = list(g.filters)
    for p in g.patterns:
        if isinstance(p, Optional_):
            out.extend(_flat_filters(p.group))
    return out


def _status_triple(g: Group | None) -> TriplePattern | None:
    for tp in _flat_triples(g):
        if tp.p.kind == "iri" and tp.p.value == _STATUS_PRED:
            return tp
    return None


def _batch_id_of(term: Term) -> str:
    v = str(term.value)
    return v[len(BATCH_PREFIX):] if v.startswith(BATCH_PREFIX) else v


def _ledger_status_of(term: Term) -> str:
    try:
        return STATUS_URI_TO_LEDGER[str(term.value)]
    except KeyError:
        raise SparqlUnsupported(f"unknown batch status IRI {term.value!r}")


def _expr_terms(e) -> list[Term]:
    """All leaf terms of an expression tree (filters are small)."""
    if isinstance(e, Expr):
        if e.op == "term":
            return [e.args[0]]
        if e.op == "call":
            out = []
            for a in e.args[1]:
                out.extend(_expr_terms(a))
            return out
        out = []
        for a in e.args:
            if isinstance(a, (Expr,)):
                out.extend(_expr_terms(a))
        return out
    return []


def _age_days(filters) -> float | None:
    """The ARCHIVE_OLD_BATCHES age guard: any filter comparing against an
    xsd:duration literal ``PnD`` means 'created more than n days ago'."""
    import re as _re

    for f in filters:
        if isinstance(f, Expr):
            for t in _expr_terms(f):
                if (
                    t.kind == "literal"
                    and t.datatype == "http://www.w3.org/2001/XMLSchema#duration"
                ):
                    m = _re.fullmatch(r"P(\d+(?:\.\d+)?)D", str(t.value))
                    if not m:
                        raise SparqlUnsupported(
                            f"duration {t.value!r} (only PnD day windows)"
                        )
                    return float(m.group(1))
    return None


def _exclusions(filters) -> tuple[set[str], set[str]]:
    """``FILTER(?x != <iri>)`` guards: a BatchStatus IRI excludes batches
    in that CURRENT status (DELETE_BATCH_SOFT keeps active batches); any
    other IRI excludes that batch (ACTIVATE_BATCH step 1 excludes the
    batch being activated)."""
    batches: set[str] = set()
    statuses: set[str] = set()
    for f in filters:
        if isinstance(f, Expr) and f.op == "!=":
            terms = [a.args[0] for a in f.args if isinstance(a, Expr) and a.op == "term"]
            if len(terms) == 2 and {t.kind for t in terms} == {"var", "iri"}:
                iri = next(t for t in terms if t.kind == "iri")
                if str(iri.value).startswith(f"{EX}BatchStatus/"):
                    statuses.add(_ledger_status_of(iri))
                else:
                    batches.add(_batch_id_of(iri))
    return batches, statuses


def execute_sparql_update(engine, text: str, params: dict | None = None) -> dict:
    """Parse + apply a maintenance update request against the engine's
    batch ledger. Returns ``{"operations": n, "transitions": [...]}``
    where each transition is ``{"batch_id", "from", "to"}``. Replaying
    the same request is idempotent through the guards here (an
    already-applied transition — or an already-registered batch, for
    CREATE — is skipped before any commit); ``set_batch_status`` keys each
    commit to the ledger head, so a crash-retry of one apply cannot
    double-append while a legitimate repeat of a past transition (after
    intervening status changes) still lands."""
    ops = parse_sparql_update(text, params)
    transitions: list[dict] = []
    for op in ops:
        transitions.extend(_apply_one(engine, op))
    return {"operations": len(ops), "transitions": transitions}


def _current_statuses(engine) -> dict[str, str]:
    """batch_id → latest ledger status (includes count-less rows that
    ledger_view's count join hides, e.g. a just-created PENDING batch)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not engine.batches.exists():
        return {}
    ledger = engine.batches.read()
    if "status_seq" not in ledger.columns:
        return {r["batch_id"]: r["status"] for r in ledger.collect()}
    w = Window.partitionBy("batch_id").orderBy(F.col("status_seq").desc())
    rows = (
        ledger.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("batch_id", "status")
        .collect()
    )
    return {r["batch_id"]: r["status"] for r in rows}


def _created_ts(engine) -> dict[str, float]:
    """batch_id → creation time = the data-table snapshot timestamp of the
    commit that created the batch (the engine's dct:created analogue)."""
    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    if not engine.batches.exists():
        return out
    rows = (
        engine.batches.read()
        .where(F.col("table_version").isNotNull())
        .select("batch_id", "table_version")
        .collect()
    )
    for r in rows:
        try:
            out[r["batch_id"]] = engine.table.snapshot(int(r["table_version"])).timestamp
        except FileNotFoundError:
            out[r["batch_id"]] = 0.0  # snapshot expired ⇒ definitely old
    return out


def _apply_one(engine, op: UpdateOp) -> list[dict]:
    if op.kind == "drop_graph":
        raise SparqlUnsupported(
            "DROP GRAPH (DELETE_BATCH_HARD) is a physical-data operation; "
            "route it through engine.retention() / the purge CLI, which "
            "reclaim files under snapshot-isolation rules"
        )
    if op.kind == "insert_data":
        # CREATE_BATCH: a subject typed ex:Batch with an initial status
        triples = _flat_triples(op.insert)
        subj = None
        for tp in triples:
            if (
                tp.p.kind == "iri"
                and tp.p.value == RDF_TYPE
                and tp.o.kind == "iri"
                and tp.o.value == f"{EX}Batch"
            ):
                subj = tp.s
        st = _status_triple(op.insert)
        if subj is None or st is None or subj.kind != "iri":
            raise SparqlUnsupported(
                "INSERT DATA is supported only for batch registration "
                "(a subject typed ex:Batch with an ex:status); data "
                "triples arrive through CDC ingest"
            )
        batch = _batch_id_of(subj)
        to = _ledger_status_of(st.o)
        # replay guard: re-creating an already-registered batch must not
        # knock its lifecycle back to the initial status (review finding —
        # CREATE_BATCH replayed after ACTIVATE_BATCH reset ACTIVE→PENDING)
        if batch in _current_statuses(engine):
            return []
        engine.set_batch_status(batch, to, f"sparqlupd-create-{batch}")
        return [{"batch_id": batch, "from": None, "to": to}]

    # modify: a status transition
    ins_st = _status_triple(op.insert)
    del_st = _status_triple(op.delete)
    if ins_st is None:
        if del_st is not None and op.insert is None:
            raise SparqlUnsupported(
                "bare DELETE of status triples would orphan the batch "
                "lifecycle; use a DELETE/INSERT transition"
            )
        raise SparqlUnsupported(
            "only batch-status transitions are supported by the "
            "maintenance subset (engine-derived values like ex:quadCount "
            "cannot be rewritten by query)"
        )
    if ins_st.o.kind != "iri":
        raise SparqlUnsupported("inserted status must be a BatchStatus IRI")
    to = _ledger_status_of(ins_st.o)

    subj = ins_st.s
    where_st = _status_triple(op.where)
    required = None
    if where_st is not None and where_st.o.kind == "iri":
        required = _ledger_status_of(where_st.o)
    filters = _flat_filters(op.where)
    excluded, excluded_statuses = _exclusions(filters)
    days = _age_days(filters)

    statuses = _current_statuses(engine)
    if subj.kind == "iri":
        batch = _batch_id_of(subj)
        candidates = [batch] if batch in statuses else []
    elif subj.kind == "var":
        candidates = sorted(statuses)
    else:
        raise SparqlUnsupported(f"status subject {subj.kind}")

    created = _created_ts(engine) if days is not None else {}
    now = time.time()
    out = []
    for b in candidates:
        cur = statuses[b]
        if required is not None and cur != required:
            continue
        if b in excluded or cur in excluded_statuses or cur == to:
            continue
        if days is not None:
            ts = created.get(b)
            if ts is None or now - ts < days * 86400.0:
                continue
        engine.set_batch_status(
            b, to, f"sparqlupd-{to.lower()}-{b}", current=cur
        )
        out.append({"batch_id": b, "from": cur, "to": to})
    return out
