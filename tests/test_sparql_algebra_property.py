"""Differential property suite for the SPARQL front end.

A naive, spec-faithful evaluator of the SPARQL 1.1 algebra (nested-loop
BGP join, compatible-mapping left join for OPTIONAL, multiset UNION,
error-dropping FILTER) is run against randomized tiny graphs and
randomized queries, and its solution multiset is compared with
``sparql_df``'s output. The reference engine gets these semantics from
pyoxigraph's spec-driven Rust core; this suite plays the same role for
the Catalyst compilation (join strategy, null-tolerant compatible joins,
numeric-vs-string dispatch) without depending on rdflib.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from etl_pipeline_rdf_star_spark.queries.sparql import (
    SparqlDataset,
    sparql_df,
)
from etl_pipeline_rdf_star_spark.session import get_spark

# tiny vocabulary: IRIs plus numeric and plain lexicals so both numeric
# and string comparison dispatch paths are exercised
SUBJECTS = [f"http://x/s{i}" for i in range(4)]
PREDICATES = [f"http://x/p{i}" for i in range(3)]
OBJECTS = ["http://x/s0", "http://x/o1", "alpha", "beta", "7", "10", "2.5"]
VARS = ["a", "b", "c"]


@pytest.fixture(scope="module")
def spark():
    return get_spark("sparql-prop", cores=4, shuffle_partitions=4)


# ---------------------------------------------------------------------------
# naive algebra evaluator (solutions = list[dict[var, value]])
# ---------------------------------------------------------------------------


def _match(triples, pat):
    out = []
    for t in triples:
        m = {}
        ok = True
        for term, val in zip(pat, t):
            if isinstance(term, tuple):  # ("var", name)
                name = term[1]
                if name in m and m[name] != val:
                    ok = False
                    break
                m[name] = val
            elif term != val:
                ok = False
                break
        if ok:
            out.append(m)
    return out


def _compatible(m1, m2):
    return all(m1[k] == m2[k] for k in m1.keys() & m2.keys())


def _join(left, right):
    return [
        {**m1, **m2} for m1 in left for m2 in right if _compatible(m1, m2)
    ]


def _left_join(left, right):
    out = []
    for m1 in left:
        ext = [{**m1, **m2} for m2 in right if _compatible(m1, m2)]
        out.extend(ext if ext else [m1])
    return out


def _is_num(s):
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False


def _filter_pass(m, f):
    """FILTER(?v OP operand) with SPARQL error semantics: an unbound var
    or a failed numeric cast is a type error and drops the solution."""
    op, var, operand = f
    v = m.get(var)
    if v is None:
        return False
    if isinstance(operand, tuple):  # var operand
        w = m.get(operand[1])
        if w is None:
            return False
    else:
        w = operand
    numeric = (not isinstance(operand, tuple)) and _is_num(operand)
    if numeric:
        if not (_is_num(v) and _is_num(w)):
            return False
        v, w = float(v), float(w)
    if op == "=":
        return v == w
    if op == "!=":
        return v != w
    return v < w  # "<" only generated in numeric form


def _minus(left, right):
    """SPARQL 1.1 §8.3: drop m1 when a compatible m2 exists whose domain
    OVERLAPS m1's (disjoint-domain right solutions remove nothing)."""
    return [
        m1
        for m1 in left
        if not any(
            _compatible(m1, m2) and (m1.keys() & m2.keys())
            for m2 in right
        )
    ]


def naive_eval(triples, query):
    """query = {"patterns": [...], "optional": [...] | None,
    "union": [...] | None, "minus": [...] | None, "bind": (src, tgt) |
    None, "values": (var, [vals]) | None, "filters": [...],
    "distinct": bool}"""
    sols = [{}]
    for pat in query["patterns"]:
        sols = _join(sols, _match(triples, pat))
    if query["union"] is not None:
        right = [{}]
        for pat in query["union"]:
            right = _join(right, _match(triples, pat))
        sols = sols + right
    if query["optional"] is not None:
        opt = [{}]
        for pat in query["optional"]:
            opt = _join(opt, _match(triples, pat))
        sols = _left_join(sols, opt)
    if query["minus"] is not None:
        right = [{}]
        for pat in query["minus"]:
            right = _join(right, _match(triples, pat))
        sols = _minus(sols, right)
    if query["bind"] is not None:
        src, tgt = query["bind"]
        out = []
        for m in sols:
            v = m.get(src[1]) if isinstance(src, tuple) else src
            m = dict(m)
            if v is not None:  # error (unbound source) leaves tgt unbound
                m[tgt] = v
            out.append(m)
        sols = out
    if query["values"] is not None:
        var, vals = query["values"]
        rows = [{} if v is None else {var: v} for v in vals]  # None=UNDEF
        sols = _join(sols, rows)
    for f in query["filters"]:
        sols = [m for m in sols if _filter_pass(m, f)]
    return sols


# ---------------------------------------------------------------------------
# query rendering (the generated AST → SPARQL text)
# ---------------------------------------------------------------------------


def _term_text(t):
    if isinstance(t, tuple):
        return f"?{t[1]}"
    if t.startswith("http://"):
        return f"<{t}>"
    return f'"{t}"'


def _pat_text(p):
    return " ".join(_term_text(t) for t in p) + " ."


def _operand_text(x):
    if isinstance(x, tuple):
        return f"?{x[1]}"
    if _is_num(x):
        return x  # bare numeric literal → numeric dispatch
    return f'"{x}"'


def render(query):
    parts = [_pat_text(p) for p in query["patterns"]]
    if query["union"] is not None:
        inner = " ".join(parts)
        right = " ".join(_pat_text(p) for p in query["union"])
        parts = ["{ %s } UNION { %s }" % (inner, right)]
    if query["optional"] is not None:
        parts.append(
            "OPTIONAL { %s }"
            % " ".join(_pat_text(p) for p in query["optional"])
        )
    if query["minus"] is not None:
        parts.append(
            "MINUS { %s }" % " ".join(_pat_text(p) for p in query["minus"])
        )
    if query["bind"] is not None:
        src, tgt = query["bind"]
        # always render literal sources quoted: a bare numeric would BIND
        # a typed number while the engine's relations (and the naive
        # evaluator) carry lexical strings
        src_text = f"?{src[1]}" if isinstance(src, tuple) else _term_text(src)
        parts.append(f"BIND({src_text} AS ?{tgt})")
    if query["values"] is not None:
        var, vals = query["values"]
        body = " ".join(
            "UNDEF" if v is None else _term_text(v) for v in vals
        )
        parts.append("VALUES ?%s { %s }" % (var, body))
    for op, var, operand in query["filters"]:
        parts.append(f"FILTER(?{var} {op} {_operand_text(operand)})")
    head = "SELECT DISTINCT *" if query["distinct"] else "SELECT *"
    return head + " WHERE { " + " ".join(parts) + " }"


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

triple_st = st.tuples(
    st.sampled_from(SUBJECTS),
    st.sampled_from(PREDICATES),
    st.sampled_from(OBJECTS),
)

term_s = st.one_of(
    st.sampled_from(SUBJECTS),
    st.tuples(st.just("var"), st.sampled_from(VARS)),
)
term_p = st.one_of(
    st.sampled_from(PREDICATES),
    st.tuples(st.just("var"), st.sampled_from(VARS)),
)
term_o = st.one_of(
    st.sampled_from(OBJECTS),
    st.tuples(st.just("var"), st.sampled_from(VARS)),
)


def _has_var(p):
    return any(isinstance(t, tuple) for t in p)


pattern_st = st.tuples(term_s, term_p, term_o).filter(_has_var)
bgp_st = st.lists(pattern_st, min_size=1, max_size=3)


@st.composite
def query_st(draw):
    patterns = draw(bgp_st)
    bound = {t[1] for p in patterns for t in p if isinstance(t, tuple)}
    union = draw(st.one_of(st.none(), st.lists(pattern_st, min_size=1, max_size=2)))
    optional = None
    if union is None:
        optional = draw(
            st.one_of(st.none(), st.lists(pattern_st, min_size=1, max_size=2))
        )
    minus = draw(
        st.one_of(st.none(), st.lists(pattern_st, min_size=1, max_size=2))
    )
    # BIND source vars must appear somewhere the engine projects a column
    # for (patterns/union/optional); a var only in MINUS never becomes a
    # column and a reference to it is a loud error, not SPARQL-unbound
    groups = [patterns] + [g for g in (union, optional) if g]
    in_scope = sorted(
        {t[1] for g in groups for p in g for t in p if isinstance(t, tuple)}
    )
    bind = None
    if draw(st.booleans()):
        src = draw(
            st.one_of(
                st.sampled_from(OBJECTS),
                *(
                    [st.tuples(st.just("var"), st.sampled_from(in_scope))]
                    if in_scope
                    else []
                ),
            )
        )
        bind = (src, "d")  # ?d never appears in patterns (not in VARS)
    values = None
    if draw(st.booleans()):
        var = draw(st.sampled_from(VARS))
        vals = draw(
            st.lists(
                st.one_of(st.none(), st.sampled_from(OBJECTS)),
                min_size=1,
                max_size=3,
            )
        )
        values = (var, vals)
    filters = []
    if bound and draw(st.booleans()):
        var = draw(st.sampled_from(sorted(bound)))
        op = draw(st.sampled_from(["=", "!=", "<"]))
        if op == "<":
            operand = draw(st.sampled_from(["3", "8", "9.5"]))
        else:
            operand = draw(
                st.one_of(
                    st.sampled_from(OBJECTS),
                    st.tuples(st.just("var"), st.sampled_from(sorted(bound))),
                )
            )
        filters.append((op, var, operand))
    return {
        "patterns": patterns,
        "union": union,
        "optional": optional,
        "minus": minus,
        "bind": bind,
        "values": values,
        "filters": filters,
        "distinct": draw(st.booleans()),
    }


def _all_vars(query):
    groups = [query["patterns"]]
    if query["union"] is not None:
        groups.append(query["union"])
    if query["optional"] is not None:
        groups.append(query["optional"])
    # MINUS right-side vars do NOT extend the projected scope (§8.3);
    # BIND targets and VALUES vars do
    out = {t[1] for g in groups for p in g for t in p if isinstance(t, tuple)}
    if query["bind"] is not None:
        out.add(query["bind"][1])
    if query["values"] is not None:
        out.add(query["values"][0])
    return sorted(out)


def _rowset(sols, vars_, distinct):
    rows = [tuple(m.get(v) for v in vars_) for m in sols]
    if distinct:
        return sorted(set(rows))
    return sorted(rows, key=lambda r: tuple("" if x is None else x for x in r))


# ---------------------------------------------------------------------------
# the property
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    triples=st.lists(triple_st, min_size=0, max_size=12),
    query=query_st(),
)
def test_sparql_matches_naive_algebra(spark, triples, query):
    text = render(query)
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(s, p, o, None) for s, p, o in triples],
            "subject string, predicate string, object string, graph string",
        ),
        annotations=spark.createDataFrame(
            [],
            "q_s string, q_p string, q_o string, predicate string,"
            " object string",
        ),
    )
    vars_ = _all_vars(query)
    want = _rowset(naive_eval(triples, query), vars_, query["distinct"])
    df = sparql_df(ds, text)
    got_rows = [
        tuple(r[v] if v in df.columns else None for v in vars_)
        for r in df.collect()
    ]
    got = (
        sorted(set(got_rows))
        if query["distinct"]
        else sorted(
            got_rows, key=lambda r: tuple("" if x is None else x for x in r)
        )
    )
    assert got == want, f"query: {text}\ndata: {triples}"


# ---------------------------------------------------------------------------
# aggregates: GROUP BY differential against the same naive model
# ---------------------------------------------------------------------------

AGGS = [
    "COUNT(?v)",
    "COUNT(*)",
    "COUNT(DISTINCT ?v)",
    "SUM(?v)",
    "AVG(?v)",
    "MIN(?v)",
    "MAX(?v)",
    'GROUP_CONCAT(?v)',
    'GROUP_CONCAT(DISTINCT ?v; separator="|")',
    "SAMPLE(?v)",
]


def _minmax_key(v):
    # Spark struct(n, r) ordering with NULL n sorting first: every
    # non-numeric lexical sorts below every numeric, ties lexical
    return (1, float(v), v) if _is_num(v) else (0, 0.0, v)


def _naive_agg(agg, rows):
    bound = [v for v in rows if v is not None]
    if agg == "COUNT(?v)":
        return len(bound)
    if agg == "COUNT(*)":
        return len(rows)
    if agg == "COUNT(DISTINCT ?v)":
        return len(set(bound))
    if agg in ("SUM(?v)", "AVG(?v)"):
        # any bound non-numeric member = type error -> unbound;
        # unbound members are skipped; empty -> unbound
        if not bound or any(not _is_num(v) for v in bound):
            return None
        s = sum(float(v) for v in bound)
        return round(s if agg.startswith("SUM") else s / len(bound), 6)
    if agg == "MIN(?v)":
        return min(bound, key=_minmax_key) if bound else None
    if agg == "MAX(?v)":
        return max(bound, key=_minmax_key) if bound else None
    if agg == 'GROUP_CONCAT(?v)':
        return " ".join(sorted(bound))  # engine sorts for determinism
    if agg.startswith("GROUP_CONCAT(DISTINCT"):
        return "|".join(sorted(set(bound)))
    return min(bound) if bound else None  # SAMPLE = deterministic min


def _norm(v):
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    edges=st.lists(
        st.tuples(st.sampled_from(SUBJECTS), st.sampled_from(["g1", "g2"])),
        min_size=1,
        max_size=6,
    ),
    vals=st.lists(
        st.tuples(st.sampled_from(SUBJECTS), st.sampled_from(OBJECTS)),
        min_size=0,
        max_size=8,
    ),
    agg=st.sampled_from(AGGS),
)
def test_group_by_aggregates_match_naive(spark, edges, vals, agg):
    triples = [(s, "http://x/p0", g) for s, g in edges] + [
        (s, "http://x/p1", v) for s, v in vals
    ]
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(s, p, o, None) for s, p, o in triples],
            "subject string, predicate string, object string, graph string",
        ),
        annotations=spark.createDataFrame(
            [],
            "q_s string, q_p string, q_o string, predicate string,"
            " object string",
        ),
    )
    text = (
        f"SELECT ?g ({agg} AS ?x) WHERE {{ "
        "?s <http://x/p0> ?g . OPTIONAL { ?s <http://x/p1> ?v } "
        "} GROUP BY ?g"
    )
    sols = naive_eval(
        triples,
        {
            "patterns": [(("var", "s"), "http://x/p0", ("var", "g"))],
            "union": None,
            "optional": [(("var", "s"), "http://x/p1", ("var", "v"))],
            "minus": None,
            "bind": None,
            "values": None,
            "filters": [],
        },
    )
    groups: dict = {}
    for m in sols:
        groups.setdefault(m["g"], []).append(m.get("v"))
    want = sorted(
        (g, _norm(_naive_agg(agg, rows))) for g, rows in groups.items()
    )
    got = sorted(
        (r["g"], _norm(r["x"])) for r in sparql_df(ds, text).collect()
    )
    assert got == want, f"agg: {agg}\ndata: {triples}"


# ---------------------------------------------------------------------------
# property paths: differential against a naive W3C-algebra evaluator
# ---------------------------------------------------------------------------

# path AST: ("p", iri) | ("inv", e) | ("seq", a, b) | ("alt", a, b)
#         | ("star", e) | ("plus", e) | ("opt", e)


def _nodes(triples):
    return {t[0] for t in triples} | {t[2] for t in triples}


def _closure(pairs):
    out = set(pairs)
    changed = True
    while changed:
        changed = False
        for (a, b) in list(out):
            for (c, d) in list(out):
                if b == c and (a, d) not in out:
                    out.add((a, d))
                    changed = True
    return out


def _nullable(e):
    """Can the path match the zero-length route? ``plus`` is nullable
    when its child is — one ALP iteration of a nullable child matches
    the empty route, making (q?)+ ≡ q* (mirrors the engine's
    _path_nullable)."""
    kind = e[0]
    if kind in ("star", "opt"):
        return True
    if kind in ("inv", "plus"):
        return _nullable(e[1])
    if kind == "seq":
        return _nullable(e[1]) and _nullable(e[2])
    if kind == "alt":
        return _nullable(e[1]) or _nullable(e[2])
    return False


def _path_pairs(triples, e):
    """Pair-set semantics for a path in JOIN position (both ends open):
    ZeroLengthPath over variables = every term in the graph."""
    kind = e[0]
    if kind == "p":
        return {(s, o) for s, p, o in triples if p == e[1]}
    if kind == "inv":
        return {(b, a) for a, b in _path_pairs(triples, e[1])}
    if kind == "seq":
        left, right = _path_pairs(triples, e[1]), _path_pairs(triples, e[2])
        return {(a, d) for a, b in left for c, d in right if b == c}
    if kind == "alt":
        return _path_pairs(triples, e[1]) | _path_pairs(triples, e[2])
    zero = {(t, t) for t in _nodes(triples)}
    inner = _path_pairs(triples, e[1])
    if kind == "plus":
        out = _closure(inner)
        return out | zero if _nullable(e[1]) else out
    if kind == "star":
        return _closure(inner) | zero
    return inner | zero  # opt


def _path_match(triples, s_spec, o_spec, e):
    """Top-level match with bound-endpoint ZeroLengthPath semantics:
    a bound endpoint matches itself zero-length even when the term does
    not occur in the graph (W3C §18.4 ZeroLengthPath case analysis)."""
    kind = e[0]
    if kind in ("star", "plus"):
        base = _closure(_path_pairs(triples, e[1]))
    elif kind == "opt":  # '?' is zero-or-ONE, not a closure
        base = _path_pairs(triples, e[1])
    else:
        base = _path_pairs(triples, e)
    sols = {
        (a, b)
        for a, b in base
        if (isinstance(s_spec, tuple) or a == s_spec)
        and (isinstance(o_spec, tuple) or b == o_spec)
    }
    if _nullable(e):
        s_bound = not isinstance(s_spec, tuple)
        o_bound = not isinstance(o_spec, tuple)
        if s_bound and o_bound:
            if s_spec == o_spec:
                sols.add((s_spec, o_spec))
        elif s_bound:
            sols.add((s_spec, s_spec))
        elif o_bound:
            sols.add((o_spec, o_spec))
        else:
            sols |= {(t, t) for t in _nodes(triples)}
    return sols


def _path_text(e):
    kind = e[0]
    if kind == "p":
        return f"<{e[1]}>"
    if kind == "inv":
        return f"^({_path_text(e[1])})"
    if kind == "seq":
        return f"({_path_text(e[1])}/{_path_text(e[2])})"
    if kind == "alt":
        return f"({_path_text(e[1])}|{_path_text(e[2])})"
    mark = {"star": "*", "plus": "+", "opt": "?"}[kind]
    return f"({_path_text(e[1])}){mark}"


path_st = st.recursive(
    st.tuples(st.just("p"), st.sampled_from(PREDICATES)),
    lambda inner: st.one_of(
        st.tuples(st.just("inv"), inner),
        st.tuples(st.just("seq"), inner, inner),
        st.tuples(st.just("alt"), inner, inner),
        st.tuples(st.just("star"), inner),
        st.tuples(st.just("plus"), inner),
        st.tuples(st.just("opt"), inner),
    ),
    max_leaves=4,
)

endpoint_st = st.one_of(
    st.sampled_from(SUBJECTS),
    st.tuples(st.just("var"), st.sampled_from(["a", "b"])),
)


@settings(max_examples=35, deadline=None, derandomize=True)
@given(
    triples=st.lists(
        st.tuples(
            st.sampled_from(SUBJECTS),
            st.sampled_from(PREDICATES),
            st.sampled_from(SUBJECTS + ["alpha", "7"]),
        ),
        min_size=0,
        max_size=10,
    ),
    path=path_st,
    s_spec=endpoint_st,
    o_spec=endpoint_st,
)
def test_property_paths_match_naive(spark, triples, path, s_spec, o_spec):
    triples = sorted(set(triples))
    if (
        isinstance(s_spec, tuple)
        and isinstance(o_spec, tuple)
        and s_spec == o_spec
    ):
        o_spec = ("var", "b" if s_spec[1] == "a" else "a")
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(s, p, o, None) for s, p, o in triples],
            "subject string, predicate string, object string, graph string",
        ),
        annotations=spark.createDataFrame(
            [],
            "q_s string, q_p string, q_o string, predicate string,"
            " object string",
        ),
    )
    text = (
        "SELECT * WHERE { "
        f"{_term_text(s_spec)} {_path_text(path)} {_term_text(o_spec)} . "
        "}"
    )
    want_pairs = _path_match(triples, s_spec, o_spec, path)
    # project the var positions the engine returns
    vars_ = []
    if isinstance(s_spec, tuple):
        vars_.append(("s", s_spec[1]))
    if isinstance(o_spec, tuple):
        vars_.append(("o", o_spec[1]))
    want = sorted(
        {
            tuple((a if pos == "s" else b) for pos, _ in vars_)
            for a, b in want_pairs
        }
    )
    df = sparql_df(ds, text)
    got = sorted({tuple(r[v] for _, v in vars_) for r in df.collect()})
    assert got == want, f"query: {text}\ndata: {triples}"


# ---------------------------------------------------------------------------
# RDF-star: quoted-triple annotation patterns (the flagship J1/J4 joins)
# ---------------------------------------------------------------------------

ANN_PREDS = ["http://x/conf", "http://x/src"]
ANN_OBJS = ["0.3", "0.9", "sysA", "sysB"]


def _match_ann(anns, qpat):
    """qpat = (ts, tp, to, ap, tobj): unify a << ts tp to >> ap tobj
    pattern against the annotation rows."""
    out = []
    for row in anns:
        m = {}
        ok = True
        for term, val in zip(qpat, row):
            if isinstance(term, tuple):
                name = term[1]
                if name in m and m[name] != val:
                    ok = False
                    break
                m[name] = val
            elif term != val:
                ok = False
                break
        if ok:
            out.append(m)
    return out


@settings(max_examples=30, deadline=None, derandomize=True)
@given(data=st.data())
def test_quoted_triple_patterns_match_naive(spark, data):
    triples = data.draw(
        st.lists(triple_st, min_size=1, max_size=8), label="triples"
    )
    # annotations mostly quote asserted triples (so joins bite), some not
    quoted_pool = triples + data.draw(
        st.lists(triple_st, min_size=0, max_size=2), label="extra_quoted"
    )
    anns = data.draw(
        st.lists(
            st.tuples(
                st.sampled_from(quoted_pool),
                st.sampled_from(ANN_PREDS),
                st.sampled_from(ANN_OBJS),
            ),
            min_size=0,
            max_size=8,
        ),
        label="anns",
    ).copy()
    ann_rows = [(qs, qp, qo, ap, ao) for (qs, qp, qo), ap, ao in anns]

    term_or_var = lambda pool, vs: st.one_of(  # noqa: E731
        st.sampled_from(pool),
        st.tuples(st.just("var"), st.sampled_from(vs)),
    )
    qpat = (
        data.draw(term_or_var(SUBJECTS, ["a"]), label="ts"),
        data.draw(term_or_var(PREDICATES, ["b"]), label="tp"),
        data.draw(term_or_var(OBJECTS, ["c"]), label="to"),
        data.draw(st.sampled_from(ANN_PREDS), label="ap"),
        data.draw(term_or_var(ANN_OBJS, ["x"]), label="tobj"),
    )
    with_asserted = data.draw(st.booleans(), label="with_asserted")

    sols = _match_ann(ann_rows, qpat)
    parts = [
        f"<< {_term_text(qpat[0])} {_term_text(qpat[1])} "
        f"{_term_text(qpat[2])} >> <{qpat[3]}> {_term_text(qpat[4])} ."
    ]
    if with_asserted:
        # join the quoted subject/predicate/object vars against the
        # asserted relation: the flagship's high-confidence shape
        apat = (qpat[0], qpat[1], qpat[2])
        sols = _join(sols, _match(triples, apat))
        parts.insert(
            0,
            f"{_term_text(apat[0])} {_term_text(apat[1])} "
            f"{_term_text(apat[2])} .",
        )
    text = "SELECT * WHERE { " + " ".join(parts) + " }"

    vars_ = sorted(
        {t[1] for t in qpat if isinstance(t, tuple)}
    )
    want = sorted(
        tuple(m.get(v) for v in vars_) for m in sols
    )
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(s, p, o, None) for s, p, o in triples],
            "subject string, predicate string, object string, graph string",
        ),
        annotations=spark.createDataFrame(
            ann_rows or [(None,) * 5],
            "q_s string, q_p string, q_o string, predicate string,"
            " object string",
        ).where("q_s IS NOT NULL"),
    )
    got = sorted(
        tuple(r[v] for v in vars_) for r in sparql_df(ds, text).collect()
    )
    assert got == want, f"query: {text}\nanns: {ann_rows}\ndata: {triples}"


# ---------------------------------------------------------------------------
# GRAPH / FROM / FROM NAMED dataset semantics
# ---------------------------------------------------------------------------

GRAPHS = ["http://x/g1", "http://x/g2"]


def _match_quads(quads, pat, graph_spec, from_graphs, from_named):
    """One triple pattern against the dataset:

    * outside GRAPH (graph_spec None): the default graph — the union of
      all quads when no dataset clause is given (the engine mirrors the
      reference's union-default-graph store), else exactly the FROM
      graphs (FROM NAMED-only => empty default graph);
    * GRAPH <g> / GRAPH ?v: named (non-null-graph) quads, restricted to
      FROM NAMED when any dataset clause is given (FROM-only => no named
      graphs); ?v binds the graph and never matches default-graph rows.
    """
    has_dataset = bool(from_graphs or from_named)
    out = []
    for s, p, o, g in quads:
        if graph_spec is None:
            if has_dataset and g not in from_graphs:
                continue
        else:
            if g is None:
                continue
            if has_dataset and g not in from_named:
                continue
        m = {}
        ok = True
        terms = [pat[0], pat[1], pat[2]]
        vals = [s, p, o]
        if graph_spec is not None:
            terms.append(graph_spec)
            vals.append(g)
        for term, val in zip(terms, vals):
            if isinstance(term, tuple):
                name = term[1]
                if name in m and m[name] != val:
                    ok = False
                    break
                m[name] = val
            elif term != val:
                ok = False
                break
        if ok:
            out.append(m)
    return out


@settings(max_examples=30, deadline=None, derandomize=True)
@given(data=st.data())
def test_graph_and_dataset_clauses_match_naive(spark, data):
    quads = data.draw(
        st.lists(
            st.tuples(
                st.sampled_from(SUBJECTS),
                st.sampled_from(PREDICATES),
                st.sampled_from(OBJECTS),
                st.sampled_from([None] + GRAPHS),
            ),
            min_size=0,
            max_size=10,
        ),
        label="quads",
    )
    pats = data.draw(bgp_st, label="patterns")
    specs = [
        data.draw(
            st.sampled_from(
                [None, "g1-const", "g2-const", "var"]
            ),
            label=f"gspec{i}",
        )
        for i in range(len(pats))
    ]
    from_graphs = data.draw(
        st.sampled_from([[], ["http://x/g1"], GRAPHS]), label="from"
    )
    from_named = data.draw(
        st.sampled_from([[], ["http://x/g2"], GRAPHS]), label="from_named"
    )

    def spec_term(s):
        if s is None:
            return None
        if s == "var":
            return ("var", "g")
        return f"http://x/{s.split('-')[0]}"

    sols = [{}]
    parts = []
    for pat, s in zip(pats, specs):
        gt = spec_term(s)
        sols = _join(sols, _match_quads(quads, pat, gt, from_graphs, from_named))
        if gt is None:
            parts.append(_pat_text(pat))
        else:
            parts.append(
                "GRAPH %s { %s }" % (_term_text(gt), _pat_text(pat))
            )
    dataset_clauses = "".join(
        [f" FROM <{g}>" for g in from_graphs]
        + [f" FROM NAMED <{g}>" for g in from_named]
    )
    text = (
        "SELECT *" + dataset_clauses + " WHERE { " + " ".join(parts) + " }"
    )
    vars_ = sorted(
        {t[1] for p in pats for t in p if isinstance(t, tuple)}
        | ({"g"} if "var" in specs else set())
    )
    want = sorted(
        tuple(m.get(v) for v in vars_) for m in sols
    )
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            quads or [(None,) * 4],
            "subject string, predicate string, object string, graph string",
        ).where("subject IS NOT NULL"),
        annotations=spark.createDataFrame(
            [],
            "q_s string, q_p string, q_o string, predicate string,"
            " object string",
        ),
    )
    df = sparql_df(ds, text)
    got = sorted(
        tuple(r[v] if v in df.columns else None for v in vars_)
        for r in df.collect()
    )
    assert got == want, f"query: {text}\nquads: {quads}"


# ---------------------------------------------------------------------------
# builtin calls: BIND differential against naive reimplementations
# ---------------------------------------------------------------------------

# vocabulary widened with the shapes the builtins care about: dateTime
# lexicals with/without zone, a spaced literal, a serialized quoted term,
# and the empty string
BUILTIN_OBJECTS = OBJECTS + [
    "a spaced value",
    "2025-02-01T00:00:00Z",
    "2025-02-01T00:00:00+05:30",
    "2025-02-01T00:00:00",
    "2025-02-01T24:00:00Z",       # XSD end-of-day lexical: valid
    "-2025-02-01T00:00:00Z",      # negative year: valid XSD
    "2025-02-01T00:00:00+19:00",  # offset beyond ±18:00: invalid
    "2024-13-45T99:99:99",        # shaped but semantically invalid
    "2024-01-01",                 # xsd:date, not dateTime
    "<< http://x/s1 http://x/p1 o >>",
    "",
]


def _n_ceil(v):
    import math

    if v is None or not _is_num(v):
        return None
    return math.ceil(float(v))


def _n_tz(v):
    import re as _re
    from datetime import datetime

    # TZ is defined only for valid xsd:dateTime lexicals (17.4.5.8):
    # anything else → error → unbound; zone-less dateTime → "".
    # INDEPENDENT of the engine's implementation (review finding: a
    # shared regex made the shape gate circular) but aligned with its
    # semantics (third pass: negative/5-digit years are valid XSD and
    # engine-accepted; JVM parsing rejects zone offsets beyond ±18:00
    # that fromisoformat accepts; T24:00:00[.0...] is XSD end-of-day).
    # Month/day/time validity is probed with a leap-year stand-in, so
    # the vocabulary must not lean on Feb-29-of-a-non-leap-year edges.
    if v is None:
        return None
    m = _re.match(
        r"^(-?\d{4,})-(\d{2}-\d{2})T(\d{2}:\d{2}:\d{2})(\.\d+)?"
        r"(Z|[+-]\d{2}:\d{2})?$",
        v,
    )
    if not m:
        return None
    _year, date_part, time_part, frac, zone = m.groups()
    if zone and zone != "Z":
        hh, mm = int(zone[1:3]), int(zone[4:6])
        if hh > 18 or (hh == 18 and mm > 0) or mm > 59:
            return None
    frac = frac or ""
    if time_part == "24:00:00":
        if frac and set(frac[1:]) != {"0"}:
            return None
        time_part, frac = "00:00:00", ""
    try:
        datetime.fromisoformat(f"2000-{date_part}T{time_part}{frac}")
    except ValueError:
        return None
    return zone or ""


def _n_istriple(v):
    import re as _re

    if v is None:
        return None
    return bool(_re.fullmatch(r"<< \S+ \S+ .* >>", v))


def _n_object_roundtrip(v):
    # OBJECT(TRIPLE(s, p, v)) = v for any lexical, spaces included
    return None if v is None else v


_BUILTIN_CATALOG = [
    ("CEIL({v})", _n_ceil),
    ("STRLEN({v})", lambda v: None if v is None else len(v)),
    ("UCASE({v})", lambda v: None if v is None else v.upper()),
    ("TZ({v})", _n_tz),
    ('SAMETERM({v}, "alpha")', lambda v: None if v is None else v == "alpha"),
    (
        'IRI(CONCAT("http://m/", {v}))',
        lambda v: None if v is None else "http://m/" + v,
    ),
    ("ISTRIPLE({v})", _n_istriple),
    (
        "OBJECT(TRIPLE(<http://x/s0>, <http://x/p0>, {v}))",
        _n_object_roundtrip,
    ),
    (
        "SUBJECT(TRIPLE(<http://x/s0>, <http://x/p0>, {v}))",
        lambda v: None if v is None else "http://x/s0",
    ),
    (
        "PREDICATE(TRIPLE(<http://x/s0>, <http://x/p0>, {v}))",
        lambda v: None if v is None else "http://x/p0",
    ),
    (
        # subject position: a spaced literal or serialized triple term
        # is not an IRI/bnode → TRIPLE errors → whole chain unbound
        # (oracle uses the ASCII whitespace class — Java's \\s in the
        # engine's rlike is ASCII-only, Python's \\s is Unicode-wide)
        'OBJECT(TRIPLE({v}, <http://x/p0>, "o"))',
        lambda v: None
        if v is None or __import__("re").search(r"[ \t\n\r\f\x0b]", v)
        else "o",
    ),
]


builtin_triple_st = st.tuples(
    st.sampled_from(SUBJECTS),
    st.sampled_from(PREDICATES),
    st.sampled_from(BUILTIN_OBJECTS),
)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    triples=st.lists(builtin_triple_st, min_size=0, max_size=10),
    fn_idx=st.integers(min_value=0, max_value=len(_BUILTIN_CATALOG) - 1),
    on_optional=st.booleans(),
)
def test_builtin_binds_match_naive(spark, triples, fn_idx, on_optional):
    """BIND(<builtin>(?v) AS ?d) differential: SPARQL 17.4 error→unbound
    semantics (a failed cast / unbound operand leaves ?d unbound, the
    solution survives) against naive Python reimplementations — applied
    both to an always-bound var and to a maybe-unbound OPTIONAL var."""
    render_t, naive_fn = _BUILTIN_CATALOG[fn_idx]
    src = "?c" if on_optional else "?b"
    text = f"""
        SELECT ?a ?b ?c ?d WHERE {{
            ?a <http://x/p0> ?b .
            OPTIONAL {{ ?a <http://x/p1> ?c }}
            BIND({render_t.format(v=src)} AS ?d)
        }}"""
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(s, p, o, None) for s, p, o in triples],
            "subject string, predicate string, object string, graph string",
        ),
        annotations=spark.createDataFrame(
            [],
            "q_s string, q_p string, q_o string, predicate string,"
            " object string",
        ),
    )
    base = _match(triples, (("var", "a"), "http://x/p0", ("var", "b")))
    opt = _match(triples, (("var", "a"), "http://x/p1", ("var", "c")))
    sols = _left_join(base, opt)
    want = sorted(
        (
            tuple(
                _norm(x)
                for x in (
                    m.get("a"),
                    m.get("b"),
                    m.get("c"),
                    naive_fn(m.get(src[1:])),
                )
            )
            for m in sols
        ),
        key=repr,
    )
    df = sparql_df(ds, text)
    got = sorted(
        (
            tuple(_norm(r[v]) for v in ("a", "b", "c", "d"))
            for r in df.collect()
        ),
        key=repr,
    )
    assert got == want, f"query: {text}\ndata: {triples}"
