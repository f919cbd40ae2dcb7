"""SPARQL-star translator conformance (queries/sparql.py).

The reference's serving surface speaks SPARQL: its Postman corpus
(RDF_Star_Data_Products.postman_collection.json) and query library
(sparql/batch_queries.rq) run against pyoxigraph via
fastapi_sparql_server.py /query. These tests (a) parse the reference's
ENTIRE shipped SELECT/ASK corpus, and (b) execute corpus-shaped queries
against a hand-checkable dataset modeled on the reference's DCAT data
product graph, asserting exact results.
"""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from etl_pipeline_rdf_star_spark.queries.sparql import (
    SparqlDataset,
    SparqlParseError,
    SparqlUnsupported,
    execute_sparql,
    parse_sparql,
    sparql_df,
)

EX = "http://example.org/"
DCAT = "http://www.w3.org/ns/dcat#"
DCT = "http://purl.org/dc/terms/"
PROV = "http://www.w3.org/ns/prov#"
OWL = "http://www.w3.org/2002/07/owl#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

POSTMAN = "/root/reference/RDF_Star_Data_Products.postman_collection.json"
BATCH_RQ = "/root/reference/sparql/batch_queries.rq"

PROLOGUE = f"""
PREFIX ex: <{EX}>
PREFIX dcat: <{DCAT}>
PREFIX dct: <{DCT}>
PREFIX prov: <{PROV}>
PREFIX owl: <{OWL}>
PREFIX rdfs: <{RDFS}>
PREFIX rdf: <{RDF}>
"""


def _ds(n: str) -> str:
    return f"{EX}dataset/{n}"


def _theme(n: str) -> str:
    return f"{EX}themes/{n}"


def _sys(n: str) -> str:
    return f"{EX}system/{n}"


@pytest.fixture(scope="module")
def dataset(spark) -> SparqlDataset:
    g1, g2, ont = f"{EX}graph/g1", f"{EX}graph/g2", f"{EX}graph/ontology"
    t = RDF + "type"
    triples = [
        (_ds("DS1"), t, DCAT + "Dataset", g1),
        (_ds("DS2"), t, DCAT + "Dataset", g1),
        (_ds("DS3"), t, DCAT + "Dataset", g1),
        (_ds("DS1"), DCT + "title", "Customers", g1),
        (_ds("DS2"), DCT + "title", "Orders", g1),
        (_ds("DS3"), DCT + "title", "Revenue", g1),
        (_ds("DS1"), DCAT + "theme", _theme("Finance"), g1),
        (_ds("DS2"), DCAT + "theme", _theme("Marketing"), g1),
        (_ds("DS3"), DCAT + "theme", _theme("Finance"), g1),
        (_ds("DS3"), DCAT + "theme", _theme("Risk"), g2),
        (_ds("DS4"), DCAT + "theme", _theme("Ops"), g1),
        (DCAT + "Dataset", t, OWL + "Class", ont),
        (DCAT + "Dataset", RDFS + "label", "Dataset", ont),
        (PROV + "Activity", t, OWL + "Class", ont),
    ]
    anns = []
    for ds, theme, conf, src, ts in [
        ("DS1", "Finance", "0.95", "COLLIBRA", "2025-02-01T00:00:00Z"),
        ("DS2", "Marketing", "0.80", "ATLAN", "2025-02-02T00:00:00Z"),
        ("DS3", "Finance", "0.92", "ATLAN", "2025-01-15T00:00:00Z"),
    ]:
        q = (_ds(ds), DCAT + "theme", _theme(theme))
        anns += [
            (*q, EX + "confidence", conf),
            (*q, PROV + "wasDerivedFrom", _sys(src)),
            (*q, PROV + "generatedAtTime", ts),
        ]
    return SparqlDataset(
        triples=spark.createDataFrame(
            triples, "subject string, predicate string, object string, graph string"
        ),
        annotations=spark.createDataFrame(
            anns,
            "q_s string, q_p string, q_o string, predicate string, object string",
        ),
    )


def rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


# ---------------------------------------------------------------------------
# the reference's shipped corpus parses
# ---------------------------------------------------------------------------


def _postman_queries(path: str) -> list[tuple[str, str]]:
    col = json.load(open(path))
    out = []

    def walk(items):
        for it in items:
            if "item" in it:
                walk(it["item"])
                continue
            raw = (it.get("request", {}).get("body", {}) or {}).get("raw", "")
            try:
                raw = json.loads(raw).get("query", raw)
            except Exception:
                pass
            if raw and re.search(r"\b(SELECT|ASK|CONSTRUCT)\b", raw):
                out.append((it["name"], raw))

    walk(col["item"])
    return out


@pytest.mark.skipif(not os.path.exists(POSTMAN), reason="reference absent")
def test_entire_postman_corpus_parses():
    qs = _postman_queries(POSTMAN)
    assert len(qs) >= 20
    for name, q in qs:
        parse_sparql(q)  # raises on failure


@pytest.mark.skipif(not os.path.exists(BATCH_RQ), reason="reference absent")
def test_batch_query_library_select_forms_parse():
    """batch_queries.rq is a $PARAM-templated library mixing SELECT
    queries with SPARQL-Update templates; every SELECT chunk in the
    implemented subset must parse ($PARAMS lex as plain variables)."""
    text = open(BATCH_RQ).read()
    prologue_m = re.findall(r"^PREFIX[^\n]*$", text, re.M)
    chunks = re.split(r"^# -{10,}.*$", text, flags=re.M)
    selects = [
        c for c in chunks
        if re.search(r"^\s*SELECT\b", c, re.M)
        and not re.search(r"\b(INSERT|DELETE)\b", c)
    ]
    assert len(selects) >= 20
    ok, unsupported = 0, []
    for c in selects:
        q = "\n".join(prologue_m) + "\n" + c
        try:
            parse_sparql(q)
            ok += 1
        except (SparqlUnsupported, SparqlParseError) as e:
            unsupported.append(str(e)[:80])
    # round-4: expression-level EXISTS landed — the ENTIRE shipped
    # SELECT library must parse
    assert ok == len(selects), unsupported


# ---------------------------------------------------------------------------
# execution semantics on corpus-shaped queries
# ---------------------------------------------------------------------------


def test_count_aggregate(dataset):
    # Postman 1.1 Count All Datasets
    df = sparql_df(dataset, PROLOGUE + """
        SELECT (COUNT(?dataset) as ?count) WHERE { ?dataset a dcat:Dataset . }
    """)
    assert rows(df, "count") == [(3,)]


def test_predicate_lists_order_limit(dataset):
    # Postman 1.2 shape: ';' lists + ORDER BY + LIMIT
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?dataset ?title WHERE {
            ?dataset a dcat:Dataset ; dct:title ?title .
        } ORDER BY ?dataset LIMIT 2
    """)
    assert rows(df, "dataset", "title") == [
        (_ds("DS1"), "Customers"),
        (_ds("DS2"), "Orders"),
    ]


def test_quoted_triple_high_confidence(dataset):
    # Postman 2.1: quoted-subject annotation join + numeric FILTER
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?dataset ?title ?confidence ?source WHERE {
            ?dataset dcat:theme ?theme ; dct:title ?title .
            <<?dataset dcat:theme ?theme>> ex:confidence ?confidence ;
                                           prov:wasDerivedFrom ?source .
            FILTER(?confidence > 0.90)
        } ORDER BY DESC(?confidence)
    """)
    assert rows(df, "dataset", "confidence", "source") == [
        (_ds("DS1"), "0.95", _sys("COLLIBRA")),
        (_ds("DS3"), "0.92", _sys("ATLAN")),
    ]
    # hot path stays JVM-side: no Python row evaluation in the plan
    p = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_group_by_multi_aggregate(dataset):
    # Postman 3.3: AVG/MIN/MAX/COUNT per source
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?source (COUNT(?dataset) as ?n) (AVG(?confidence) as ?avgConf)
               (MIN(?confidence) as ?minConf) (MAX(?confidence) as ?maxConf)
        WHERE {
            ?dataset dcat:theme ?theme .
            <<?dataset dcat:theme ?theme>> prov:wasDerivedFrom ?source ;
                                           ex:confidence ?confidence .
        } GROUP BY ?source ORDER BY DESC(?avgConf)
    """)
    got = rows(df, "source", "n", "avgConf", "minConf", "maxConf")
    # MIN/MAX return the group member's original lexical form (SPARQL
    # `<` ordering picks a value; it does not coerce the result)
    assert got == [
        (_sys("COLLIBRA"), 1, 0.95, "0.95", "0.95"),
        (_sys("ATLAN"), 2, 0.86, "0.80", "0.92"),
    ]


def test_optional_left_join(dataset):
    # Postman 5.1: OPTIONAL label — prov:Activity has no label row
    df = sparql_df(dataset, PROLOGUE + """
        SELECT DISTINCT ?class ?label WHERE {
            ?class a owl:Class .
            OPTIONAL { ?class rdfs:label ?label }
        } ORDER BY ?class
    """)
    assert rows(df, "class", "label") == [
        (DCAT + "Dataset", "Dataset"),
        (PROV + "Activity", None),
    ]


def test_bind_constant_anchor(dataset):
    # Postman 2.3/6.4: BIND(<iri> as ?var) then patterns join against it
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?predicate ?value WHERE {
            BIND(<http://example.org/dataset/DS1> as ?dataset)
            ?dataset ?predicate ?value .
            FILTER(?predicate != rdf:type)
        } ORDER BY ?predicate
    """)
    assert rows(df, "predicate", "value") == [
        (DCT + "title", "Customers"),
        (DCAT + "theme", _theme("Finance")),
    ]


def test_strstarts_str_filter(dataset):
    # Postman 5.4: STRSTARTS(STR(?type), ...) || ...
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?type (COUNT(?instance) as ?n) WHERE {
            ?instance a ?type .
            FILTER(STRSTARTS(STR(?type), "http://www.w3.org/ns/dcat#") ||
                   STRSTARTS(STR(?type), "http://www.w3.org/ns/prov#"))
        } GROUP BY ?type
    """)
    assert rows(df, "type", "n") == [(DCAT + "Dataset", 3)]


def test_graph_scoped_pattern(dataset):
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?theme WHERE {
            GRAPH <http://example.org/graph/g2> { ?ds dcat:theme ?theme }
        }
    """)
    assert rows(df, "theme") == [(_theme("Risk"),)]


def test_filter_not_exists_and_exists(dataset):
    # batch_queries.rq batch-diff shape: NOT EXISTS = anti join
    q = PROLOGUE + """
        SELECT ?dataset ?theme WHERE {
            ?dataset dcat:theme ?theme .
            FILTER NOT EXISTS {
                <<?dataset dcat:theme ?theme>> ex:confidence ?c .
            }
        } ORDER BY ?dataset ?theme
    """
    df = sparql_df(dataset, q)
    assert rows(df, "dataset", "theme") == [
        (_ds("DS3"), _theme("Risk")),
        (_ds("DS4"), _theme("Ops")),
    ]
    df2 = sparql_df(dataset, q.replace("NOT EXISTS", "EXISTS"))
    assert rows(df2, "dataset", "theme") == [
        (_ds("DS1"), _theme("Finance")),
        (_ds("DS2"), _theme("Marketing")),
        (_ds("DS3"), _theme("Finance")),
    ]


def test_arithmetic_in_filter(dataset):
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?dataset WHERE {
            ?dataset dcat:theme ?theme .
            <<?dataset dcat:theme ?theme>> ex:confidence ?c .
            FILTER(?c * 100 > 90)
        } ORDER BY ?dataset
    """)
    assert rows(df, "dataset") == [(_ds("DS1"),), (_ds("DS3"),)]


def test_aggregate_over_if_expression(dataset):
    # batch_queries.rq COUNT_CHANGES shape: SUM(IF(cond, 1, 0))
    df = sparql_df(dataset, PROLOGUE + """
        SELECT (SUM(IF(?source = <http://example.org/system/ATLAN>, 1, 0)) AS ?atlan)
               (COUNT(*) AS ?total)
        WHERE {
            ?dataset dcat:theme ?theme .
            <<?dataset dcat:theme ?theme>> prov:wasDerivedFrom ?source .
        }
    """)
    assert rows(df, "atlan", "total") == [(2.0, 3)]


def test_union_with_bind_tags(dataset):
    # batch diff UNION + BIND("added"/"removed" AS ?changeType)
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?dataset ?changeType WHERE {
            {
                GRAPH <http://example.org/graph/g2> { ?dataset dcat:theme ?t }
                BIND("g2-only" AS ?changeType)
            } UNION {
                ?dataset dct:title "Customers" .
                BIND("titled" AS ?changeType)
            }
        } ORDER BY ?dataset
    """)
    assert rows(df, "dataset", "changeType") == [
        (_ds("DS1"), "titled"),
        (_ds("DS3"), "g2-only"),
    ]


def test_ask_forms(dataset):
    t = execute_sparql(dataset, PROLOGUE + """
        ASK { <http://example.org/dataset/DS1> dcat:theme ?t }
    """)
    assert t == {"boolean": True}
    f = execute_sparql(dataset, PROLOGUE + """
        ASK { <http://example.org/dataset/DS9> dcat:theme ?t }
    """)
    assert f == {"boolean": False}


def test_construct_form(dataset):
    doc = execute_sparql(dataset, PROLOGUE + """
        CONSTRUCT { ?ds ex:hasTheme ?theme } WHERE { ?ds dcat:theme ?theme }
    """)
    assert doc["count"] == 5
    # reference renders CONSTRUCT results as statement strings
    assert all("hasTheme" in s for s in doc["triples"])


def test_select_json_document_shape(dataset):
    doc = execute_sparql(dataset, PROLOGUE + """
        SELECT ?title WHERE { <http://example.org/dataset/DS1> dct:title ?title }
    """)
    assert doc["head"]["vars"] == ["title"]
    assert doc["results"]["bindings"] == [
        {"title": {"type": "literal", "value": "Customers"}}
    ]


def test_unsupported_is_loud():
    with pytest.raises((SparqlUnsupported, SparqlParseError)):
        parse_sparql(
            "SELECT ?x WHERE { SERVICE <http://remote/sparql> { ?x ?p ?o } }"
        )


# -- review-finding regressions ---------------------------------------------


def test_optional_no_shared_vars_preserves_outer(dataset):
    """SPARQL left-join semantics: an OPTIONAL sharing no variables with
    the outer pattern must keep every outer solution (with the optional
    vars unbound) when the optional side matches nothing — a crossJoin
    would return 0 rows (review finding)."""
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?ds ?nope WHERE {
            ?ds a dcat:Dataset .
            OPTIONAL { ?x ex:doesNotExist ?nope }
        }""")
    got = rows(df, "ds", "nope")
    assert len(got) == 3
    assert all(n is None for _, n in got)


def test_union_branch_missing_shared_var_joins_compatibly(dataset):
    """A UNION branch that doesn't bind a shared variable yields
    solutions with it UNBOUND — compatible with any outer binding, so
    they must survive the join instead of being dropped on a null equi
    key (review finding)."""
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?ds ?theme WHERE {
            ?ds dcat:theme ?theme .
            { ?ds dct:title "Revenue" }
            UNION
            { ?ds a dcat:Dataset . ?ds dct:title ?theme }
        }""")
    # branch 1 binds only ?ds (DS3): compatible with DS3's two themes;
    # branch 2 binds ?theme to the title, matching no dcat:theme value
    got = sorted(rows(df, "ds", "theme"))
    assert got == [
        (_ds("DS3"), _theme("Finance")),
        (_ds("DS3"), _theme("Risk")),
    ]


def test_variable_free_pattern_is_single_solution(dataset):
    """A variable-free triple pattern contributes ONE solution if any
    quad matches (not one per matching quad — DS3's theme exists in two
    graphs; counting must not double; review finding)."""
    doc = execute_sparql(dataset, PROLOGUE + """
        SELECT (COUNT(?s) AS ?n) WHERE {
            ?s a dcat:Dataset .
            <http://example.org/dataset/DS3> dcat:theme <http://example.org/themes/Finance> .
        }""")
    assert doc["results"]["bindings"][0]["n"]["value"] == "3"


def test_regex_requires_literal_pattern(dataset):
    with pytest.raises(SparqlUnsupported, match="literal"):
        sparql_df(dataset, PROLOGUE + """
            SELECT ?ds WHERE {
                ?ds dct:title ?t . FILTER(regex(?t, ?t))
            }""")


def test_construct_renders_iri_objects_as_iris(dataset):
    """CONSTRUCT output must bracket IRI objects like the reference's
    str(Triple), not render them as quoted literals (review finding)."""
    doc = execute_sparql(dataset, PROLOGUE + """
        CONSTRUCT { ?ds ex:hasTheme ?theme } WHERE { ?ds dcat:theme ?theme }
    """)
    assert doc["count"] == 5
    assert all(s.endswith(">") and "<http://example.org/themes/" in s
               for s in doc["triples"])
    # literal objects still render quoted
    doc2 = execute_sparql(dataset, PROLOGUE + """
        CONSTRUCT { ?ds ex:label ?t } WHERE { ?ds dct:title ?t }
    """)
    assert all('"' in s for s in doc2["triples"])


def test_pname_statement_dot_not_swallowed(dataset):
    """'ex:Person.' with no space before the statement dot must keep the
    dot as terminator, not corrupt the IRI (review finding, verified by
    execution in review)."""
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?s WHERE { ?s a dcat:Dataset. }""")
    assert df.count() == 3


def test_graph_var_excludes_default_graph(spark):
    """GRAPH ?g ranges over NAMED graphs only: default-graph (null-graph)
    rows must not bind ?g (review finding)."""
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [
                (f"{EX}a", f"{EX}p", "v1", f"{EX}g1"),
                (f"{EX}b", f"{EX}p", "v2", None),  # default graph
            ],
            "subject string, predicate string, object string, graph string",
        ),
        annotations=None,
    )
    df = sparql_df(ds, PROLOGUE + """
        SELECT ?g ?s WHERE { GRAPH ?g { ?s ex:p ?o } }""")
    got = rows(df, "g", "s")
    assert got == [(f"{EX}g1", f"{EX}a")]


def test_select_star_hides_existence_markers(dataset):
    """SELECT * must not leak internal '_one<N>' marker columns from
    variable-free patterns (review finding)."""
    doc = execute_sparql(dataset, PROLOGUE + """
        SELECT * WHERE {
            ?s dct:title ?t .
            <http://example.org/dataset/DS1> a dcat:Dataset .
        }""")
    assert set(doc["head"]["vars"]) == {"s", "t"}


def test_ask_where_form_parses(dataset):
    """SPARQL 1.1 allows 'ASK WHERE { ... }' (review finding)."""
    doc = execute_sparql(dataset, PROLOGUE + """
        ASK WHERE { ?s a dcat:Dataset }""")
    assert doc == {"boolean": True}


def test_construct_brackets_urn_iris(spark):
    """CONSTRUCT kind sniff must use the serving _IRI_RE scheme set —
    urn:/file: objects are IRIs, not literals (review finding)."""
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(f"{EX}b1", f"{EX}isbn", "urn:isbn:0451450523", None)],
            "subject string, predicate string, object string, graph string",
        ),
        annotations=None,
    )
    doc = execute_sparql(ds, PROLOGUE + """
        CONSTRUCT { ?s ex:id ?o } WHERE { ?s ex:isbn ?o }""")
    assert doc["triples"] == [
        f"<{EX}b1> <{EX}id> <urn:isbn:0451450523>"
    ]


def test_parsed_ast_is_reusable(dataset):
    """sparql_df accepts a pre-parsed SelectQuery and must not mutate it:
    running the same AST twice has to work (review finding)."""
    q = parse_sparql(PROLOGUE + """
        SELECT (SUM(IF(?c > "0.9", 1, 0)) AS ?n) WHERE {
            <<?ds dcat:theme ?t>> ex:confidence ?c .
        }""")
    r1 = sparql_df(dataset, q).collect()
    r2 = sparql_df(dataset, q).collect()
    assert r1 == r2 and r1[0]["n"] == 2.0


def test_optional_keeps_equi_join_plan(dataset):
    """Review finding: marking every right-side column maybe-unbound
    turned ALL OPTIONALs into non-equi nested-loop joins. A plain
    OPTIONAL whose shared var is certainly bound on both sides must plan
    as a hash-joinable left join, not BroadcastNestedLoopJoin."""
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?ds ?t ?c WHERE {
            ?ds dct:title ?t .
            OPTIONAL { <<?ds dcat:theme ?th>> ex:confidence ?c }
        }""")
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # and the results are still left-join correct (DS4 title absent, DS1-3
    # have confidences, unmatched rows keep ?c null)
    got = dict(rows(df, "ds", "c"))
    assert got[_ds("DS1")] == "0.95" and len(got) == 3


def test_count_distinct_star(dataset):
    """COUNT(DISTINCT *) counts distinct solutions (review finding: the
    DISTINCT was silently ignored)."""
    doc = execute_sparql(dataset, PROLOGUE + """
        SELECT (COUNT(DISTINCT *) AS ?n) WHERE {
            { ?ds dcat:theme ?th } UNION { ?ds dcat:theme ?th }
        }""")
    assert doc["results"]["bindings"][0]["n"]["value"] == "5"


def test_construct_quoted_template_is_loud(dataset):
    with pytest.raises(SparqlUnsupported, match="template"):
        sparql_df(dataset, PROLOGUE + """
            CONSTRUCT { <<?ds dcat:theme ?t>> ex:seen "1" }
            WHERE { ?ds dcat:theme ?t }""")


# ---------------------------------------------------------------------------
# expression-level EXISTS (round-3 VERDICT missing #2)
# ---------------------------------------------------------------------------


def test_expression_exists_in_bind(dataset):
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?ds ?cls WHERE {
          ?ds a dcat:Dataset .
          BIND(IF(EXISTS { ?ds dcat:theme <http://example.org/themes/Finance> },
                  "finance", "other") AS ?cls)
        } ORDER BY ?ds
    """)
    assert rows(df, "ds", "cls") == [
        (_ds("DS1"), "finance"),
        (_ds("DS2"), "other"),
        (_ds("DS3"), "finance"),
    ]


def test_expression_exists_with_bound_conjunction(dataset):
    """The exact batch_queries.rq:561 shape:
    BIND(IF(BOUND(?x) && EXISTS { ... }, a, b) AS ?y)."""
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?ds ?flag WHERE {
          ?ds a dcat:Dataset .
          OPTIONAL {
            ?ds dcat:theme ?th .
            FILTER(?th = <http://example.org/themes/Marketing>)
          }
          BIND(IF(BOUND(?th) && EXISTS { ?ds dct:title ?t },
                  "mk-titled", "no") AS ?flag)
        } ORDER BY ?ds
    """)
    assert rows(df, "ds", "flag") == [
        (_ds("DS1"), "no"),
        (_ds("DS2"), "mk-titled"),
        (_ds("DS3"), "no"),
    ]


def test_expression_not_exists_in_disjunction(dataset):
    # NOT EXISTS as an OPERAND of || — must take the expression path,
    # not the clause-level FILTER NOT EXISTS branch
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?s WHERE {
          ?s dcat:theme ?th .
          FILTER(?th = <http://example.org/themes/Ops>
                 || NOT EXISTS { ?s a dcat:Dataset })
        }
    """)
    assert rows(df.distinct(), "s") == [(_ds("DS4"),)]


def test_expression_exists_inherits_graph_context(dataset):
    # inside GRAPH g1 the EXISTS group is scoped to g1, so DS3's Risk
    # theme (asserted only in g2) is invisible ...
    scoped = sparql_df(dataset, PROLOGUE + """
        SELECT ?ds ?m WHERE {
          GRAPH <http://example.org/graph/g1> {
            ?ds a dcat:Dataset .
            BIND(IF(EXISTS { ?ds dcat:theme <http://example.org/themes/Risk> },
                    "risk", "none") AS ?m)
          }
        } ORDER BY ?ds
    """)
    assert rows(scoped, "m") == [("none",), ("none",), ("none",)]
    # ... while the unscoped variant matches across the whole dataset
    unscoped = sparql_df(dataset, PROLOGUE + """
        SELECT ?ds ?m WHERE {
          ?ds a dcat:Dataset .
          BIND(IF(EXISTS { ?ds dcat:theme <http://example.org/themes/Risk> },
                  "risk", "none") AS ?m)
        } ORDER BY ?ds
    """)
    assert rows(unscoped, "ds", "m") == [
        (_ds("DS1"), "none"),
        (_ds("DS2"), "none"),
        (_ds("DS3"), "risk"),
    ]


# -- SPARQL 1.1 property paths ------------------------------------------------


@pytest.fixture(scope="module")
def path_ds(spark) -> SparqlDataset:
    t = RDF + "type"
    sub = RDFS + "subClassOf"
    triples = [
        (f"{EX}A", sub, f"{EX}B"),
        (f"{EX}B", sub, f"{EX}C"),
        (f"{EX}C", sub, f"{EX}D"),
        (f"{EX}x", t, f"{EX}A"),
        (f"{EX}y", t, f"{EX}C"),
        (f"{EX}x", f"{EX}knows", f"{EX}y"),
        (f"{EX}y", f"{EX}knows", f"{EX}z"),
    ]
    return SparqlDataset(
        triples=spark.createDataFrame(
            triples, "subject string, predicate string, object string"
        )
    )


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def test_path_plus_transitive(path_ds):
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?c ?d WHERE { ?c rdfs:subClassOf+ ?d }"""))
    assert got == {
        (f"{EX}A", f"{EX}B"), (f"{EX}A", f"{EX}C"), (f"{EX}A", f"{EX}D"),
        (f"{EX}B", f"{EX}C"), (f"{EX}B", f"{EX}D"), (f"{EX}C", f"{EX}D"),
    }


def test_path_star_bound_subject(path_ds):
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?d WHERE { ex:A rdfs:subClassOf* ?d }"""))
    assert got == {(f"{EX}A",), (f"{EX}B",), (f"{EX}C",), (f"{EX}D",)}


def test_path_star_bound_term_absent_from_graph(path_ds):
    # zero-length: a bound term relates to itself even when absent
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?d WHERE { ex:Nowhere rdfs:subClassOf* ?d }"""))
    assert got == {(f"{EX}Nowhere",)}


def test_path_sequence_type_ancestors(path_ds):
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?i ?cls WHERE { ?i rdf:type/rdfs:subClassOf+ ?cls }"""))
    assert got == {
        (f"{EX}x", f"{EX}B"), (f"{EX}x", f"{EX}C"), (f"{EX}x", f"{EX}D"),
        (f"{EX}y", f"{EX}D"),
    }


def test_path_inverse(path_ds):
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?cls ?i WHERE { ?cls ^rdf:type ?i }"""))
    assert got == {(f"{EX}A", f"{EX}x"), (f"{EX}C", f"{EX}y")}


def test_path_alternation(path_ds):
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?s ?o WHERE { ?s (rdf:type|ex:knows) ?o }"""))
    assert got == {
        (f"{EX}x", f"{EX}A"), (f"{EX}y", f"{EX}C"),
        (f"{EX}x", f"{EX}y"), (f"{EX}y", f"{EX}z"),
    }


def test_path_zero_or_one(path_ds):
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:x ex:knows? ?o }"""))
    assert got == {(f"{EX}x",), (f"{EX}y",)}


def test_path_inverse_star_descendants(path_ds):
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?c WHERE { ex:D ^rdfs:subClassOf+ ?c }"""))
    assert got == {(f"{EX}A",), (f"{EX}B",), (f"{EX}C",)}


def test_path_join_with_plain_pattern(path_ds):
    # path bindings join with ordinary patterns like any other frame
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?i ?peer WHERE {
            ?i rdf:type/rdfs:subClassOf* ex:C .
            ?i ex:knows ?peer .
        }"""))
    assert got == {(f"{EX}x", f"{EX}y"), (f"{EX}y", f"{EX}z")}


def test_path_unsupported_forms(path_ds):
    # variables are not path elements
    with pytest.raises(SparqlParseError, match="IRI"):
        sparql_df(path_ds, PROLOGUE + "SELECT ?s WHERE { ?s (?p)+ ?o }")
    # negated sets reject non-IRI members
    with pytest.raises(SparqlParseError, match="negated"):
        sparql_df(path_ds, PROLOGUE + "SELECT ?s WHERE { ?s !(?p) ?o }")


def test_path_inside_graph_constant(dataset):
    got = _pairs(sparql_df(dataset, PROLOGUE + """
        SELECT ?s ?o WHERE {
            GRAPH <http://example.org/graph/g2> { ?s dcat:theme|dct:title ?o }
        }"""))
    assert got == {(_ds("DS3"), _theme("Risk"))}


def test_path_inside_graph_var_unsupported(dataset):
    with pytest.raises(SparqlUnsupported, match="GRAPH"):
        sparql_df(dataset, PROLOGUE + """
            SELECT ?s WHERE { GRAPH ?g { ?s dcat:theme/dct:title ?o } }""")


def test_path_nested_closure_reflexive(path_ds):
    # review finding: zero-length must bind even when the closure is NOT
    # the outermost op (alt / seq of nullables) and the bound subject is
    # absent from the graph
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:Nowhere (rdfs:subClassOf*|ex:knows) ?o }"""))
    assert got == {(f"{EX}Nowhere",)}
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:Nowhere ex:knows?/ex:knows? ?o }"""))
    assert got == {(f"{EX}Nowhere",)}


def test_path_seq_nullable_prefix_not_overrestricted(spark):
    # review finding (second cut): a seed crossing a nullable seq prefix
    # must NOT restrict the inner closure — A's p-successors' q+ routes
    # must survive alongside A's own
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [
                (f"{EX}A", f"{EX}p", f"{EX}B"),
                (f"{EX}B", f"{EX}q", f"{EX}C"),
                (f"{EX}A", f"{EX}q", f"{EX}D"),
            ],
            "subject string, predicate string, object string",
        )
    )
    got = _pairs(sparql_df(ds, PROLOGUE + """
        SELECT ?y WHERE { ex:A ex:p?/ex:q+ ?y }"""))
    assert got == {(f"{EX}C",), (f"{EX}D",)}


def test_path_seeded_closure_matches_unseeded(path_ds):
    # bound-subject frontier search == unseeded closure filtered
    all_pairs = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?c ?d WHERE { ?c rdfs:subClassOf+ ?d }"""))
    seeded = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?d WHERE { ex:B rdfs:subClassOf+ ?d }"""))
    assert seeded == {(d,) for c, d in all_pairs if c == f"{EX}B"}
    # bound-object (reverse) frontier
    seeded_o = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?c WHERE { ?c rdfs:subClassOf+ ex:D }"""))
    assert seeded_o == {(c,) for c, d in all_pairs if d == f"{EX}D"}


def test_trailing_slash_pname_still_a_term(spark):
    # review finding: ex:doc/ (local name ending in '/') must stay one
    # pname in subject/object position — only a following path-element
    # starter turns the slash into the sequence operator
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(f"{EX}s1", f"{EX}p", f"{EX}doc/")],
            "subject string, predicate string, object string",
        )
    )
    got = _pairs(sparql_df(ds, PROLOGUE + """
        SELECT ?s WHERE { ?s ex:p ex:doc/ . }"""))
    assert got == {(f"{EX}s1",)}


def test_path_plus_of_nullable_is_star(path_ds):
    # (q?)+ ≡ q*: one ALP iteration of a nullable child matches the
    # empty route (review finding)
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:Nowhere (ex:knows?)+ ?o }"""))
    assert got == {(f"{EX}Nowhere",)}
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:x (ex:knows?)+ ?o }"""))
    assert got == {(f"{EX}x",), (f"{EX}y",), (f"{EX}z",)}


def test_path_sequence_spaced_slash(path_ds):
    # 'ex:a/ ex:b' (operator followed by whitespace) parses as a
    # sequence (review finding)
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?i ?cls WHERE { ?i rdf:type/ rdfs:subClassOf ?cls }"""))
    assert got == {(f"{EX}x", f"{EX}B"), (f"{EX}y", f"{EX}D")}


def test_path_seeded_closure_deep_chain(spark):
    # a chain deeper than the BFS round budget (32) falls back to SEEDED
    # pointer-doubling instead of raising (review finding); n=40 crosses
    # the budget without burning CI wall-clock (review finding). The side
    # branch unreachable from the seed must stay out of the result AND out
    # of the doubled hop relation (reach-restricted fallback).
    n = 40
    edges = [(f"{EX}n{i}", f"{EX}p", f"{EX}n{i+1}") for i in range(n)]
    edges += [(f"{EX}m{i}", f"{EX}p", f"{EX}m{i+1}") for i in range(5)]
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            edges, "subject string, predicate string, object string"
        )
    )
    got = _pairs(sparql_df(ds, PROLOGUE + """
        SELECT ?o WHERE { ex:n0 ex:p+ ?o }"""))
    assert got == {(f"{EX}n{i}",) for i in range(1, n + 1)}


def test_path_seeded_closure_converges_on_last_budgeted_round(spark):
    # depth exactly == the BFS budget: the loop exhausts with an empty
    # frontier and must return the finished result, not recompute via the
    # fallback (review finding)
    from etl_pipeline_rdf_star_spark.queries.sparql import _seeded_closure

    n = 32
    edges = spark.createDataFrame(
        [(f"{EX}n{i}", f"{EX}n{i+1}") for i in range(n)],
        "subject string, object string",
    )
    got = {
        r.object
        for r in _seeded_closure(edges, f"{EX}n0", bfs_rounds=n).collect()
    }
    assert got == {f"{EX}n{i}" for i in range(1, n + 1)}


def test_trailing_slash_pname_subject_with_spaced_predicate(spark):
    # review finding: 'ex:doc/ ex:p ?o' — a trailing-slash pname SUBJECT
    # followed by a spaced pname predicate — must keep the slash in the
    # subject; only PATH position turns it into the sequence operator
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(f"{EX}doc/", f"{EX}p", f"{EX}o1")],
            "subject string, predicate string, object string",
        )
    )
    got = _pairs(sparql_df(ds, PROLOGUE + """
        SELECT ?o WHERE { ex:doc/ ex:p ?o . }"""))
    assert got == {(f"{EX}o1",)}


def test_trailing_slash_pname_whole_predicate(spark):
    # a trailing-slash pname PREDICATE with a non-path-starter next token
    # (the variable object) keeps its slash
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [(f"{EX}s1", f"{EX}rel/", f"{EX}o1")],
            "subject string, predicate string, object string",
        )
    )
    got = _pairs(sparql_df(ds, PROLOGUE + """
        SELECT ?o WHERE { ex:s1 ex:rel/ ?o . }"""))
    assert got == {(f"{EX}o1",)}


def test_path_sequence_unspaced_inverse_after_slash(path_ds):
    # 'ex:a/^ex:b' — trailing-slash pname directly followed by a path
    # starter still composes as a sequence
    got = _pairs(sparql_df(path_ds, PROLOGUE + """
        SELECT ?i ?j WHERE { ?i rdf:type/^rdf:type ?j }"""))
    assert {i for i, _ in got} == {f"{EX}x", f"{EX}y"}


def test_path_double_slash_strips_exactly_one(spark):
    # 'ex:a// ex:b' — the IRI …a/ followed by the sequence operator:
    # exactly ONE trailing slash is the operator (review finding: rstrip
    # ate both)
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [
                (f"{EX}s1", f"{EX}a/", f"{EX}mid"),
                (f"{EX}mid", f"{EX}b", f"{EX}o1"),
            ],
            "subject string, predicate string, object string",
        )
    )
    got = _pairs(sparql_df(ds, PROLOGUE + """
        SELECT ?o WHERE { ex:s1 ex:a// ex:b ?o . }"""))
    assert got == {(f"{EX}o1",)}


@pytest.fixture(scope="module")
def neg_ds(spark):
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    return SparqlDataset(
        triples=spark.createDataFrame(
            [
                (f"{EX}x", f"{EX}p", f"{EX}y"),
                (f"{EX}x", f"{EX}q", f"{EX}z"),
                (f"{EX}x", rdf_type, f"{EX}C"),
                (f"{EX}w", f"{EX}r", f"{EX}x"),
            ],
            "subject string, predicate string, object string",
        )
    )


def test_negated_property_set_bare(neg_ds):
    # !ex:p — any forward edge whose predicate differs
    got = _pairs(sparql_df(neg_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:x !ex:p ?o }"""))
    assert got == {(f"{EX}C",), (f"{EX}z",)}


def test_negated_property_set_with_a_keyword(neg_ds):
    got = _pairs(sparql_df(neg_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:x !(ex:p|a) ?o }"""))
    assert got == {(f"{EX}z",)}


def test_negated_property_set_reverse_member(neg_ds):
    # the ^ member contributes REVERSED edges whose predicate is not in
    # the reverse set — ex:w -r-> ex:x reversed reaches ex:w from ex:x
    got = _pairs(sparql_df(neg_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:x !(ex:p|ex:q|a|^ex:nope) ?o }"""))
    assert got == {(f"{EX}w",)}


def test_negated_property_set_object_seed_and_seq(neg_ds):
    got = _pairs(sparql_df(neg_ds, PROLOGUE + """
        SELECT ?s WHERE { ?s !ex:q ex:y }"""))
    assert got == {(f"{EX}x",)}
    got = _pairs(sparql_df(neg_ds, PROLOGUE + """
        SELECT ?o WHERE { ex:w ex:r/!ex:p ?o }"""))
    assert got == {(f"{EX}C",), (f"{EX}z",)}


@pytest.fixture(scope="module")
def score_ds(spark):
    return SparqlDataset(
        triples=spark.createDataFrame(
            [
                (f"{EX}a", f"{EX}score", "5"),
                (f"{EX}b", f"{EX}score", "40"),
                (f"{EX}c", f"{EX}score", "11"),
            ],
            "subject string, predicate string, object string",
        )
    )


def test_order_by_expression_desc(score_ds):
    # ORDER BY DESC(arith expr) — previously SparqlUnsupported
    rows = sparql_df(score_ds, PROLOGUE + """
        SELECT ?s ?v WHERE { ?s ex:score ?v } ORDER BY DESC(?v * 2)
        """).collect()
    assert [r.s for r in rows] == [f"{EX}b", f"{EX}c", f"{EX}a"]


def test_order_by_bracketted_builtin(score_ds):
    rows = sparql_df(score_ds, PROLOGUE + """
        SELECT ?s ?v WHERE { ?s ex:score ?v } ORDER BY (STRLEN(?v)) ?s
        """).collect()
    assert rows[0].s == f"{EX}a"  # shortest literal first


def test_order_by_desc_var_fast_path(score_ds):
    # DESC(?var) keeps the numeric-aware two-key sort
    rows = sparql_df(score_ds, PROLOGUE + """
        SELECT ?s ?v WHERE { ?s ex:score ?v } ORDER BY DESC(?v)
        """).collect()
    assert [r.v for r in rows] == ["40", "11", "5"]


def test_path_trailing_slash_before_a_keyword(spark):
    # 'ex:rel/ a' — the 'a' keyword (rdf:type) is a path element, so the
    # trailing slash is the sequence operator (review finding)
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [
                (f"{EX}s1", f"{EX}rel", f"{EX}mid"),
                (f"{EX}mid", rdf_type, f"{EX}C"),
            ],
            "subject string, predicate string, object string",
        )
    )
    got = _pairs(sparql_df(ds, PROLOGUE + """
        SELECT ?c WHERE { ex:s1 ex:rel/ a ?c . }"""))
    assert got == {(f"{EX}C",)}


# ---------------------------------------------------------------------------
# SPARQL 1.1 VALUES / MINUS / HAVING / GROUP_CONCAT / SAMPLE / subqueries
# ---------------------------------------------------------------------------


def test_values_in_group(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?t WHERE {
            ?d dcat:theme ?t .
            VALUES ?t { ex:themes/Finance ex:themes/Ops }
        }"""), "d", "t")
    assert sorted(rows_) == [
        (_ds("DS1"), _theme("Finance")),
        (_ds("DS3"), _theme("Finance")),
        (_ds("DS4"), _theme("Ops")),
    ]


def test_values_row_form_with_undef(dataset):
    # UNDEF cell = wildcard: the ("python-free" row) binds ?z for every
    # theme, the bound row only for Finance
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?t ?z WHERE {
            ?d dcat:theme ?t .
            VALUES (?t ?z) { (ex:themes/Finance "F") (UNDEF "ANY") }
        }"""), "d", "t", "z")
    anyrows = [r for r in rows_ if r[2] == "ANY"]
    frows = [r for r in rows_ if r[2] == "F"]
    assert len(anyrows) == 5  # every theme assertion
    assert sorted(frows) == [
        (_ds("DS1"), _theme("Finance"), "F"),
        (_ds("DS3"), _theme("Finance"), "F"),
    ]


def test_trailing_values_clause(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?t WHERE { ?d dcat:theme ?t }
        VALUES ?t { ex:themes/Risk }"""), "d", "t")
    assert rows_ == [(_ds("DS3"), _theme("Risk"))]


def test_values_parse_errors():
    with pytest.raises(SparqlParseError):
        parse_sparql("SELECT ?x WHERE { VALUES ?x { ?y } }")
    with pytest.raises(SparqlParseError):
        parse_sparql(
            'SELECT ?x WHERE { VALUES (?x ?y) { ("a") } }'
        )  # arity mismatch


def test_minus_removes_compatible_overlapping(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d WHERE {
            ?d a dcat:Dataset .
            MINUS { ?d dcat:theme ex:themes/Finance }
        }"""), "d")
    assert rows_ == [(_ds("DS2"),)]


def test_minus_disjoint_domain_removes_nothing(dataset):
    # MINUS whose right side shares no variables: dom(mu) ∩ dom(mu') = ∅,
    # so nothing is removed (the spec divergence from NOT EXISTS)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d WHERE {
            ?d a dcat:Dataset .
            MINUS { ?x dcat:theme ex:themes/Finance }
        }"""), "d")
    assert len(rows_) == 3


def test_having_aggregate_call(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d (COUNT(?t) AS ?n) WHERE { ?d dcat:theme ?t }
        GROUP BY ?d HAVING(COUNT(?t) > 1)"""), "d", "n")
    assert rows_ == [(_ds("DS3"), 2)]


def test_having_references_select_alias(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d (COUNT(?t) AS ?n) WHERE { ?d dcat:theme ?t }
        GROUP BY ?d HAVING(?n > 1)"""), "d", "n")
    assert rows_ == [(_ds("DS3"), 2)]


def test_having_without_grouping_rejected(dataset):
    with pytest.raises(SparqlUnsupported):
        sparql_df(dataset, PROLOGUE + """
            SELECT ?d WHERE { ?d a dcat:Dataset } HAVING(?d > "a")""")


def test_group_concat_separator(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d (GROUP_CONCAT(?t; SEPARATOR=",") AS ?themes)
        WHERE { ?d dcat:theme ?t } GROUP BY ?d"""), "d", "themes")
    got = dict(rows_)
    assert got[_ds("DS3")] == f"{_theme('Finance')},{_theme('Risk')}"
    assert got[_ds("DS2")] == _theme("Marketing")


def test_group_concat_distinct_default_sep(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT (GROUP_CONCAT(DISTINCT ?t) AS ?all_themes)
        WHERE { ?d dcat:theme ?t }"""), "all_themes")
    # sorted distinct themes, space-joined (the spec default separator)
    assert rows_[0][0] == " ".join(
        sorted([_theme("Finance"), _theme("Marketing"),
                _theme("Ops"), _theme("Risk")])
    )


def test_sample_is_deterministic(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d (SAMPLE(?t) AS ?one) WHERE { ?d dcat:theme ?t }
        GROUP BY ?d"""), "d", "one")
    got = dict(rows_)
    assert got[_ds("DS3")] == _theme("Finance")  # min() choice


def test_subquery_joins_outer_pattern(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?title ?n WHERE {
            ?d dct:title ?title .
            { SELECT ?d (COUNT(?t) AS ?n)
              WHERE { ?d dcat:theme ?t } GROUP BY ?d }
        }"""), "d", "title", "n")
    assert sorted(rows_) == [
        (_ds("DS1"), "Customers", 1),
        (_ds("DS2"), "Orders", 1),
        (_ds("DS3"), "Revenue", 2),
    ]


def test_subquery_with_having_and_values(dataset):
    # a subselect carrying its own HAVING, joined against a VALUES block
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?n WHERE {
            VALUES ?d { ex:dataset/DS3 ex:dataset/DS2 }
            { SELECT ?d (COUNT(?t) AS ?n)
              WHERE { ?d dcat:theme ?t } GROUP BY ?d HAVING(COUNT(?t) > 1) }
        }"""), "d", "n")
    assert rows_ == [(_ds("DS3"), 2)]


# -- review-finding regressions (SPARQL 1.1 additions) ------------------------


def test_construct_trailing_values_restricts(dataset):
    # trailing VALUES on CONSTRUCT parsed but was silently ignored
    df = sparql_df(dataset, PROLOGUE + """
        CONSTRUCT { ?d ex:keptTheme ?t } WHERE { ?d dcat:theme ?t }
        VALUES ?t { ex:themes/Risk }""")
    got = rows(df, "subject", "object")
    assert got == [(_ds("DS3"), _theme("Risk"))]


def test_subquery_inherits_graph_context(dataset):
    # GRAPH <g2> { { SELECT ... } } must scope inner patterns to g2
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?t WHERE {
            GRAPH <http://example.org/graph/g2> {
                { SELECT ?d ?t WHERE { ?d dcat:theme ?t } }
            }
        }"""), "d", "t")
    assert rows_ == [(_ds("DS3"), _theme("Risk"))]


def test_subquery_inherits_outer_from(dataset):
    # a subquery without its own dataset clause uses the outer FROM
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?n FROM <http://example.org/graph/g2> WHERE {
            { SELECT (COUNT(*) AS ?n) WHERE { ?d dcat:theme ?t } }
        }"""), "n")
    assert rows_ == [(1,)]


def test_trailing_values_var_dropped_by_aggregate_projection(dataset):
    # an unprojected trailing-VALUES var must not leak into the schema
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?d (COUNT(?t) AS ?n) WHERE { ?d dcat:theme ?t }
        GROUP BY ?d VALUES ?z { "a" "b" }""")
    assert df.columns == ["d", "n"]
    assert df.count() == 8  # 4 datasets x 2 VALUES rows (join pre-projection)


def test_user_alias_hv_prefix_not_hidden(dataset):
    # ?_hv0 is a legal variable; it must not be mistaken for a hidden
    # HAVING aggregate and dropped
    df = sparql_df(dataset, PROLOGUE + """
        SELECT ?d (COUNT(?t) AS ?_hv0) WHERE { ?d dcat:theme ?t }
        GROUP BY ?d HAVING(COUNT(?t) > 1)""")
    assert df.columns == ["d", "_hv0"]
    assert rows(df, "d", "_hv0") == [(_ds("DS3"), 2)]


def test_group_concat_over_computed_numeric(dataset):
    # GROUP_CONCAT over a BIND-computed double must stringify, not crash
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT (GROUP_CONCAT(?n; SEPARATOR=",") AS ?ns) WHERE {
            ?d dcat:theme ?t .
            BIND(1.0 + 1.0 AS ?n)
        }"""), "ns")
    assert rows_[0][0].count("2") == 5


# -- SPARQL 1.1 string/date builtins ------------------------------------------


def test_strbefore_strafter(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?pre ?post WHERE {
            ?d dct:title ?t .
            BIND(STRBEFORE(?t, "e") AS ?pre)
            BIND(STRAFTER(?t, "e") AS ?post)
            FILTER(?d = ex:dataset/DS3)
        }"""), "d", "pre", "post")
    assert rows_ == [(_ds("DS3"), "R", "venue")]


def test_strbefore_no_match_and_empty_pattern(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?none ?empty_b ?empty_a WHERE {
            ?d dct:title ?t .
            BIND(STRBEFORE(?t, "zzz") AS ?none)
            BIND(STRBEFORE(?t, "") AS ?empty_b)
            BIND(STRAFTER(?t, "") AS ?empty_a)
            FILTER(?d = ex:dataset/DS2)
        }"""), "none", "empty_b", "empty_a")
    assert rows_ == [("", "", "Orders")]


def test_replace_and_substr(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?r ?s3 ?s2 WHERE {
            ?d dct:title ?t .
            BIND(REPLACE(?t, "[aeiou]", "_") AS ?r)
            BIND(SUBSTR(?t, 2, 3) AS ?s3)
            BIND(SUBSTR(?t, 4) AS ?s2)
            FILTER(?d = ex:dataset/DS1)
        }"""), "r", "s3", "s2")
    assert rows_ == [("C_st_m_rs", "ust", "tomers")]


def test_date_accessors(dataset):
    # generatedAtTime annotations carry xsd:dateTime lexicals
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?y ?m WHERE {
            <<?d dcat:theme ?t>> prov:generatedAtTime ?ts .
            BIND(YEAR(?ts) AS ?y)
            BIND(MONTH(?ts) AS ?m)
            FILTER(MONTH(?ts) = 1)
        }"""), "d", "y", "m")
    assert rows_ == [(_ds("DS3"), 2025, 1)]


# -- second-pass review-finding regressions -----------------------------------


def test_construct_values_threads_maybe_set(dataset):
    # OPTIONAL-unbound ?src must join the VALUES row as a compatible
    # mapping (unbound matches anything), not drop to 0 triples
    df = sparql_df(dataset, PROLOGUE + """
        CONSTRUCT { ?d ex:src ?who } WHERE {
            ?d a dcat:Dataset .
            OPTIONAL { <<?d dcat:theme ?t>> prov:wasDerivedFrom ?who .
                       FILTER(?who = ex:system/NOPE) }
        } VALUES ?who { ex:system/FALLBACK }""")
    got = rows(df, "subject", "object")
    assert sorted(got) == [
        (_ds("DS1"), _sys("FALLBACK")),
        (_ds("DS2"), _sys("FALLBACK")),
        (_ds("DS3"), _sys("FALLBACK")),
    ]


def test_ask_trailing_values(dataset):
    # ASK must honor its ValuesClause: restricting to a theme that does
    # not exist flips the answer to false
    df = sparql_df(dataset, PROLOGUE + """
        ASK WHERE { ?d dcat:theme ?t } VALUES ?t { ex:themes/NOPE }""")
    assert df.limit(1).count() == 0
    df2 = sparql_df(dataset, PROLOGUE + """
        ASK WHERE { ?d dcat:theme ?t } VALUES ?t { ex:themes/Risk }""")
    assert df2.limit(1).count() == 1


def test_year_over_non_datetime_is_unbound(dataset):
    # ANSI mode: a non-dateTime lexical must yield unbound, not abort
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?y WHERE {
            ?d dct:title ?t .
            BIND(YEAR(?t) AS ?y)
            FILTER(?d = ex:dataset/DS1)
        }"""), "d", "y")
    assert rows_ == [(_ds("DS1"), None)]


def test_subquery_inside_graph_var_rejected(dataset):
    with pytest.raises(SparqlUnsupported):
        parse_sparql(PROLOGUE + """
            SELECT ?g ?d WHERE {
                GRAPH ?g { { SELECT ?d WHERE { ?d dcat:theme ?t } } }
            }""")


def test_strbefore_null_propagates(dataset):
    # STRBEFORE of an unbound var stays unbound (not "")
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?p WHERE {
            ?d a dcat:Dataset .
            OPTIONAL { ?d dct:title ?t . FILTER(?t = "NOPE") }
            BIND(STRBEFORE(?t, "e") AS ?p)
            FILTER(!BOUND(?p))
        }"""), "d", "p")
    assert len(rows_) == 3 and all(p is None for _, p in rows_)


def test_subquery_own_dataset_not_merged(dataset):
    # a subquery declaring FROM uses ONLY its own dataset — it must not
    # inherit the outer FROM NAMED, so its GRAPH pattern matches nothing
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?t FROM NAMED <http://example.org/graph/g2> WHERE {
            OPTIONAL {
              { SELECT ?d ?t FROM <http://example.org/graph/g1>
                WHERE { GRAPH ?gg { ?d dcat:theme ?t } } }
            }
            ?d a dcat:Dataset .
        }"""), "d", "t")
    assert all(t is None for _, t in rows_)


def test_group_key_named_hv_no_collision(dataset):
    # GROUP BY ?_hv1 must not collide with the synthesized HAVING alias
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?_hv1 (COUNT(?t) AS ?n) WHERE {
            ?d dcat:theme ?t . BIND(STR(?d) AS ?_hv1)
        } GROUP BY ?_hv1 HAVING(COUNT(?t) > 1)"""), "_hv1", "n")
    assert rows_ == [(_ds("DS3"), 2)]


def test_substr_xpath_nonpositive_start(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?a ?b WHERE {
            ?d dct:title ?t . FILTER(?d = ex:dataset/DS1)
            BIND(SUBSTR("motor", 0, 3) AS ?a)
            BIND(SUBSTR("abc", 0 - 2, 2) AS ?b)
        }"""), "a", "b")
    assert rows_ == [("mo", "")]


# -- [NOT] IN, term tests, hash builtins --------------------------------------


def test_in_and_not_in(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?t WHERE {
            ?d dcat:theme ?t .
            FILTER(?t IN (ex:themes/Finance, ex:themes/Ops))
        }"""), "d", "t")
    assert len(rows_) == 3
    rows2 = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?t WHERE {
            ?d dcat:theme ?t .
            FILTER(?t NOT IN (ex:themes/Finance, ex:themes/Ops))
        }"""), "d", "t")
    assert sorted(t for _, t in rows2) == [_theme("Marketing"), _theme("Risk")]


def test_in_numeric_dispatch(dataset):
    # numeric IN members force numeric comparison of lexical values
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d ?c WHERE {
            <<?d dcat:theme ?t>> ex:confidence ?c .
            FILTER(?c IN (0.95, 0.80))
        }"""), "d", "c")
    assert sorted(rows_) == [(_ds("DS1"), "0.95"), (_ds("DS2"), "0.80")]


def test_term_kind_tests(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?o (ISIRI(?o) AS ?iri) (ISLITERAL(?o) AS ?lit)
               (ISNUMERIC(?o) AS ?num) WHERE {
            ex:dataset/DS1 ?p ?o .
        }"""), "o", "iri", "lit", "num")
    got = {o: (i, l, n) for o, i, l, n in rows_}
    assert got["Customers"] == (False, True, False)
    assert got[_theme("Finance")] == (True, False, False)
    rows2 = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?c (ISNUMERIC(?c) AS ?n) WHERE {
            <<ex:dataset/DS1 dcat:theme ?t>> ex:confidence ?c .
        }"""), "c", "n")
    assert rows2 == [("0.95", True)]


def test_hash_and_encode_builtins(dataset):
    import hashlib
    from urllib.parse import quote

    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?h ?e WHERE {
            ?d dct:title ?t . FILTER(?d = ex:dataset/DS1)
            BIND(SHA256(?t) AS ?h)
            BIND(ENCODE_FOR_URI("a b/c") AS ?e)
        }"""), "h", "e")
    h, e = rows_[0]
    assert h == hashlib.sha256(b"Customers").hexdigest()
    assert e == quote("a b/c", safe="")


# -- third-pass review-finding regressions ------------------------------------


def test_in_numeric_over_heterogeneous_column(dataset):
    # numeric IN over a mixed object column: non-numeric lexicals are a
    # type error (no match), not an ANSI cast crash
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?o WHERE {
            ex:dataset/DS1 ?p ?o .
            FILTER(?o IN (1, 2))
        }"""), "o")
    assert rows_ == []


def test_numeric_compare_over_heterogeneous_column(dataset):
    # same class for plain comparisons: IRIs/strings don't crash the job
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?o WHERE { ex:dataset/DS1 ?p ?o . FILTER(?o > 100) }"""), "o")
    assert rows_ == []


def test_encode_for_uri_xpath_deviations(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?e WHERE {
            ?d dct:title ?t . FILTER(?d = ex:dataset/DS1)
            BIND(ENCODE_FOR_URI("a~b*c d") AS ?e)
        }"""), "e")
    assert rows_ == [("a~b%2Ac%20d",)]


def test_ask_limit_zero_is_false(dataset):
    df = sparql_df(dataset, PROLOGUE + """
        ASK WHERE { ?d a dcat:Dataset } LIMIT 0""")
    assert df.limit(1).count() == 0


def test_select_expr_reusing_inscope_var_rejected(dataset):
    with pytest.raises(SparqlParseError):
        parse_sparql(PROLOGUE + """
            SELECT ?t (UCASE(?d) AS ?t) WHERE { ?d dct:title ?t }""")


def test_select_star_with_expression_rejected(dataset):
    with pytest.raises(SparqlParseError):
        parse_sparql(PROLOGUE + """
            SELECT * (STRLEN(?t) AS ?l) WHERE { ?d dct:title ?t }""")


# -- fourth-pass review-finding regressions -----------------------------------


def test_sum_avg_error_on_non_numeric_member(dataset):
    # SUM/AVG over a group containing a non-numeric lexical is a SPARQL
    # type error -> the aggregate is unbound, NOT a partial sum over the
    # castable members (review finding)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT (SUM(?o) AS ?s) (AVG(?o) AS ?a) WHERE {
            ex:dataset/DS1 ?p ?o .
        }"""), "s", "a")
    assert rows_ == [(None, None)]
    # ...while an all-numeric group still sums
    rows2 = rows(sparql_df(dataset, PROLOGUE + """
        SELECT (SUM(?c) AS ?s) WHERE {
            <<?d dcat:theme ?t>> ex:confidence ?c .
        }"""), "s")
    assert rows2 == [(2.67,)]


def test_min_max_over_strings(dataset):
    # MIN/MAX use the `<` ordering, which exists for strings too (review
    # finding: a blanket double cast returned unbound for titles)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT (MIN(?t) AS ?lo) (MAX(?t) AS ?hi) WHERE {
            ?d dct:title ?t .
        }"""), "lo", "hi")
    assert rows_ == [("Customers", "Revenue")]


def test_min_orders_numeric_lexicals_numerically(spark):
    # "9" < "10" numerically even though "10" < "9" lexically
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [("s1", EX + "n", "9", None), ("s2", EX + "n", "10", None)],
            "subject string, predicate string, object string, graph string",
        ),
        annotations=spark.createDataFrame(
            [],
            "q_s string, q_p string, q_o string, predicate string, object string",
        ),
    )
    rows_ = rows(sparql_df(ds, PROLOGUE + """
        SELECT (MIN(?v) AS ?lo) (MAX(?v) AS ?hi)
        WHERE { ?s <http://example.org/n> ?v }"""), "lo", "hi")
    assert rows_ == [("9", "10")]


def test_select_star_subquery_vars_are_in_scope(dataset):
    # a SELECT * subquery projects everything its WHERE binds, so a
    # select expression reusing one of those vars must be rejected
    # (review finding: '*' was treated as binding nothing)
    with pytest.raises(SparqlParseError):
        parse_sparql(PROLOGUE + """
            SELECT (1 AS ?o) WHERE {
                { SELECT * WHERE { ?s ?p ?o } }
            }""")


def test_duplicate_select_expression_alias_rejected(dataset):
    # SPARQL 18.2.1: a target assigned earlier in the SAME select clause
    # is in scope for later expressions' targets
    with pytest.raises(SparqlParseError):
        parse_sparql(PROLOGUE + """
            SELECT (1 AS ?x) (2 AS ?x) WHERE { ?s ?p ?o }""")


def test_select_expression_vs_trailing_values_rejected(dataset):
    with pytest.raises(SparqlParseError):
        parse_sparql(PROLOGUE + """
            SELECT (1 AS ?x) WHERE { ?s ?p ?o } VALUES ?x { 2 }""")


def test_construct_applies_offset_and_limit_to_solutions(dataset):
    # modifiers slice the ORDERED solution sequence before template
    # instantiation (review finding: OFFSET was dropped entirely)
    doc = execute_sparql(dataset, PROLOGUE + """
        CONSTRUCT { ?d ex:title ?t } WHERE { ?d dct:title ?t }
        ORDER BY ?t OFFSET 1 LIMIT 1""")
    assert doc["count"] == 1
    assert "Orders" in doc["triples"][0]


def test_in_mixed_member_list_matches_string(dataset):
    # ?o IN ("Customers", 1) = (?o = "Customers") || (?o = 1): the string
    # member must still match even though another member is numeric
    # (review finding: one whole-list cast nulled the string comparison)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?t WHERE {
            ex:dataset/DS1 dct:title ?t .
            FILTER(?t IN ("Customers", 1))
        }"""), "t")
    assert rows_ == [("Customers",)]


# -- DESCRIBE (SPARQL 1.1 §16.4) ----------------------------------------------


def test_describe_iri(dataset):
    # subject-CBD of an explicit resource, no WHERE clause
    doc = execute_sparql(dataset, PROLOGUE + """
        DESCRIBE <http://example.org/dataset/DS1>""")
    assert doc["count"] == 3  # type, title, theme
    assert all("<http://example.org/dataset/DS1>" in s for s in doc["triples"])


def test_describe_var_with_where(dataset):
    # nodes come from the WHERE solutions; DS1/DS3 share the Finance theme
    df = sparql_df(dataset, PROLOGUE + """
        DESCRIBE ?d WHERE { ?d dcat:theme <http://example.org/themes/Finance> }""")
    rows_ = rows(df, "subject", "predicate", "object", "object_kind")
    assert {r[0] for r in rows_} == {_ds("DS1"), _ds("DS3")}
    assert len(rows_) == 7  # 3 DS1 + 4 DS3 (two themes)
    kinds = {(r[1], r[3]) for r in rows_}
    assert (DCAT + "theme", "iri") in kinds
    assert (DCT + "title", "literal") in kinds


def test_describe_mixed_iri_and_var(dataset):
    df = sparql_df(dataset, PROLOGUE + """
        DESCRIBE ?d <http://example.org/dataset/DS2>
        WHERE { ?d dct:title "Customers" }""")
    assert {r["subject"] for r in df.collect()} == {_ds("DS1"), _ds("DS2")}


def test_describe_star(dataset):
    # DESCRIBE * describes every variable the WHERE binds — here both the
    # dataset and its (IRI) theme
    df = sparql_df(dataset, PROLOGUE + """
        DESCRIBE * WHERE {
            ?d dcat:theme ?t . FILTER(?d = <http://example.org/dataset/DS2>)
        }""")
    subjects = {r["subject"] for r in df.collect()}
    assert subjects == {_ds("DS2")}  # the theme IRI has no asserted triples


def test_describe_parse_errors(dataset):
    with pytest.raises(SparqlParseError):
        parse_sparql("DESCRIBE")
    with pytest.raises(SparqlParseError):
        parse_sparql("DESCRIBE ?x")  # var without WHERE
    with pytest.raises(SparqlParseError):
        parse_sparql("DESCRIBE * <http://example.org/x>")
    with pytest.raises(SparqlParseError):
        # var not bound by the WHERE pattern
        sparql_df(dataset, PROLOGUE + """
            DESCRIBE ?nope WHERE { ?d dct:title ?t }""")


def test_describe_limit_slices_solutions(dataset):
    # LIMIT bounds the WHERE solution sequence (ordered for determinism),
    # not the output triples
    df = sparql_df(dataset, PROLOGUE + """
        DESCRIBE ?d WHERE { ?d a dcat:Dataset } ORDER BY ?d LIMIT 1""")
    assert {r["subject"] for r in df.collect()} == {_ds("DS1")}


def test_describe_broadcasts_explicit_iri_node_set(dataset):
    # an explicit-IRI node set is bounded by the query text: it must
    # broadcast-semi-join the triple scan, never shuffle the triples.
    # A var-derived node set grows with the data, so its join strategy
    # is left to Catalyst/AQE (no forced broadcast — review finding).
    df = sparql_df(dataset, PROLOGUE + """
        DESCRIBE <http://example.org/dataset/DS1>
                 <http://example.org/dataset/DS2>""")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_describe_values_keeps_optional_unbound_compatible(dataset):
    # trailing VALUES joins as a compatible mapping: a solution whose
    # OPTIONAL var is unbound is compatible with every VALUES row and
    # must still be described (review finding: an empty left maybe-set
    # inner-equi-joined on the null key and dropped it)
    df = sparql_df(dataset, PROLOGUE + """
        DESCRIBE ?c WHERE {
            ?c a owl:Class .
            OPTIONAL { ?c rdfs:label ?label }
        } VALUES ?label { "Dataset" }""")
    subjects = {r["subject"] for r in df.collect()}
    # dcat:Dataset has the label; prov:Activity has NO label row but its
    # unbound ?label is compatible with the VALUES binding
    assert subjects == {DCAT + "Dataset", PROV + "Activity"}


def test_describe_explicit_iris_survive_modifiers_and_empty_solutions(dataset):
    # SPARQL 1.1 §16.4: explicit IRIs are described regardless of the
    # solution sequence — modifiers/VALUES shape only the var-derived
    # nodes (review finding: the WHERE-less branch once sliced IRIs away
    # on LIMIT 0 while the WHERE branch kept them)
    for q in (
        "DESCRIBE <http://example.org/dataset/DS1> LIMIT 0",
        "DESCRIBE <http://example.org/dataset/DS1> OFFSET 1",
        "DESCRIBE <http://example.org/dataset/DS1> WHERE { ?d a ex:Nothing }",
        """DESCRIBE <http://example.org/dataset/DS1> ?d
           WHERE { ?d a dcat:Dataset } ORDER BY ?d LIMIT 0""",
    ):
        df = sparql_df(dataset, PROLOGUE + q)
        assert {r["subject"] for r in df.collect()} == {_ds("DS1")}, q
    with pytest.raises(SparqlUnsupported):
        sparql_df(dataset, PROLOGUE + """
            DESCRIBE <http://example.org/dataset/DS1> WHERE { FILTER(true) }""")


def test_describe_star_skips_internal_marker_columns(dataset):
    # a constant-only existence pattern contributes an internal _oneN
    # column; DESCRIBE * must not treat it as a described node
    df = sparql_df(dataset, PROLOGUE + """
        DESCRIBE * WHERE {
            ?d dct:title "Customers" .
            <http://example.org/dataset/DS2> a dcat:Dataset .
        }""")
    assert {r["subject"] for r in df.collect()} == {_ds("DS1")}


def test_group_by_rejected_on_non_select_forms(dataset):
    with pytest.raises(SparqlUnsupported):
        sparql_df(dataset, PROLOGUE + """
            DESCRIBE ?d WHERE { ?d a dcat:Dataset } GROUP BY ?d""")
    with pytest.raises(SparqlUnsupported):
        sparql_df(dataset, PROLOGUE + """
            ASK WHERE { ?d a dcat:Dataset } GROUP BY ?d""")


def test_user_var_named_like_marker_is_not_stripped(dataset):
    # ?_one5 is a legal SPARQL variable; internal markers now contain
    # '#' (unlexable in a var name) so name-based filters cannot strip
    # user variables (review finding)
    df = sparql_df(dataset, PROLOGUE + """
        SELECT * WHERE { ?_one5 dct:title "Customers" }""")
    assert [r["_one5"] for r in df.collect()] == [_ds("DS1")]
    ddf = sparql_df(dataset, PROLOGUE + """
        DESCRIBE * WHERE { ?_one5 dct:title "Customers" }""")
    assert {r["subject"] for r in ddf.collect()} == {_ds("DS1")}


# -- SPARQL 1.1 builtin completion + SPARQL-star triple-term accessors --------


def test_ceil_and_numeric_dispatch(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?c WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(CEIL(STRLEN(?t) / 4) AS ?c)
        }"""), "c")
    # "Customers" = 9 chars; ceil(9/4) = 3
    assert rows_ == [(3,)]
    # CEIL forces numeric comparison dispatch
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?t WHERE {
            ?d dct:title ?t . FILTER(CEIL(STRLEN(?t) / 4) = 2)
        } ORDER BY ?t"""), "t")
    assert rows_ == [("Orders",), ("Revenue",)]


def test_sameterm_is_exact_not_value_equality(dataset):
    # "01" and "1" are = under numeric dispatch but NOT the same term
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?eq ?st WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(IF("01" = 1, "y", "n") AS ?eq)
            BIND(IF(SAMETERM("01", "1"), "y", "n") AS ?st)
        }"""), "eq", "st")
    assert rows_ == [("y", "n")]
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d WHERE {
            ?d dct:title ?t . FILTER(sameTerm(?t, "Orders"))
        }"""), "d")
    assert rows_ == [(_ds("DS2"),)]


def test_iri_minting_identity(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?minted WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(IRI(CONCAT("http://example.org/title/", ?t)) AS ?minted)
        }"""), "minted")
    assert rows_ == [("http://example.org/title/Customers",)]


def test_tz_of_datetime_lexical(dataset):
    # generatedAtTime annotation lexicals end in Z; a bare date has no tz
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?tz ?none WHERE {
            << ex:dataset/DS1 dcat:theme ex:themes/Finance >>
                prov:generatedAtTime ?ts .
            BIND(TZ(?ts) AS ?tz)
            BIND(TZ("2025-02-01T00:00:00") AS ?none)
        }"""), "tz", "none")
    assert rows_ == [("Z", "")]


def test_uuid_struuid_rand_shapes(dataset):
    import re as _re

    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?u ?su ?r WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(UUID() AS ?u) BIND(STRUUID() AS ?su) BIND(RAND() AS ?r)
        }"""), "u", "su", "r")
    u, su, r = rows_[0]
    hex_ = r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    assert _re.fullmatch("urn:uuid:" + hex_, u)
    assert _re.fullmatch(hex_, su)
    assert 0.0 <= r < 1.0


def test_triple_term_roundtrip(dataset):
    # TRIPLE mints the serialized quoted-term form; the accessors and
    # isTRIPLE round-trip it
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?is ?s ?p ?o WHERE {
            ex:dataset/DS2 dcat:theme ?th .
            BIND(TRIPLE(ex:dataset/DS2, dcat:theme, ?th) AS ?t)
            BIND(isTRIPLE(?t) AS ?is)
            BIND(SUBJECT(?t) AS ?s)
            BIND(PREDICATE(?t) AS ?p)
            BIND(OBJECT(?t) AS ?o)
        }"""), "is", "s", "p", "o")
    assert rows_ == [(True, _ds("DS2"), DCAT + "theme", _theme("Marketing"))]


def test_triple_accessors_unbound_on_non_triple(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?is ?s WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(isTRIPLE(?t) AS ?is)
            BIND(SUBJECT(?t) AS ?s)
        }"""), "is", "s")
    assert rows_ == [(False, None)]


def test_object_accessor_keeps_spaced_literal_whole(spark):
    # a quoted object literal with spaces survives the greedy capture
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            [("http://x/r", "http://x/claims",
              '<< http://x/s http://x/p some spaced value >>')],
            "subject string, predicate string, object string",
        )
    )
    rows_ = rows(sparql_df(ds, """
        SELECT ?o2 WHERE {
            ?r <http://x/claims> ?t .
            FILTER(isTRIPLE(?t))
            BIND(OBJECT(?t) AS ?o2)
        }"""), "o2")
    assert rows_ == [("some spaced value",)]


def test_tz_non_datetime_is_unbound(dataset):
    # TZ is defined only for dateTime: a plain literal leaves the var
    # unbound (not ""), same try_to_timestamp gate as YEAR/MONTH/DAY
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?z WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(TZ(?t) AS ?z)
        }"""), "z")
    assert rows_ == [(None,)]


def test_triple_rejects_non_iri_subject(dataset):
    # a spaced literal subject is not an IRI/bnode: TRIPLE errors ->
    # unbound instead of minting a term the accessors would mis-parse
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?t2 ?s2 WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(TRIPLE(CONCAT(?t, " extra"), dct:title, "x") AS ?t2)
            BIND(SUBJECT(?t2) AS ?s2)
        }"""), "t2", "s2")
    assert rows_ == [(None, None)]


def test_quoted_triple_term_in_expression(dataset):
    # an explicit << s p o >> TERM inside FILTER/BIND compares against
    # the serialized quoted-term form (same convention as TRIPLE())
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?ok WHERE {
            ex:dataset/DS2 dcat:theme ?th .
            BIND(TRIPLE(ex:dataset/DS2, dcat:theme, ?th) AS ?t)
            BIND(?t = << ex:dataset/DS2 dcat:theme ex:themes/Marketing >>
                 AS ?ok)
        }"""), "ok")
    assert rows_ == [(True,)]
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?d WHERE {
            ?d dcat:theme ?th .
            FILTER(TRIPLE(?d, dcat:theme, ?th) IN (
                << ex:dataset/DS1 dcat:theme ex:themes/Finance >>,
                << ex:dataset/DS4 dcat:theme ex:themes/Ops >>))
        } ORDER BY ?d"""), "d")
    assert rows_ == [(_ds("DS1"),), (_ds("DS4"),)]


# -- term metadata: DATATYPE() / LANG() / LANGMATCHES -------------------------


XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANGSTRING = RDF + "langString"


@pytest.fixture(scope="module")
def meta_dataset(spark) -> SparqlDataset:
    rows = [
        (EX + "d1", EX + "val", "3.14", None, XSD + "decimal", None, "literal"),
        (EX + "d1", EX + "label", "hello", None, None, "en", "literal"),
        (EX + "d2", EX + "label", "bonjour", None, None, "fr-BE", "literal"),
        (EX + "d1", EX + "name", "plain", None, None, None, "literal"),
        (EX + "d1", EX + "link", EX + "d2", None, None, None, "iri"),
        # IRI-SHAPED literal (xsd:anyURI): stored metadata must beat the
        # shape sniff
        (EX + "d3", EX + "homepage", "https://example.com/home", None,
         XSD + "anyURI", None, "literal"),
        # IRI of a scheme the sniff does not recognize: stored kind wins
        (EX + "d3", EX + "mbox", "mailto:d3@example.com", None, None, None,
         "iri"),
    ]
    return SparqlDataset(
        triples=spark.createDataFrame(
            rows,
            "subject string, predicate string, object string, graph string,"
            " object_datatype string, object_lang string, object_kind string",
        )
    )


def test_datatype_from_stored_metadata(meta_dataset):
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?p ?dt WHERE {
            ex:d1 ?p ?o . BIND(DATATYPE(?o) AS ?dt)
        } ORDER BY ?p"""), "p", "dt")
    assert rows_ == [
        (EX + "label", RDF_LANGSTRING),  # tagged literal
        (EX + "link", None),             # IRI: error -> unbound
        (EX + "name", XSD + "string"),   # simple literal
        (EX + "val", XSD + "decimal"),   # stored datatype
    ]


def test_lang_and_filter_on_datatype(meta_dataset):
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?p ?l WHERE {
            ex:d1 ?p ?o . BIND(LANG(?o) AS ?l)
        } ORDER BY ?p"""), "p", "l")
    assert rows_ == [
        (EX + "label", "en"),
        (EX + "link", None),  # IRI: error -> unbound
        (EX + "name", ""),    # untagged literal
        (EX + "val", ""),
    ]
    # FILTER over DATATYPE end-to-end
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + f"""
        SELECT ?o WHERE {{
            ?s ?p ?o . FILTER(DATATYPE(?o) = <{XSD}decimal>)
        }}"""), "o")
    assert rows_ == [("3.14",)]


def test_langmatches_basic_filtering(meta_dataset):
    # exact, extended-subtag prefix, and '*' ranges (RFC 4647 basic)
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?o WHERE {
            ?s ?p ?o . FILTER(LANGMATCHES(LANG(?o), "fr"))
        }"""), "o")
    assert rows_ == [("bonjour",)]  # fr-BE matches range fr
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?o WHERE {
            ?s ?p ?o . FILTER(LANGMATCHES(LANG(?o), "*"))
        } ORDER BY ?o"""), "o")
    assert rows_ == [("bonjour",), ("hello",)]


def test_datatype_fallback_without_metadata_columns(dataset):
    # plain 4-column relations: value-shape fallback (no metadata cols)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?dt ?l WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(DATATYPE(?t) AS ?dt) BIND(LANG(?t) AS ?l)
        }"""), "dt", "l")
    assert rows_ == [(XSD + "string", "")]


def test_metadata_survives_optional_and_union(meta_dataset):
    # metadata markers ride through OPTIONAL (left join) and UNION
    # (null-padded branch alignment)
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?s ?dt WHERE {
            ?s ex:name ?n .
            OPTIONAL { ?s ex:val ?v }
            BIND(DATATYPE(?v) AS ?dt)
        }"""), "s", "dt")
    assert rows_ == [(EX + "d1", XSD + "decimal")]
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?dt WHERE {
            { ex:d1 ex:val ?o } UNION { ex:d1 ex:name ?o }
            BIND(DATATYPE(?o) AS ?dt)
        } ORDER BY ?dt"""), "dt")
    assert rows_ == [(XSD + "decimal",), (XSD + "string",)]


def test_stored_metadata_beats_shape_sniff(meta_dataset):
    # anyURI literal looks like an IRI but IS a literal (stored
    # datatype/kind); mailto: IRI looks like a literal to the sniff but
    # stored kind says iri -> error -> unbound
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?p ?dt WHERE {
            ex:d3 ?p ?o . BIND(DATATYPE(?o) AS ?dt)
        } ORDER BY ?p"""), "p", "dt")
    assert rows_ == [
        (EX + "homepage", XSD + "anyURI"),
        (EX + "mbox", None),
    ]


def test_datatype_survives_subquery_projection(meta_dataset):
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + f"""
        SELECT ?o WHERE {{
            {{ SELECT ?o WHERE {{ ?s ex:val ?o }} }}
            FILTER(DATATYPE(?o) = <{XSD}decimal>)
        }}"""), "o")
    assert rows_ == [("3.14",)]
    # SELECT * subquery keeps metadata too
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + f"""
        SELECT ?o WHERE {{
            {{ SELECT * WHERE {{ ?s ex:val ?o }} }}
            FILTER(DATATYPE(?o) = <{XSD}decimal>)
        }}"""), "o")
    assert rows_ == [("3.14",)]


def test_quoted_expression_term_with_var_is_loud(dataset):
    with pytest.raises(SparqlUnsupported):
        sparql_df(dataset, PROLOGUE + """
            SELECT ?t WHERE {
                ?d dct:title ?t .
                FILTER(?t = << ex:dataset/DS1 dct:title ?t >>)
            }""")


def test_tz_rejects_non_datetime_shapes(dataset):
    # xsd:date and space-separated forms are NOT dateTime lexicals:
    # unbound, not "" (try_to_timestamp over-accepted both)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?a ?b WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(TZ("2024-01-01") AS ?a)
            BIND(TZ("2024-01-01 10:00:00+05:30") AS ?b)
        }"""), "a", "b")
    assert rows_ == [(None, None)]


def test_subquery_distinct_dedupes_across_marker_columns(spark):
    # two UNION branches bind the SAME value with different fresh
    # metadata markers; subquery DISTINCT must dedupe over solution
    # columns, not (solution + null-padded markers)
    rows_data = [
        ("http://m/s1", "http://m/val", "3.14", None, XSD + "decimal",
         None, "literal"),
        ("http://m/s2", "http://m/val2", "3.14", None, XSD + "decimal",
         None, "literal"),
    ]
    ds = SparqlDataset(
        triples=spark.createDataFrame(
            rows_data,
            "subject string, predicate string, object string, graph string,"
            " object_datatype string, object_lang string, object_kind string",
        )
    )
    rows_ = rows(sparql_df(ds, f"""
        SELECT ?o WHERE {{
            {{ SELECT DISTINCT ?o WHERE {{
                {{ ?s <http://m/val> ?o }} UNION {{ ?t <http://m/val2> ?o }}
            }} }}
            FILTER(DATATYPE(?o) = <{XSD}decimal>)
        }}"""), "o")
    assert rows_ == [("3.14",)]


def test_tz_rejects_shaped_but_invalid_datetime(dataset):
    # month 13 / hour 99 match the lexical shape but are not valid
    # dateTimes: unbound, not ""
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?a WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(TZ("2024-13-45T99:99:99") AS ?a)
        }"""), "a")
    assert rows_ == [(None,)]


def test_tz_end_of_day_and_negative_year(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?a ?b ?c WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(TZ("2025-02-01T24:00:00Z") AS ?a)
            BIND(TZ("2025-02-01T24:00:00.5Z") AS ?b)
            BIND(TZ("-2025-02-01T00:00:00+05:00") AS ?c)
        }"""), "a", "b", "c")
    assert rows_ == [("Z", None, "+05:00")]


def test_strdt_strlang_roundtrip_through_metadata(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?v ?dt ?l ?ldt WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(STRDT("3.14", <http://www.w3.org/2001/XMLSchema#decimal>)
                 AS ?v)
            BIND(DATATYPE(?v) AS ?dt)
            BIND(STRLANG("chat", "fr") AS ?w)
            BIND(LANG(?w) AS ?l)
            BIND(DATATYPE(?w) AS ?ldt)
        }"""), "v", "dt", "l", "ldt")
    assert rows_ == [("3.14", XSD + "decimal", "fr", RDF_LANGSTRING)]


def test_strdt_of_unbound_stays_unbound(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?dt WHERE {
            ex:dataset/DS1 dct:title ?t .
            OPTIONAL { ex:dataset/DS1 ex:missing ?m }
            BIND(STRDT(?m, <http://www.w3.org/2001/XMLSchema#int>) AS ?v)
            BIND(DATATYPE(?v) AS ?dt)
        }"""), "dt")
    assert rows_ == [(None,)]


def test_leading_strdt_bind_keeps_metadata(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?dt WHERE {
            BIND(STRDT("5", <http://www.w3.org/2001/XMLSchema#int>) AS ?v)
            ex:dataset/DS1 dct:title ?t .
            BIND(DATATYPE(?v) AS ?dt)
        }"""), "dt")
    assert rows_ == [(XSD + "int",)]


def test_strdt_strlang_wrong_kind_is_unbound(dataset):
    # 17.4.2.8/.9: STRDT needs an IRI datatype, STRLANG a non-empty
    # simple-literal tag — wrong kinds are type errors -> unbound
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?a ?b ?c WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(STRDT("5", "not-an-iri") AS ?a)
            BIND(STRLANG("chat", <http://not-a-tag>) AS ?b)
            BIND(STRLANG("chat", "") AS ?c)
        }"""), "a", "b", "c")
    assert rows_ == [(None, None, None)]


def test_strdt_with_variable_datatype_is_loud(dataset):
    with pytest.raises(SparqlUnsupported):
        sparql_df(dataset, PROLOGUE + """
            SELECT ?v WHERE {
                ex:dataset/DS1 dct:title ?t .
                BIND(STRDT("5", ?t) AS ?v)
            }""")


def test_is_functions_consult_metadata(meta_dataset):
    # anyURI-shaped literal: isLITERAL true / isIRI false (stored kind);
    # mailto: IRI: isIRI true despite the sniff not knowing the scheme
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?p ?lit ?iri WHERE {
            ex:d3 ?p ?o .
            BIND(isLITERAL(?o) AS ?lit) BIND(isIRI(?o) AS ?iri)
        } ORDER BY ?p"""), "p", "lit", "iri")
    assert rows_ == [
        (EX + "homepage", True, False),
        (EX + "mbox", False, True),
    ]
    # STRDT-constructed IRI-shaped literal classifies as literal
    rows_ = rows(sparql_df(meta_dataset, PROLOGUE + """
        SELECT ?lit WHERE {
            ex:d1 ex:name ?n .
            BIND(STRDT("http://x/", <http://www.w3.org/2001/XMLSchema#anyURI>)
                 AS ?v)
            BIND(isLITERAL(?v) AS ?lit)
        }"""), "lit")
    assert rows_ == [(True,)]


def test_subquery_distinct_ignores_kind_markers(spark):
    # one branch's relation stores object_kind, the other's does not:
    # the same IRI must still dedupe under subquery DISTINCT when the
    # outer query inspects the var with isIRI (kind markers are not
    # part of term identity)
    triples = spark.createDataFrame(
        [("http://m/s1", "http://m/link", "http://m/d2", None, None, None,
          "iri")],
        "subject string, predicate string, object string, graph string,"
        " object_datatype string, object_lang string, object_kind string",
    )
    anns = spark.createDataFrame(
        [("http://m/a", "http://m/b", "http://m/c", "http://m/link",
          "http://m/d2")],
        "q_s string, q_p string, q_o string, predicate string,"
        " object string",
    )
    ds = SparqlDataset(triples=triples, annotations=anns)
    rows_ = rows(sparql_df(ds, """
        SELECT ?iri WHERE {
            { SELECT DISTINCT ?o WHERE {
                { ?s <http://m/link> ?o }
                UNION
                { << ?a ?b ?c >> <http://m/link> ?o }
            } }
            BIND(isIRI(?o) AS ?iri)
        }"""), "iri")
    assert rows_ == [(True,)]


def test_is_functions_on_triple_terms(dataset):
    # a triple term is none of IRI/literal/blank (SPARQL-star)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?lit ?iri ?tr WHERE {
            ex:dataset/DS2 dcat:theme ?th .
            BIND(TRIPLE(ex:dataset/DS2, dcat:theme, ?th) AS ?t)
            BIND(isLITERAL(?t) AS ?lit) BIND(isIRI(?t) AS ?iri)
            BIND(isTRIPLE(?t) AS ?tr)
        }"""), "lit", "iri", "tr")
    assert rows_ == [(False, False, True)]


def test_strdt_constant_wrong_kind_is_unbound_not_loud(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?v WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(STRDT("5", 42) AS ?v)
        }"""), "v")
    assert rows_ == [(None,)]


def test_isnumeric_consults_stored_datatype(meta_dataset, spark):
    # typed literal: datatype decides; untyped: lexical sniff
    t2 = spark.createDataFrame(
        [("http://m/x", "http://m/tag", "42", None, XSD + "string", None,
          "literal"),
         ("http://m/x", "http://m/n", "42", None, None, None, "literal")],
        "subject string, predicate string, object string, graph string,"
        " object_datatype string, object_lang string, object_kind string",
    )
    rows_ = rows(sparql_df(SparqlDataset(triples=t2), """
        SELECT ?p ?num WHERE {
            ?s ?p ?o . BIND(isNUMERIC(?o) AS ?num)
        } ORDER BY ?p"""), "p", "num")
    assert rows_ == [("http://m/n", True), ("http://m/tag", False)]
    rows_ = rows(sparql_df(meta_dataset, """
        PREFIX ex: <http://example.org/>
        SELECT ?num WHERE {
            ex:d1 ex:val ?o . BIND(isNUMERIC(?o) AS ?num)
        }"""), "num")
    assert rows_ == [(True,)]  # xsd:decimal


# -- round-5 advisor findings: term identity / minting validity --------------


def test_sameterm_distinguishes_constructed_datatype(dataset):
    # STRDT("a", xsd:token) and plain "a" share a lexical but are
    # different TERMS — sameTerm must agree with the DISTINCT machinery
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?plain ?same WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(STRDT("a", <http://www.w3.org/2001/XMLSchema#token>) AS ?a)
            BIND(STRDT("a", <http://www.w3.org/2001/XMLSchema#token>) AS ?b)
            BIND(IF(sameTerm(?a, "a"), "y", "n") AS ?plain)
            BIND(IF(sameTerm(?a, ?b), "y", "n") AS ?same)
        }"""), "plain", "same")
    assert rows_ == [("n", "y")]


def test_sameterm_distinguishes_lang_tagged_terms(dataset):
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?x WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(STRLANG("chat", "en") AS ?a)
            BIND(IF(sameTerm(?a, "chat"), "y", "n") AS ?x)
        }"""), "x")
    assert rows_ == [("n",)]


def test_sameterm_kind_aware(meta_dataset):
    # an IRI var vs a literal constant with the same lexical: different
    # terms; vs the same IRI constant: the same term (the stored 'iri'
    # kind must meet the parse-time constant kind, not the scheme sniff)
    rows_ = rows(sparql_df(meta_dataset, """
        PREFIX ex: <http://example.org/>
        SELECT ?lit ?iri ?mb WHERE {
            ex:d1 ex:link ?l .
            ex:d3 ex:mbox ?m .
            BIND(IF(sameTerm(?l, "http://example.org/d2"), "y", "n") AS ?lit)
            BIND(IF(sameTerm(?l, ex:d2), "y", "n") AS ?iri)
            BIND(IF(sameTerm(?m, <mailto:d3@example.com>), "y", "n") AS ?mb)
        }"""), "lit", "iri", "mb")
    assert rows_ == [("n", "y", "y")]


def test_triple_rejects_whitespace_free_literal_subject(dataset):
    # SPARQL 1.2: a literal subject ("42") or literal predicate is a
    # type error → unbound, even without whitespace
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?a ?b WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(TRIPLE("42", dct:title, "x") AS ?a)
            BIND(TRIPLE(ex:dataset/DS1, "42", "x") AS ?b)
        }"""), "a", "b")
    assert rows_ == [(None, None)]


def test_triple_accepts_stored_iri_var_subject(meta_dataset):
    # a var subject whose stored kind is 'iri' (scheme outside the
    # sniff set) still mints
    rows_ = rows(sparql_df(meta_dataset, """
        PREFIX ex: <http://example.org/>
        SELECT ?t WHERE {
            ex:d3 ex:mbox ?m .
            BIND(TRIPLE(?m, ex:mbox, "x") AS ?t)
        }"""), "t")
    assert rows_ == [("<< mailto:d3@example.com http://example.org/mbox x >>",)]


def test_iri_invalid_lexical_is_unbound(dataset):
    # 17.4.2.8: IRI() of a non-IRI lexical is a type error → unbound
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?a ?b ?ok WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(IRI("not a uri") AS ?a)
            BIND(IRI("relative/ref") AS ?b)
            BIND(IRI("urn:x:1") AS ?ok)
        }"""), "a", "b", "ok")
    assert rows_ == [(None, None, "urn:x:1")]


def test_describe_serves_stored_term_metadata(meta_dataset):
    # DESCRIBE output carries the STORED kind/datatype/lang, not an
    # IRI-shape re-sniff (advisor finding): an xsd:anyURI literal stays
    # a typed literal, a mailto: IRI stays an IRI, @en survives
    df = sparql_df(meta_dataset, "DESCRIBE <http://example.org/d3>")
    by_pred = {r["predicate"]: r for r in df.collect()}
    hp = by_pred["http://example.org/homepage"]
    assert hp["object_kind"] == "literal"
    assert hp["object_datatype"] == XSD + "anyURI"
    mb = by_pred["http://example.org/mbox"]
    assert mb["object_kind"] == "iri"
    lbl = {
        r["predicate"]: r
        for r in sparql_df(
            meta_dataset, "DESCRIBE <http://example.org/d1>"
        ).collect()
    }["http://example.org/label"]
    assert lbl["object_lang"] == "en"
    assert lbl["object_kind"] == "literal"


def test_describe_renders_bnode_object_as_bnode(spark):
    # bnode objects are stored as bare b<sha> with kind 'blank'; the
    # old sniff rendered them as quoted literals in DESCRIBE documents
    t = spark.createDataFrame(
        [("http://m/s", "http://m/p", "b0deadbeef", None, None, None,
          "blank")],
        "subject string, predicate string, object string, graph string,"
        " object_datatype string, object_lang string, object_kind string",
    )
    ds = SparqlDataset(triples=t)
    df = sparql_df(ds, "DESCRIBE <http://m/s>")
    assert df.collect()[0]["object_kind"] == "blank"
    doc = execute_sparql(ds, "DESCRIBE <http://m/s>")
    assert doc["triples"] == ["<http://m/s> <http://m/p> _:b0deadbeef"]


def test_depth2_quoted_triple_end_to_end(spark):
    # round-5 verdict ask #6: a depth-2 quoted triple loads through the
    # Turtle reader (inner term serialized into the engine's
    # "<< s p o >>" string form) and answers SPARQL: ground nested-term
    # match, var + accessor destructuring, and TRIPLE() round-trip
    from etl_pipeline_rdf_star_spark.queries.sparql import dataset_from_quads
    from etl_pipeline_rdf_star_spark.sinks.turtle import read_turtle
    import tempfile, os

    text = (
        "@prefix ex: <http://e/> .\n"
        '<< << ex:a ex:b ex:c >> ex:d ex:e >> ex:conf "0.9" .\n'
        '<< ex:a ex:b ex:c >> ex:conf "0.5" .\n'
    )
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "nested.ttl"), "w") as f:
        f.write(text)
    ds = dataset_from_quads(read_turtle(spark, d))

    # ground depth-2 pattern matches exactly the nested-subject row
    rows_ = rows(sparql_df(ds, """
        PREFIX ex: <http://e/>
        SELECT ?v WHERE {
            << << ex:a ex:b ex:c >> ex:d ex:e >> ex:conf ?v }"""), "v")
    assert rows_ == [("0.9",)]

    # a var in the nested slot binds the serialized term, and the
    # SPARQL-star accessors destructure it
    rows_ = rows(sparql_df(ds, """
        PREFIX ex: <http://e/>
        SELECT ?s ?is ?inner_p ?v WHERE {
            << ?s ex:d ex:e >> ex:conf ?v .
            BIND(isTRIPLE(?s) AS ?is)
            BIND(PREDICATE(?s) AS ?inner_p)
        }"""), "s", "is", "inner_p", "v")
    assert rows_ == [
        ("<< http://e/a http://e/b http://e/c >>", True, "http://e/b", "0.9")
    ]

    # TRIPLE() mints the same form, so the two representations meet
    rows_ = rows(sparql_df(ds, """
        PREFIX ex: <http://e/>
        SELECT ?v WHERE {
            << ?s ex:d ex:e >> ex:conf ?v .
            FILTER(?s = TRIPLE(ex:a, ex:b, ex:c))
        }"""), "v")
    assert rows_ == [("0.9",)]

    # the depth-1 annotation is untouched by the nesting support
    rows_ = rows(sparql_df(ds, """
        PREFIX ex: <http://e/>
        SELECT ?v WHERE { << ex:a ex:b ex:c >> ex:conf ?v }"""), "v")
    assert rows_ == [("0.5",)]


def test_depth3_quoted_pattern_stays_loud(dataset):
    with pytest.raises(SparqlUnsupported):
        sparql_df(dataset, PROLOGUE + """
            SELECT ?v WHERE {
                << << << ex:x ex:y ex:z >> ex:b ex:c >> ex:d ex:e >>
                    ex:conf ?v }""")


# -- round-5 review findings: constant term metadata, positional kinds -------


def test_sameterm_constant_metadata(dataset):
    # a TYPED/TAGGED constant contributes its parse-time metadata:
    # STRDT("a", xsd:token) IS "a"^^xsd:token, while "chat" and
    # "chat"@en are different terms even as two constants (review
    # finding: constant operands contributed null metadata, so the
    # first pair compared sameTerm-FALSE and the second TRUE)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?typed ?tagged WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(STRDT("a", <http://www.w3.org/2001/XMLSchema#token>) AS ?a)
            BIND(IF(sameTerm(
                ?a, "a"^^<http://www.w3.org/2001/XMLSchema#token>
            ), "y", "n") AS ?typed)
            BIND(IF(sameTerm("chat", "chat"@en), "y", "n") AS ?tagged)
        }"""), "typed", "tagged")
    assert rows_ == [("y", "n")]


def test_sameterm_numeric_constant_vs_stored_typed(meta_dataset):
    # 3.14 in query syntax IS "3.14"^^xsd:decimal (19.2) — the same
    # term as a stored xsd:decimal object with that lexical; a plain
    # literal normalizes to xsd:string on both sides
    rows_ = rows(sparql_df(meta_dataset, """
        PREFIX ex: <http://example.org/>
        SELECT ?num ?plain WHERE {
            ex:d1 ex:val ?v . ex:d1 ex:name ?n .
            BIND(IF(sameTerm(?v, 3.14), "y", "n") AS ?num)
            BIND(IF(sameTerm(?n, "plain"), "y", "n") AS ?plain)
        }"""), "num", "plain")
    assert rows_ == [("y", "y")]


def test_subject_var_positional_kind(spark):
    # stored bnode labels are BARE (no '_:' prefix) and subjects may be
    # non-sniff-scheme IRIs — positional inference must classify
    # subject-position vars without the lexical sniff (review finding:
    # 'genid1' sniffed 'literal', so isBLANK was false and TRIPLE()
    # refused a valid bnode subject)
    ds = SparqlDataset(triples=spark.createDataFrame(
        [
            ("genid1", EX + "p", EX + "o", None),
            ("mailto:a@b.example", EX + "q", EX + "o", None),
        ],
        "subject string, predicate string, object string, graph string",
    ))
    rows_ = rows(sparql_df(ds, """
        PREFIX ex: <http://example.org/>
        SELECT ?blank ?t WHERE {
            ?s ex:p ex:o .
            BIND(isBLANK(?s) AS ?blank)
            BIND(TRIPLE(?s, ex:p, ex:o) AS ?t)
        }"""), "blank", "t")
    assert rows_ == [
        (True, f"<< genid1 {EX}p {EX}o >>")
    ]
    rows_ = rows(sparql_df(ds, """
        PREFIX ex: <http://example.org/>
        SELECT ?mb WHERE {
            ?s ex:q ex:o .
            BIND(IF(sameTerm(?s, <mailto:a@b.example>), "y", "n") AS ?mb)
        }"""), "mb")
    assert rows_ == [("y",)]


def test_iri_mints_any_absolute_scheme(dataset):
    # IRI() validity is the general absolute-IRI shape, not the serving
    # sniff's known-scheme list (review finding: IRI("mailto:...") was
    # unbound though the engine stores mailto: terms with kind 'iri');
    # the minted kind rides along so isIRI() agrees, both through a
    # BIND var and nested directly
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?u ?is ?nested ?bad WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(IRI("mailto:alice@example.org") AS ?u)
            BIND(isIRI(?u) AS ?is)
            BIND(isIRI(IRI("did:plc:abc123")) AS ?nested)
            BIND(IRI("not a uri") AS ?bad)
        }"""), "u", "is", "nested", "bad")
    assert rows_ == [("mailto:alice@example.org", True, True, None)]


def test_sameterm_bind_of_constant_round_trips(dataset):
    # a BIND of a typed/tagged CONSTANT carries its parse-time metadata
    # (second-pass review finding: the first fix covered inline
    # constants but a BIND var normalized to plain xsd:string, so
    # sameTerm(?x, "chat"@en) after BIND("chat"@en AS ?x) was FALSE)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?tag ?typed ?plain WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND("chat"@en AS ?x)
            BIND(IF(sameTerm(?x, "chat"@en), "y", "n") AS ?tag)
            BIND("a"^^<http://www.w3.org/2001/XMLSchema#token> AS ?y)
            BIND(IF(sameTerm(
                ?y, "a"^^<http://www.w3.org/2001/XMLSchema#token>
            ), "y", "n") AS ?typed)
            BIND(IF(sameTerm(?y, "a"), "y", "n") AS ?plain)
        }"""), "tag", "typed", "plain")
    assert rows_ == [("y", "y", "n")]


def test_sameterm_numeric_keeps_original_lexical(dataset):
    # term identity is LEXICAL: 01 and 1 are different xsd:integer
    # terms (second-pass review finding: the compiled F.lit(1) rendered
    # both as "1", comparing them sameTerm-true); 1e3 must match itself
    # (its compiled float rendered "1000.0" and never matched)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?pad ?sci WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(IF(sameTerm(01, 1), "y", "n") AS ?pad)
            BIND(IF(sameTerm(1e3, 1e3), "y", "n") AS ?sci)
        }"""), "pad", "sci")
    assert rows_ == [("n", "y")]


def test_datatype_lang_of_constants(dataset):
    # DATATYPE/LANG answer from the same effective-metadata helpers as
    # sameTerm (second-pass review finding: DATATYPE("chat"@en) said
    # xsd:string while sameTerm knew rdf:langString)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?dt ?lg ?ndt ?pdt WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(DATATYPE("chat"@en) AS ?dt)
            BIND(LANG("chat"@en) AS ?lg)
            BIND(DATATYPE(5) AS ?ndt)
            BIND(DATATYPE("x") AS ?pdt)
        }"""), "dt", "lg", "ndt", "pdt")
    assert rows_ == [(
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
        "en",
        "http://www.w3.org/2001/XMLSchema#integer",
        "http://www.w3.org/2001/XMLSchema#string",
    )]


def test_iri_rejects_trailing_newline(spark):
    # Java's '$' matches before a final line terminator, so the shape
    # regex alone passes "mailto:x\n" — the explicit whitespace guard
    # must reject it (second-pass review finding on the guard's removal)
    ds = SparqlDataset(triples=spark.createDataFrame(
        [("http://e/s", "http://e/p", "mailto:x\n", None)],
        "subject string, predicate string, object string, graph string",
    ))
    rows_ = rows(sparql_df(ds, """
        SELECT ?u WHERE {
            ?s <http://e/p> ?o . BIND(IRI(?o) AS ?u)
        }"""), "u")
    assert rows_ == [(None,)]


def test_isliteral_consistent_through_bind_str(meta_dataset):
    # isLITERAL agrees between a direct STR(...) nesting and the same
    # expression routed through a BIND var, even for an IRI-shaped
    # lexical (second-pass review finding: only IRI/TRIPLE pinned kinds
    # through BIND)
    rows_ = rows(sparql_df(meta_dataset, """
        PREFIX ex: <http://example.org/>
        SELECT ?lit ?lit2 WHERE {
            ex:d1 ex:link ?l .
            BIND(STR(?l) AS ?s)
            BIND(isLITERAL(?s) AS ?lit)
            BIND(isLITERAL(STR(?l)) AS ?lit2)
        }"""), "lit", "lit2")
    assert rows_ == [(True, True)]


def test_blank_graph_label_positional_kind(spark):
    # the N-Quads reader accepts '_:g' graph labels stored bare —
    # GRAPH ?g must not pin kind 'iri' (second-pass review finding)
    ds = SparqlDataset(triples=spark.createDataFrame(
        [
            ("http://e/s", "http://e/p", "http://e/o", "gblank1"),
            ("http://e/s", "http://e/p", "http://e/o2", "http://e/g"),
        ],
        "subject string, predicate string, object string, graph string",
    ))
    rows_ = rows(sparql_df(ds, """
        SELECT ?g ?b WHERE {
            GRAPH ?g { ?s ?p ?o } BIND(isBLANK(?g) AS ?b)
        } ORDER BY ?g"""), "g", "b")
    assert rows_ == [("gblank1", True), ("http://e/g", False)]


def test_sameterm_numeric_bind_keeps_lexical(dataset):
    # a numeric-constant BIND stores the ORIGINAL lexical (third-pass
    # review finding: F.lit(int("01")) rendered "1", so the BIND var
    # disagreed with the same constant inline)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?pad ?sci ?val WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(01 AS ?x)
            BIND(IF(sameTerm(?x, 01), "y", "n") AS ?pad)
            BIND(1e3 AS ?z)
            BIND(IF(sameTerm(?z, 1e3), "y", "n") AS ?sci)
            BIND(IF(?x = 1, "y", "n") AS ?val)
        }"""), "pad", "sci", "val")
    # lexical identity for sameTerm; VALUE equality (=) still numeric
    assert rows_ == [("y", "y", "y")]


def test_distinct_unifies_bound_and_stored_terms(meta_dataset):
    # BIND'd constants and STRLANG constructions follow the STORED
    # marker convention (dt-null for plain and tagged literals), so
    # DISTINCT unifies them with identical stored terms (fourth-pass
    # review finding: an explicit xsd:string / rdf:langString marker
    # made the same RDF term produce two rows). The DISTINCT sits in a
    # SUBQUERY under an outer DATATYPE so the markers actually reach
    # the dedup key (fifth-pass finding: the top-level form projected
    # the markers away and passed against the broken code)
    rows_ = rows(sparql_df(meta_dataset, """
        PREFIX ex: <http://example.org/>
        SELECT ?x ?dt WHERE {
            { SELECT DISTINCT ?x WHERE {
                { ex:d1 ex:label ?x }
                UNION { BIND(STRLANG("hello", "en") AS ?x) }
                UNION { BIND("hello"@en AS ?x) }
            } }
            BIND(DATATYPE(?x) AS ?dt)
        }"""), "x", "dt")
    assert rows_ == [
        ("hello", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString")
    ]
    rows_ = rows(sparql_df(meta_dataset, """
        PREFIX ex: <http://example.org/>
        SELECT ?x ?dt WHERE {
            { SELECT DISTINCT ?x WHERE {
                { ex:d1 ex:name ?x }
                UNION { BIND("plain" AS ?x) }
                UNION { BIND(STRDT("plain",
                    <http://www.w3.org/2001/XMLSchema#string>) AS ?x) }
            } }
            BIND(DATATYPE(?x) AS ?dt)
        }"""), "x", "dt")
    assert rows_ == [("plain", "http://www.w3.org/2001/XMLSchema#string")]


def test_distinct_canonicalizes_stored_explicit_string(spark):
    # a mapping's `datatype: xsd:string` stores the marker VERBATIM —
    # the DISTINCT key must treat it as the same term as a plain
    # literal (RDF 1.1: plain ≡ xsd:string), while isNUMERIC keeps
    # consulting the raw stored datatype (fifth-pass review finding +
    # the earlier '"42"^^xsd:string is not numeric' guarantee)
    ds = SparqlDataset(triples=spark.createDataFrame(
        [("http://e/s", "http://e/p", "42",
          None, "http://www.w3.org/2001/XMLSchema#string", None,
          "literal")],
        "subject string, predicate string, object string, graph string,"
        " object_datatype string, object_lang string, object_kind string",
    ))
    rows_ = rows(sparql_df(ds, """
        SELECT ?x ?dt WHERE {
            { SELECT DISTINCT ?x WHERE {
                { ?s <http://e/p> ?x }
                UNION { BIND("42" AS ?x) }
            } }
            BIND(DATATYPE(?x) AS ?dt)
        }"""), "x", "dt")
    assert rows_ == [("42", "http://www.w3.org/2001/XMLSchema#string")]
    rows_ = rows(sparql_df(ds, """
        SELECT ?n WHERE {
            ?s <http://e/p> ?x . BIND(isNUMERIC(?x) AS ?n)
        }"""), "n")
    assert rows_ == [(False,)]  # explicit xsd:string beats the sniff


def test_isnumeric_definitive_after_distinct_subquery(spark):
    # the DISTINCT key canonicalizes to the NON-NULL effective datatype
    # (sixth-pass review finding: canonicalizing to null sent
    # '42'^^xsd:string to the lexical sniff after a DISTINCT subquery,
    # and reclassified IRI-shaped typed literals as IRIs)
    ds = SparqlDataset(triples=spark.createDataFrame(
        [
            ("http://e/s", "http://e/p", "42",
             None, "http://www.w3.org/2001/XMLSchema#string", None,
             "literal"),
            ("http://e/s2", "http://e/q", "http://not-a-link",
             None, "http://www.w3.org/2001/XMLSchema#string", None,
             "literal"),
        ],
        "subject string, predicate string, object string, graph string,"
        " object_datatype string, object_lang string, object_kind string",
    ))
    rows_ = rows(sparql_df(ds, """
        SELECT ?n WHERE {
            { SELECT DISTINCT ?x WHERE { ?s <http://e/p> ?x } }
            BIND(isNUMERIC(?x) AS ?n)
        }"""), "n")
    assert rows_ == [(False,)]
    rows_ = rows(sparql_df(ds, """
        SELECT ?l WHERE {
            { SELECT DISTINCT ?y WHERE { ?s <http://e/q> ?y } }
            BIND(isLITERAL(?y) AS ?l)
        }"""), "l")
    assert rows_ == [(True,)]


def test_isnumeric_constructed_string_literals(dataset):
    # STRDT/STRLANG/typed-constant BINDs carry definitive datatype
    # markers, so isNUMERIC answers from the datatype (17.4.2.4), not
    # the lexical sniff (sixth-pass review finding: skipping the
    # implied markers regressed all three to sniff-true)
    rows_ = rows(sparql_df(dataset, PROLOGUE + """
        SELECT ?a ?b ?c WHERE {
            ex:dataset/DS1 dct:title ?t .
            BIND(STRDT("42", <http://www.w3.org/2001/XMLSchema#string>) AS ?x)
            BIND(isNUMERIC(?x) AS ?a)
            BIND(STRLANG("42", "en") AS ?y)
            BIND(isNUMERIC(?y) AS ?b)
            BIND("42"^^<http://www.w3.org/2001/XMLSchema#string> AS ?z)
            BIND(isNUMERIC(?z) AS ?c)
        }"""), "a", "b", "c")
    assert rows_ == [(False, False, False)]
