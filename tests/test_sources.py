"""Source connectors (SURVEY §2.1) — mirrors reference tests/test_sources.py
(env interp, delimiters, JSON iterator+flatten, XML attributes, registry
dispatch) without network or DB dependencies."""

from __future__ import annotations

import json
import textwrap

import pytest

from etl_pipeline_rdf_star_spark.mapping.ir import SourceSpec
from etl_pipeline_rdf_star_spark.sources.registry import (
    flatten_structs,
    interpolate_env,
    load_source,
    registered_formats,
)


def test_registry_has_all_formats():
    fmts = registered_formats()
    for f in ["csv", "tsv", "json", "xml", "parquet", "jdbc", "http", "sparql"]:
        assert f in fmts


def test_env_interpolation():
    assert interpolate_env("${HOST}/x", {"HOST": "http://h"}) == "http://h/x"
    assert interpolate_env("${MISSING}/x", {}) == "${MISSING}/x"


def test_csv_and_delimiter(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("id;name\n1;alpha\n2;beta\n")
    df = load_source(
        spark, SourceSpec(access="d.csv", fmt="csv", delimiter=";"), str(tmp_path)
    )
    assert df.columns == ["id", "name"]
    assert df.count() == 2


def test_tsv(spark, tmp_path):
    p = tmp_path / "d.tsv"
    p.write_text("id\tname\n1\talpha\n")
    df = load_source(spark, SourceSpec(access="d.tsv", fmt="tsv"), str(tmp_path))
    assert [r.name for r in df.collect()] == ["alpha"]


def test_json_iterator_and_flatten(spark, tmp_path):
    doc = {
        "meta": {"v": 1},
        "data": [
            {"id": 1, "user": {"name": "ada", "org": "x"}},
            {"id": 2, "user": {"name": "bob", "org": "y"}},
        ],
    }
    p = tmp_path / "d.json"
    p.write_text(json.dumps(doc))
    df = load_source(
        spark,
        SourceSpec(access="d.json", fmt="json", iterator="$.data[*]"),
        str(tmp_path),
    )
    # nested user.name flattened to user_name (reference json_source.py:28-54)
    assert sorted(df.columns) == ["id", "user_name", "user_org"]
    assert {r.user_name for r in df.collect()} == {"ada", "bob"}


def test_xml_rowtag_and_attributes(spark, tmp_path):
    p = tmp_path / "d.xml"
    p.write_text(
        textwrap.dedent(
            """\
            <catalog>
              <product sku="A1"><name>Widget</name><price>9.5</price></product>
              <product sku="B2"><name>Gadget</name><price>19.5</price></product>
            </catalog>"""
        )
    )
    df = load_source(
        spark,
        SourceSpec(access="d.xml", fmt="xml", iterator="//product"),
        str(tmp_path),
    )
    assert df.count() == 2
    assert "_sku" in df.columns  # attribute column
    assert {r.name for r in df.collect()} == {"Widget", "Gadget"}


def test_http_with_fake_fetcher(spark):
    body = json.dumps({"items": [{"a": 1, "b": {"c": "x"}}, {"a": 2, "b": {"c": "y"}}]})
    spec = SourceSpec(
        access="${API}/items",
        fmt="http",
        iterator="$.items[*]",
        options={"fetcher": lambda url, headers: body},
    )
    df = load_source(spark, spec, ".")
    assert sorted(df.columns) == ["a", "b_c"]
    assert df.count() == 2


def test_sparql_bindings_with_fake_fetcher(spark):
    res = {
        "head": {"vars": ["s", "label"]},
        "results": {
            "bindings": [
                {"s": {"type": "uri", "value": "http://x/1"},
                 "label": {"type": "literal", "value": "one"}},
                {"s": {"type": "uri", "value": "http://x/2"},
                 "label": {"type": "literal", "value": "two"}},
            ]
        },
    }
    spec = SourceSpec(
        access="http://endpoint/sparql",
        fmt="sparql",
        options={"fetcher": lambda url, headers: json.dumps(res),
                 "query": "SELECT ?s ?label WHERE {?s rdfs:label ?label}"},
    )
    df = load_source(spark, spec, ".")
    assert df.count() == 2
    assert {r.label for r in df.collect()} == {"one", "two"}


def test_parquet_source(spark, sf_dir):
    df = load_source(
        spark,
        SourceSpec(access=f"{sf_dir}/documents.parquet", fmt="parquet"),
        ".",
    )
    assert "doc_id" in df.columns and df.count() > 0


def test_unregistered_format_raises(spark):
    with pytest.raises(ValueError, match="unregistered"):
        load_source(spark, SourceSpec(access="x", fmt="avro-nope"), ".")


def test_flatten_depth(spark):
    df = spark.createDataFrame(
        [(1, ((2, (3,)),))],
        "a int, s struct<t: struct<b: int, u: struct<c: int>>>",
    )
    flat = flatten_structs(df)
    assert sorted(flat.columns) == ["a", "s_t_b", "s_t_u_c"]


def test_jdbc_against_live_embedded_derby(spark, tmp_path):
    """S5-S7 against a REAL database: Apache Derby ships with Spark (the
    embedded JDBC driver on every executor classpath), so the one JDBC
    path is exercised end-to-end — DDL+rows written through java.sql,
    read back through spark.read.jdbc with query pushdown, both via the
    source registry and with a predicate that must reach the database."""
    from etl_pipeline_rdf_star_spark.mapping.ir import SourceSpec
    from etl_pipeline_rdf_star_spark.sources.registry import load_source

    url = f"jdbc:derby:{tmp_path}/livedb;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE files (repo VARCHAR(40), n INT)")
    for repo, n in [("repo_a", 1), ("repo_b", 2), ("repo_b", 3)]:
        st.execute(f"INSERT INTO files VALUES ('{repo}', {n})")
    st.close()
    conn.close()

    spec = SourceSpec(
        access=url,
        fmt="jdbc",
        iterator="SELECT repo, n FROM files WHERE n >= 2",
        options={"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"},
    )
    df = load_source(spark, spec)
    rows = sorted((r["REPO"], r["N"]) for r in df.collect())
    assert rows == [("repo_b", 2), ("repo_b", 3)]
    # further filters push into the JDBC scan (PushedFilters in the plan)
    plan = df.where(df["N"] > 2)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "N" in plan.split("PushedFilters")[1][:80]
