"""Parser + compiler + materializer unit tests.

Models the reference's spec-conformance suite
(test_yarrrml_spec_comprehensive.py) and golden end-to-end checks
(tests/test_dynamic_etl.py:19-209): the 5-row data_products/lineage fixture
shape from data/data_products.csv + data/lineage.csv, expected cardinality
8 base triples per dataset row and 5 annotation quads + 1 reifies link per
lineage match (csv_generator/README_BENCHMARK.md:135-145).
"""

from __future__ import annotations

import pytest

from etl_pipeline_rdf_star_spark.mapping.parser import parse_document
from etl_pipeline_rdf_star_spark.mapping.compiler import (
    expand_prefix,
    template_refs,
)
from etl_pipeline_rdf_star_spark.operators.materialize import (
    annotations_to_quads,
    materialize_annotations,
    materialize_asserted,
    materialize_document,
)

FLAGSHIP_YAML = """
prefixes:
  ex:   "http://example.org/"
  dcat: "http://www.w3.org/ns/dcat#"
  dct:  "http://purl.org/dc/terms/"
  prov: "http://www.w3.org/ns/prov#"
  xsd:  "http://www.w3.org/2001/XMLSchema#"

mappings:
  datasetTM:
    sources:
      - ['data_products.csv~csv']
    subject: ex:dataset/$(dataset_id)
    predicateobjects:
      - [a, dcat:Dataset]
      - [dct:title, $(title), xsd:string]
      - [dct:issued, $(issued), xsd:date]
      - [dct:publisher, ex:org/$(owner)~iri]

  datasetThemeTM:
    sources:
      - ['data_products.csv~csv']
    subject: ex:dataset/$(dataset_id)
    predicateobjects:
      - predicates: dcat:theme
        objects:
          value: $(theme_uri)
          type: iri

  themeGovernanceTM:
    sources:
      - ['lineage.csv~csv']
    subject:
      - function: join(quoted=datasetThemeTM, equal(str1=$(dataset_id), str2=$(dataset_id)))
    predicateobjects:
      - predicates: prov:wasDerivedFrom
        objects:
          value: ex:system/$(source_system)
          type: iri
      - predicates: prov:generatedAtTime
        objects:
          value: $(extract_time)
          datatype: xsd:dateTime
      - [ex:confidence, $(confidence), xsd:decimal]
      - predicates: ex:rule
        objects:
          value: ex:rule/$(rule_id)
          type: iri

  ingestActivityTM:
    sources:
      - ['lineage.csv~csv']
    subject: ex:activity/$(run_id)
    predicateobjects:
      - [a, prov:Activity]
      - [prov:startedAtTime, $(extract_time), xsd:dateTime]
      - predicates: prov:used
        objects:
          value: ex:system/$(source_system)
          type: iri
"""

DATA_PRODUCTS = [
    ("DS-000001", "Customer Master", "2024-01-15", "data team",
     "http://example.org/themes/CustomerData"),
    ("DS-000002", "Risk Scores", "2024-02-20", "risk&compliance",
     "http://example.org/themes/Risk"),
    ("DS-000003", "Loans Book", "2024-03-25", "lending",
     "http://example.org/themes/Credit"),
]
DP_COLS = ["dataset_id", "title", "issued", "owner", "theme_uri"]

LINEAGE = [
    ("DS-000001", "COLLIBRA", "2025-02-15T08:00:00", "RUN_20250215_001", "0.95",
     "RULE_001"),
    ("DS-000001", "ALATION", "2025-02-15T09:00:00", "RUN_20250215_002", "0.88",
     "RULE_002"),
    ("DS-000002", "TALEND", "2025-02-15T10:00:00", "RUN_20250215_003", "0.91",
     "RULE_003"),
]
LIN_COLS = ["dataset_id", "source_system", "extract_time", "run_id", "confidence",
            "rule_id"]


@pytest.fixture(scope="module")
def ir():
    return parse_document(FLAGSHIP_YAML)


@pytest.fixture(scope="module")
def dp_df(spark):
    return spark.createDataFrame(DATA_PRODUCTS, DP_COLS)


@pytest.fixture(scope="module")
def lin_df(spark):
    return spark.createDataFrame(LINEAGE, LIN_COLS)


class TestParser:
    def test_maps_and_kinds(self, ir):
        assert set(ir.triples_maps) == {
            "datasetTM", "datasetThemeTM", "themeGovernanceTM", "ingestActivityTM"}
        assert {t.name for t in ir.annotation_maps()} == {"themeGovernanceTM"}
        qj = ir.triples_maps["themeGovernanceTM"].subject.quoted_join
        assert qj.quoted_map == "datasetThemeTM"
        assert qj.child_key == "dataset_id" and qj.parent_key == "dataset_id"

    def test_prefix_expansion(self, ir):
        assert expand_prefix("dcat:theme", ir.prefixes) == \
            "http://www.w3.org/ns/dcat#theme"
        assert expand_prefix("a", ir.prefixes).endswith("#type")
        assert expand_prefix("http://x/y", ir.prefixes) == "http://x/y"

    def test_shorthand_po_datatype_and_lang(self):
        ir = parse_document("""
prefixes: {ex: "http://example.org/", xsd: "http://www.w3.org/2001/XMLSchema#"}
mappings:
  m:
    sources: [['f.csv~csv']]
    subject: ex:x/$(id)
    predicateobjects:
      - [ex:age, $(age), xsd:integer]
      - [ex:bio, $(bio), en~lang]
      - [ex:home, $(website)~iri]
""")
        pos = ir.triples_maps["m"].predicate_objects
        assert pos[0].objects[0].datatype == "xsd:integer"
        assert pos[1].objects[0].language == "en"
        assert pos[2].objects[0].kind == "iri"

    def test_external_refs_and_multi_subjects(self):
        ir = parse_document("""
external: {org: ACME}
prefixes: {ex: "http://example.org/"}
mappings:
  m:
    sources: [['f.csv~csv']]
    subjects:
      - ex:p/$(id)
      - ex:h/$(id)
    predicateobjects:
      - [ex:affiliation, $(_org)]
""")
        tm = ir.triples_maps["m"]
        assert len(tm.subject.templates) == 2
        assert tm.predicate_objects[0].objects[0].value == "ACME"

    def test_template_refs(self):
        assert template_refs("ex:d/$(a)/$(b)") == ["a", "b"]


class TestMaterializeAsserted:
    def test_flagship_counts_and_values(self, spark, ir, dp_df):
        t = materialize_asserted(dp_df, ir, "datasetTM")
        rows = t.collect()
        # 4 predicate-objects × 3 rows
        assert len(rows) == 12
        by_pred = {}
        for r in rows:
            by_pred.setdefault(r.predicate, []).append(r)
        assert len(by_pred["http://purl.org/dc/terms/title"]) == 3
        subj = {r.subject for r in rows}
        assert "http://example.org/dataset/DS-000001" in subj

    def test_sanitization(self, spark, ir, dp_df):
        t = materialize_asserted(dp_df, ir, "datasetTM")
        pubs = {r.object for r in t.collect()
                if r.predicate == "http://purl.org/dc/terms/publisher"}
        # "data team" → data_team ; "risk&compliance" → risk_compliance
        assert "http://example.org/org/data_team" in pubs
        assert "http://example.org/org/risk_compliance" in pubs

    def test_iri_passthrough(self, spark, ir, dp_df):
        t = materialize_asserted(dp_df, ir, "datasetThemeTM")
        objs = {r.object for r in t.collect()}
        assert objs == {
            "http://example.org/themes/CustomerData",
            "http://example.org/themes/Risk",
            "http://example.org/themes/Credit",
        }

    def test_datatypes_carried(self, spark, ir, dp_df):
        t = materialize_asserted(dp_df, ir, "datasetTM")
        dts = {(r.predicate, r.object_datatype) for r in t.collect()}
        assert ("http://purl.org/dc/terms/issued",
                "http://www.w3.org/2001/XMLSchema#date") in dts

    def test_blank_row_filter(self, spark, ir):
        df = ir and self._df_with_blank(spark)
        t = materialize_asserted(df, ir, "datasetTM")
        subs = {r.subject for r in t.collect()}
        assert not any("unknown" in s for s in subs)
        assert len(subs) == 1

    def _df_with_blank(self, spark):
        return spark.createDataFrame(
            [("DS-1", "t", "2024-01-01", "o", "http://t/x"),
             ("", "t2", "2024-01-02", "o2", "http://t/y"),
             (None, "t3", "2024-01-03", "o3", "http://t/z")],
            DP_COLS)


class TestAnnotations:
    def test_cardinality_and_reifier_determinism(self, spark, ir, dp_df, lin_df):
        ann = materialize_annotations(lin_df, dp_df, ir, "themeGovernanceTM")
        rows = ann.collect()
        # 3 lineage rows each matching exactly 1 theme triple × 4 annotations
        assert len(rows) == 12
        reifiers = {r.reifier for r in rows}
        assert len(reifiers) == 3  # one reifier per (lineage row, quoted triple)
        # deterministic: re-materialize → same ids
        rows2 = materialize_annotations(lin_df, dp_df, ir,
                                        "themeGovernanceTM").collect()
        assert {r.reifier for r in rows2} == reifiers

    def test_quoted_struct(self, spark, ir, dp_df, lin_df):
        ann = materialize_annotations(lin_df, dp_df, ir, "themeGovernanceTM")
        q = ann.select("quoted.s", "quoted.p", "quoted.o").distinct().collect()
        assert {r.p for r in q} == {"http://www.w3.org/ns/dcat#theme"}
        assert {r.s for r in q} == {
            "http://example.org/dataset/DS-000001",
            "http://example.org/dataset/DS-000002"}

    def test_fanout_1_to_n(self, spark, ir, dp_df, lin_df):
        # DS-000001 has 2 lineage rows → 2 reifiers on the same quoted triple
        ann = materialize_annotations(lin_df, dp_df, ir, "themeGovernanceTM")
        per_quoted = (ann.where("quoted.s = 'http://example.org/dataset/DS-000001'")
                      .select("reifier").distinct().count())
        assert per_quoted == 2

    def test_quads_include_reifies_links(self, spark, ir, dp_df, lin_df):
        ann = materialize_annotations(lin_df, dp_df, ir, "themeGovernanceTM")
        quads = annotations_to_quads(ann)
        # 12 annotation quads + 3 reifies links
        assert quads.count() == 15

    def test_document_end_to_end(self, spark, ir, dp_df, lin_df):
        sources = {"datasetTM": dp_df, "datasetThemeTM": dp_df,
                   "themeGovernanceTM": lin_df, "ingestActivityTM": lin_df}
        triples, ann = materialize_document(sources, ir)
        # datasetTM 12 + themeTM 3 + activityTM 9
        assert triples.count() == 24
        assert ann.count() == 12


class TestConditions:
    def test_po_condition_executed(self, spark):
        ir = parse_document("""
prefixes: {ex: "http://example.org/"}
mappings:
  m:
    sources: [['f.csv~csv']]
    subject: ex:x/$(id)
    predicateobjects:
      - predicates: ex:status
        objects: $(status)
        condition:
          function: equal
          parameters: [[str1, "$(status)"], [str2, "active"]]
""")
        df = spark.createDataFrame(
            [("1", "active"), ("2", "inactive")], ["id", "status"])
        t = materialize_asserted(df, ir, "m")
        rows = t.collect()
        assert len(rows) == 1 and rows[0].object == "active"


def test_required_columns_and_validation():
    from etl_pipeline_rdf_star_spark.mapping.compiler import (
        required_columns,
        validate_mapping_against_schema,
    )
    from etl_pipeline_rdf_star_spark.mapping.flagship import flagship_ir

    ir = flagship_ir()
    req = required_columns(ir, "file")
    assert {"repo", "path", "commit", "content_sha256"} <= req
    ok = validate_mapping_against_schema(
        ir,
        {
            name: ["repo", "path", "commit", "lang", "content_sha256",
                   "confidence", "file_key"]
            for name in ir.triples_maps
        },
    )
    assert ok == []
    bad = validate_mapping_against_schema(ir, {name: ["repo"] for name in ir.triples_maps})
    assert any("missing column 'path'" in p for p in bad)
