"""Salted skew handling + SQL serving views."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_rdf_star_spark.data import synth
from etl_pipeline_rdf_star_spark.operators.skew import (
    salted_agg,
    salted_topk_per_key,
    with_salt,
)


def test_salt_is_deterministic_and_uniformish(spark, sf_dir):
    ev = synth.cdc_events(spark, sf_dir).limit(2000)
    a = with_salt(ev, 8).groupBy("_salt").count().collect()
    b = with_salt(ev, 8).groupBy("_salt").count().collect()
    assert sorted((r._salt, r["count"]) for r in a) == sorted(
        (r._salt, r["count"]) for r in b
    )
    counts = [r["count"] for r in a]
    assert len(counts) == 8 and max(counts) < 3 * min(counts)


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    ev = synth.cdc_events(spark, sf_dir)
    plain = {
        (r.repo): (r.n, r.mx)
        for r in ev.groupBy("repo")
        .agg(F.count("*").alias("n"), F.max("seq").alias("mx"))
        .collect()
    }
    salted = {
        (r.repo): (r.n, r.mx)
        for r in salted_agg(
            ev, ["repo"], {"n": F.count("*"), "mx": (F.max("seq"), "max")}
        ).collect()
    }
    assert plain == salted


def test_salted_agg_min_and_callable_refold(spark, sf_dir):
    ev = synth.cdc_events(spark, sf_dir)
    plain = {
        r.repo: (r.mn, r.total)
        for r in ev.groupBy("repo")
        .agg(F.min("seq").alias("mn"), F.sum("seq").alias("total"))
        .collect()
    }
    salted = {
        r.repo: (r.mn, r.total)
        for r in salted_agg(
            ev,
            ["repo"],
            {"mn": (F.min("seq"), "min"), "total": (F.sum("seq"), F.sum)},
        ).collect()
    }
    assert plain == salted


def test_salted_topk_equals_plain_topk(spark, sf_dir):
    from pyspark.sql import Window

    ev = synth.cdc_events(spark, sf_dir).select("repo", "path", "seq")
    w = Window.partitionBy("repo").orderBy(F.col("seq").desc())
    plain = {
        (r.repo, r.seq)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where("rn <= 3")
        .collect()
    }
    salted = {
        (r.repo, r.seq)
        for r in salted_topk_per_key(ev, "repo", "seq", 3).collect()
    }
    assert plain == salted


def test_sparql_json_bindings(spark):
    """SPARQL 1.1 JSON results adapter: uri/bnode/literal typing, datatype
    and lang folding, RDF-star triple terms, unbound-variable omission."""
    from etl_pipeline_rdf_star_spark.serving import to_sparql_json

    df = spark.createDataFrame(
        [
            (
                "http://example.org/s1",
                "http://example.org/p",
                "42",
                "http://www.w3.org/2001/XMLSchema#integer",
                None,
            ),
            ("b" + "0" * 64, "http://example.org/p", "bonjour", None, "fr"),
            ("http://example.org/s2", "http://example.org/p", None, None, None),
        ],
        "subject string, predicate string, object string, "
        "object_datatype string, object_lang string",
    )
    doc = to_sparql_json(df)
    assert doc["head"]["vars"] == ["subject", "predicate", "object"]
    b0, b1, b2 = doc["results"]["bindings"]
    assert b0["subject"] == {"type": "uri", "value": "http://example.org/s1"}
    assert b0["object"] == {
        "type": "literal",
        "value": "42",
        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
    }
    assert b1["subject"]["type"] == "bnode"
    assert b1["object"] == {"type": "literal", "value": "bonjour", "xml:lang": "fr"}
    assert "object" not in b2  # unbound → omitted per the spec

    from pyspark.sql import Row

    ann = spark.createDataFrame(
        [
            Row(
                quoted=Row(s="http://example.org/s1", p="http://example.org/p", o="en"),
                predicate="http://example.org/confidence",
                object="0.9",
            )
        ]
    )
    d2 = to_sparql_json(ann)
    q = d2["results"]["bindings"][0]["quoted"]
    assert q["type"] == "triple"
    assert q["value"]["subject"]["type"] == "uri"
    assert q["value"]["object"] == {"type": "literal", "value": "en"}


def test_sql_serving_views(spark, tmp_path, sf_dir):
    from etl_pipeline_rdf_star_spark.serving import register_views
    from etl_pipeline_rdf_star_spark.streaming.cdc import CdcEngine

    eng = CdcEngine(spark, str(tmp_path / "wh"))
    eng.replay(synth.cdc_events(spark, sf_dir), num_batches=2)
    names = register_views(spark, eng)
    assert "rdf_triples" in names
    n = spark.sql(
        "SELECT count(*) AS n FROM rdf_triples WHERE predicate LIKE '%lang'"
    ).collect()[0]["n"]
    assert n == spark.sql("SELECT count(*) AS n FROM repo_files").collect()[0]["n"]
    joined = spark.sql(
        """
        SELECT a.predicate, count(*) AS n
        FROM rdf_annotations a
        JOIN rdf_triples t
          ON a.quoted.s = t.subject AND a.quoted.p = t.predicate
         AND a.quoted.o = t.object
        GROUP BY a.predicate
        """
    ).collect()
    assert len(joined) == 4  # 4 annotation predicates, all quoted facts join
    assert spark.sql("SELECT * FROM batches").count() == 2


def test_sparql_json_respects_kind_columns(spark):
    """Review regression: explicit object_kind/subject_kind override value
    sniffing, and subject_kind never leaks as a binding variable."""
    from etl_pipeline_rdf_star_spark.serving import to_sparql_json

    df = spark.createDataFrame(
        [
            ("http://example.org/s", "iri", "urn:isbn:123", "literal"),
            ("b" + "0" * 64, "blank", "http://looks-like-iri", "literal"),
            ("http://example.org/s2", "iri", "b" + "1" * 64, "literal"),
        ],
        "subject string, subject_kind string, object string, object_kind string",
    )
    doc = to_sparql_json(df)
    assert doc["head"]["vars"] == ["subject", "object"]
    b0, b1, b2 = doc["results"]["bindings"]
    assert b0["object"]["type"] == "literal"  # urn: but kind says literal
    assert b1["subject"]["type"] == "bnode"
    assert b1["object"]["type"] == "literal"  # http-ish but kind says literal
    assert b2["object"]["type"] == "literal"  # hash-shaped but literal
    assert all("subject_kind" not in b for b in doc["results"]["bindings"])


def test_pathological_hot_repo_merge_stays_spread(spark, tmp_path):
    """Round-2 VERDICT item 9: a 99%-one-repo event log (far beyond the
    synthetic ~21% skew) must neither funnel MoR ingest into few buckets
    nor blow up replay cost, because bucketing hashes the FULL (repo,
    path) key (storage/lake.py:43-47). Asserts bucket spread, O(batch)
    commit shape, and throughput parity with a uniform log of equal
    size."""
    import time

    from pyspark.sql import functions as F

    from etl_pipeline_rdf_star_spark.streaming.cdc import CdcEngine

    n = 6000

    def _events(hot: bool):
        repo = (
            F.when(F.pmod("id", F.lit(100)) < 99, "repo_hot").otherwise(
                F.concat(F.lit("repo_"), F.pmod("id", F.lit(7)).cast("string"))
            )
            if hot
            else F.concat(F.lit("repo_"), F.pmod("id", F.lit(37)).cast("string"))
        )
        return (
            spark.range(n)
            .select(
                F.col("id").alias("seq"),
                F.lit("I").alias("op"),
                repo.alias("repo"),
                F.concat(F.lit("f_"), F.col("id").cast("string"), F.lit(".py"))
                .alias("path"),
                F.concat(F.lit("c"), (F.col("id") % 13).cast("string"))
                .alias("commit"),
                F.lit("en").alias("lang"),
                F.concat(F.lit("content-"), F.col("id").cast("string"))
                .alias("content"),
                F.lit(None).cast("timestamp").alias("event_ts"),
            )
        )

    timings = {}
    for name, hot in (("uniform", False), ("hot", True)):
        eng = CdcEngine(
            spark, str(tmp_path / name), mode="mor", n_buckets=8
        )
        ev = _events(hot).persist()
        ev.count()
        t0 = time.monotonic()
        eng.replay(ev, num_batches=3, id_prefix=name, seq_hi=n - 1)
        timings[name] = time.monotonic() - t0
        ev.unpersist()
        per_bucket = (
            eng.metrics.read()
            .groupBy("bucket")
            .agg(F.sum("rows").alias("rows"))
            .collect()
        )
        rows = {r["bucket"]: r["rows"] for r in per_bucket}
        assert len(rows) == 8, f"{name}: some buckets empty: {rows}"
        spread = max(rows.values()) / (sum(rows.values()) / len(rows))
        assert spread < 1.5, f"{name}: hot bucket ratio {spread:.2f}: {rows}"
        # O(batch) commit shape: every data commit appends ≤ n_buckets files
        snap = eng.table.snapshot()
        by_version = {}
        for f in snap.files:
            v = f["path"].split("/")[1]
            by_version.setdefault(v, 0)
            by_version[v] += 1
        assert all(c <= 8 for c in by_version.values())
        assert eng.current_state().count() == n
    # throughput parity: identical volume, so the hot log must not cost
    # more than 2x the uniform one (generous CI-noise margin; the real
    # guard is the bucket spread above)
    assert timings["hot"] < timings["uniform"] * 2 + 2.0, timings
