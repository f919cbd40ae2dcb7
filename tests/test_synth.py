"""Deterministic generator: Spark and DuckDB must produce byte-identical
event logs (the foundation of every oracle comparison)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_pipeline_rdf_star_spark.data import synth


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return c


def test_event_log_parity(spark, sf_dir, con):
    sdf = synth.cdc_events(spark, sf_dir).orderBy("seq").toPandas()
    ddf = con.sql(synth.cdc_events_sql() + " ORDER BY seq").df()
    assert len(sdf) == len(ddf)
    for col in sdf.columns:
        assert (sdf[col].astype(str) == ddf[col].astype(str)).all(), col


def test_final_state_parity(spark, sf_dir, con):
    s = synth.expected_final_state(spark, sf_dir)
    d = con.sql(
        f"SELECT count(*), count(DISTINCT repo) FROM ({synth.expected_final_state_sql()})"
    ).fetchone()
    assert (s.count(), s.select("repo").distinct().count()) == d


def test_event_semantics(spark, sf_dir):
    ev = synth.cdc_events(spark, sf_dir)
    # first version of every file is an insert
    assert ev.where((F.col("seq") < 2000) & (F.col("op") != "I")).isEmpty()
    # ops are only I/U/D
    assert {r[0] for r in ev.select("op").distinct().collect()} == {"I", "U", "D"}
    # seq is unique and dense
    n = ev.count()
    assert ev.select("seq").distinct().count() == n
    assert ev.agg(F.max("seq")).collect()[0][0] == n - 1


def test_skew_shape(spark, sf_dir):
    """repo_0 must be hot (~21% of files) — the skew the engine handles."""
    files = synth.repo_files(spark, sf_dir)
    counts = {r.repo: r.n for r in files.groupBy("repo").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert counts["repo_0"] / total > 0.15
    assert len(counts) == 37


def test_content_repeat_scales_payload(spark, sf_dir):
    small = synth.cdc_events(spark, sf_dir, n_files=10, n_events=10)
    big = synth.cdc_events(spark, sf_dir, n_files=10, n_events=10, content_repeat=10)
    ls = small.agg(F.avg(F.length("content"))).collect()[0][0]
    lb = big.agg(F.avg(F.length("content"))).collect()[0][0]
    assert lb > 8 * ls
