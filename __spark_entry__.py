"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship RDF-star materialization (CDC final state →
asserted triples + quoted-triple provenance annotations) at sf0.001.
``queries``/``oracle_sql`` expose the full corpus in
``etl_pipeline_rdf_star_spark.queries.corpus`` — every entry has a DuckDB
oracle unless the op is not ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_pipeline_rdf_star_spark.queries.corpus import q_high_confidence_facts

    return q_high_confidence_facts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_pipeline_rdf_star_spark.queries import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    from etl_pipeline_rdf_star_spark.queries import oracle_sql_map

    return oracle_sql_map()
