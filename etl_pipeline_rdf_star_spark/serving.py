"""SQL serving surface: register the engine's relations as temp views so
plain ``spark.sql`` replaces the reference's SPARQL endpoint
(fastapi_sparql_server.py:242-351 — HTTP serving is out of scope for this
graft; the query capability is the deliverable).

After ``register_views``::

    spark.sql("SELECT subject, object FROM rdf_triples WHERE predicate LIKE '%lang'")
    spark.sql("SELECT * FROM rdf_annotations WHERE quoted.s = '...'")
    spark.sql("SELECT * FROM batches ORDER BY table_version")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .streaming.cdc import CdcEngine


def register_views(
    spark: SparkSession, engine: CdcEngine, prefix: str = ""
) -> list[str]:
    """Create temp views over the live engine state. Views are lazy —
    each query re-reads the current snapshot (no staleness)."""
    views = {
        f"{prefix}repo_files": engine.current_state(),
        f"{prefix}rdf_files_wide": engine.live_rows(),
        f"{prefix}rdf_triples": engine.triples_view(),
        f"{prefix}rdf_annotations": engine.annotations_view(),
        f"{prefix}batches": engine.batches.read(),
        f"{prefix}batch_metrics": engine.metrics.read(),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return sorted(views)
