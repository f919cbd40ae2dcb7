"""PySpark-native RDF-star CDC/ETL engine.

A from-scratch rebuild of the query and data-processing capabilities of
Rxcthefirst/ETL-Pipeline-RDF-Star (a polars+pyoxigraph row-to-triple ETL
server) as an idiomatic Spark engine:

- YARRRML(-star) mappings are compiled ONCE to Catalyst ``Column``
  expressions (template instantiation, IRI sanitization, prefix expansion,
  typed/lang literals, quoted-triple joins) — no per-row Python anywhere.
- Materialization produces two DataFrames: asserted triples and RDF-star
  annotations (quoted triple = nested struct column).
- The sink is a lake table (Iceberg semantics: snapshots, MERGE-by-key,
  schema evolution, time travel) keyed on ``(repo, path)``.
- CDC change events flow through Structured Streaming ``foreachBatch``
  with latest-per-key dedup, salted skew handling, and idempotent MERGE
  (exactly-once via a checkpointed batch ledger).

Reference parity citations use ``<file>:<line>`` into /root/reference.
"""

__version__ = "0.1.0"
