"""Deterministic synthesis of the CDC input: a source-code-repository table
``(repo, path, commit, lang, content)`` and an insert/update/delete change-event
log over it.

Shape mandated by BASELINE.json ``input_hint``. The reference's analogue is the
seeded CSV generator (``csv_generator/generate_benchmark_data.py``, seed 42) and
the simulated batch-2 change set (``simulate_batch_flow.py:143-171`` — C001
update, C004 delete, C005 insert); here the whole event log is a deterministic
pure function of the row index so that

* the same log can be produced by Spark **and** by DuckDB SQL (driver oracle),
* replay tests can re-derive the expected final state independently,
* arbitrary scales are generated from ``spark.range`` without materializing
  anything on the driver (no collect; scales to 10^10 rows as a range scan).

Determinism contract: every derived value uses only integer arithmetic on the
row index plus ``md5`` (identical semantics in Spark and DuckDB) and text from
the driver-provided ``documents`` parquet (seed-42, read-only).

Skew (north rule: "explicit skew handling for hot repos"): file→repo assignment
is intentionally skewed — every 5th file lands in ``repo_0`` (~21% of keys),
the rest spread over 36 repos. The CDC upsert stage must absorb that.

Event semantics:
* events are globally ordered by ``seq``; per file, versions arrive in seq order
  (file f gets events at seq = f, f+n_files, f+2*n_files, ...);
* ``op``: first version is I; a later version is D when ``(file_id+ver) % 13 == 0``
  else U. U after D re-inserts (standard CDC upsert semantics);
* final state = latest event per (repo, path) by seq, dropped if it is a D.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ScaleParams:
    n_docs: int
    n_files: int
    n_events: int


def scale_params(n_docs: int, files_per_doc: int = 4, versions: int = 3) -> ScaleParams:
    """Default scale: 4 files per document row, ~3 versions per file."""
    n_files = max(1, n_docs * files_per_doc)
    return ScaleParams(n_docs=n_docs, n_files=n_files, n_events=n_files * versions)


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


_N_DOCS_CACHE: dict[str, int] = {}


def n_docs(sf_dir: str) -> int:
    """Row count of the documents table from parquet footer metadata —
    driver-side, no Spark job (query builders must stay lazy)."""
    if sf_dir not in _N_DOCS_CACHE:
        import pyarrow.dataset as ds

        _N_DOCS_CACHE[sf_dir] = ds.dataset(f"{sf_dir}/documents.parquet").count_rows()
    return _N_DOCS_CACHE[sf_dir]


def cdc_events(
    spark: SparkSession,
    sf_dir: str,
    n_files: int | None = None,
    n_events: int | None = None,
    content_repeat: int = 1,
) -> DataFrame:
    """The change-event log: ``(seq, op, repo, path, commit, lang, content,
    event_ts)``, deterministic, ordered by ``seq``.

    Built from ``spark.range`` (a parallel, partition-local generator — no
    driver materialization) joined to ``documents`` for realistic text. The
    join is broadcast (documents is the small dimension at every sf).
    """
    docs = _docs(spark, sf_dir)
    nd = n_docs(sf_dir)
    p = scale_params(nd)
    nf = n_files or p.n_files
    ne = n_events or p.n_events

    ev = spark.range(ne).select(
        F.col("id").alias("seq"),
        (F.col("id") % nf).alias("file_id"),
        (F.col("id") / nf).cast("long").alias("ver"),
    )
    ev = ev.withColumn("doc_id", F.col("file_id") % nd)
    ev = ev.join(F.broadcast(docs), on="doc_id", how="inner")
    repo_num = F.when(F.col("file_id") % 5 == 0, F.lit(0)).otherwise(
        F.col("file_id") % 37
    )
    op = (
        F.when(F.col("ver") == 0, F.lit("I"))
        .when((F.col("file_id") + F.col("ver")) % 13 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return ev.select(
        "seq",
        op.alias("op"),
        F.concat(F.lit("repo_"), repo_num.cast("string")).alias("repo"),
        F.concat(
            F.lit("src/d"),
            (F.col("file_id") % 97).cast("string"),
            F.lit("/f_"),
            F.col("file_id").cast("string"),
            F.lit("."),
            F.col("lang"),
        ).alias("path"),
        F.substring(
            F.md5(
                F.concat(
                    F.lit("c"),
                    F.col("file_id").cast("string"),
                    F.lit("-"),
                    F.col("ver").cast("string"),
                )
            ),
            1,
            12,
        ).alias("commit"),
        F.col("lang"),
        F.concat(
            # content_repeat > 1 scales payload size toward realistic
            # source-file sizes (KBs) for throughput benchmarks; the
            # derivation stays deterministic and SQL-mirrorable
            F.col("text")
            if content_repeat <= 1
            else F.repeat(F.concat(F.col("text"), F.lit(" ")), content_repeat),
            F.lit(" v"),
            F.col("ver").cast("string"),
        ).alias("content"),
        F.timestamp_add(
            "SECOND", F.col("seq"), F.lit("2024-01-01 00:00:00").cast("timestamp")
        ).alias("event_ts"),
    )


def repo_files(
    spark: SparkSession, sf_dir: str, n_files: int | None = None
) -> DataFrame:
    """The initial ``repo_files`` snapshot: version-0 insert of every file —
    exactly the rows of the event log with ``ver = 0``."""
    nf = n_files or scale_params(n_docs(sf_dir)).n_files
    return cdc_events(spark, sf_dir, n_files=nf, n_events=nf).select(
        "repo", "path", "commit", "lang", "content"
    )


def expected_final_state(
    spark: SparkSession,
    sf_dir: str,
    n_files: int | None = None,
    n_events: int | None = None,
) -> DataFrame:
    """Oracle final state: latest event per (repo, path), minus deletes.
    This is what replay-to-convergence must produce regardless of batch
    partitioning, duplication, or intra-batch shuffling."""
    from pyspark.sql import Window

    ev = cdc_events(spark, sf_dir, n_files, n_events)
    w = Window.partitionBy("repo", "path").orderBy(F.col("seq").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("repo", "path", "commit", "lang", "content")
    )


# ---------------------------------------------------------------------------
# DuckDB side (driver oracle / independent verification)
# ---------------------------------------------------------------------------


def cdc_events_sql(n_files: int | None = None, n_events: int | None = None) -> str:
    """DuckDB SQL producing the byte-identical event log (documents is a
    pre-registered view in the driver's oracle harness).

    With no arguments the log is **scale-free**: the default scale
    (4 files/doc × 3 versions) is derived from ``count(documents)`` inside
    the SQL itself, matching :func:`cdc_events`'s defaults at any sf.
    DuckDB's ``range()`` only takes constants, so the index space
    0..12·n_docs-1 is generated as the bijection ``v·n_docs + doc_id`` over
    ``documents × range(0,12)``."""
    if n_files is None:
        idx = """
base AS (
  SELECT (t.v * nd.n + d.doc_id) AS seq,
         ((t.v * nd.n + d.doc_id) % (4 * nd.n)) AS file_id,
         ((t.v * nd.n + d.doc_id) // (4 * nd.n)) AS ver
  FROM documents d CROSS JOIN range(0, 12) t(v) CROSS JOIN nd
),"""
    else:
        idx = f"""
base AS (
  SELECT t.i AS seq,
         (t.i % {n_files}) AS file_id,
         (t.i // {n_files}) AS ver
  FROM range(0, {n_events}) t(i)
),"""
    return f"""
WITH nd AS (SELECT count(*) AS n FROM documents),{idx}
ev AS (
  SELECT b.seq, b.file_id, b.ver, d.lang, d.text
  FROM base b CROSS JOIN nd
  JOIN documents d ON d.doc_id = b.file_id % nd.n
)
SELECT
  seq,
  CASE WHEN ver = 0 THEN 'I'
       WHEN (file_id + ver) % 13 = 0 THEN 'D'
       ELSE 'U' END AS op,
  'repo_' || CAST(CASE WHEN file_id % 5 = 0 THEN 0 ELSE file_id % 37 END AS VARCHAR) AS repo,
  'src/d' || CAST(file_id % 97 AS VARCHAR) || '/f_' || CAST(file_id AS VARCHAR)
      || '.' || lang AS path,
  substr(md5('c' || CAST(file_id AS VARCHAR) || '-' || CAST(ver AS VARCHAR)), 1, 12)
      AS "commit",
  lang,
  text || ' v' || CAST(ver AS VARCHAR) AS content,
  TIMESTAMP '2024-01-01 00:00:00' + seq * INTERVAL 1 SECOND AS event_ts
FROM ev
"""


def repo_files_sql(n_files: int | None = None) -> str:
    """Version-0 snapshot (scale-free when n_files is None)."""
    inner = cdc_events_sql(n_files, n_files)
    return f"""
SELECT repo, path, "commit", lang, content
FROM ({inner}) e
{"WHERE e.seq < (SELECT 4 * count(*) FROM documents)" if n_files is None else ""}
"""


def expected_final_state_sql(
    n_files: int | None = None, n_events: int | None = None
) -> str:
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM ({cdc_events_sql(n_files, n_events)}) e
)
SELECT repo, path, "commit", lang, content
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


# ---------------------------------------------------------------------------
# scale-up generators for the ANN/dedup bench (round-2 VERDICT item 2):
# deterministic, Catalyst-only — no data files, any target size
# ---------------------------------------------------------------------------


def _unit_hash(*cols) -> F.Column:
    """Deterministic pseudo-uniform in [-1, 1) from xxhash64 of the args."""
    return (F.pmod(F.xxhash64(*cols), F.lit(2000)) - 1000) / 1000.0


def synth_embeddings(
    spark: SparkSession, n: int, dim: int = 32, n_clusters: int = 200
) -> DataFrame:
    """(vec_id, embedding float[dim]) with planted cluster structure:
    vector = cluster center + 15% noise, so cosine neighbors concentrate
    in-cluster and ANN recall is a meaningful measurement (pure-noise
    vectors make every method look alike). One projection, no shuffle."""
    d_idx = F.sequence(F.lit(0), F.lit(dim - 1))
    cluster = F.pmod(F.col("id"), F.lit(n_clusters))
    vec = F.transform(
        d_idx,
        lambda d: (
            _unit_hash(F.lit("ctr"), cluster, d)
            + 0.15 * _unit_hash(F.lit("nz"), F.col("id"), d)
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def synth_near_dup_docs(
    spark: SparkSession,
    n: int,
    words_per_doc: int = 40,
    vocab: int = 5000,
    dup_every: int = 20,
    boilerplate_pct: int = 30,
) -> DataFrame:
    """(doc_id, text) where every ``dup_every``-th doc is a NEAR duplicate
    of its predecessor (same word sequence, last word replaced) — planted
    ground truth for dedup benches. ``boilerplate_pct``% of word slots
    draw a position-determined boilerplate token shared across documents:
    runs of ≥3 boilerplate words create HOT shingles (document frequency
    in the thousands), reproducing the Zipf-headed shape of real corpora
    that makes uncapped inverted-index joins quadratic — exactly the
    regime LSH bucketing exists for. Near-dup Jaccard of random pairs
    stays ≪ 0.8 (≈1 shared shingle), so ground truth is unambiguous."""
    is_dup = F.pmod(F.col("id"), F.lit(dup_every)) == (dup_every - 1)
    base_id = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    w_idx = F.sequence(F.lit(0), F.lit(words_per_doc - 1))
    words = F.transform(
        w_idx,
        lambda i: F.when(
            F.pmod(F.xxhash64(base_id, i, F.lit("bp")), F.lit(100))
            < boilerplate_pct,
            F.concat(F.lit("b"), i.cast("string")),
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(base_id, i), F.lit(vocab)).cast("string"),
            )
        ),
    )
    # near-dup: replace the final word with a doc-unique token
    words = F.when(
        is_dup,
        F.concat(
            F.slice(words, 1, words_per_doc - 1),
            F.array(F.concat(F.lit("u"), F.col("id").cast("string"))),
        ),
    ).otherwise(words)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )
