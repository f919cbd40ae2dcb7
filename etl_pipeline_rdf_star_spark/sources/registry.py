"""Source connectors: SourceSpec → DataFrame (SURVEY §2.1 S1-S10).

The reference wraps polars/requests/sqlite3 behind a ``@register_source``
factory (sources/__init__.py:238-277); here each source type is a small
builder returning a *lazy* Spark DataFrame so Catalyst sees the whole plan
(column pruning + predicate pushdown reach the scan).

Scale notes per connector:
* csv/tsv/json/xml/parquet — native distributed scans; schemas may be
  supplied for determinism (inference is a convenience for small files).
* jdbc — pushes the query down (``query`` option); partitioned reads via
  partitionColumn/numPartitions options pass through.
* http/sparql — inherently driver-side (one endpoint), matching the
  reference (sources/remote/http.py); rows land in a parallelized
  DataFrame. Keep off the hot path; a fetcher callable is injectable so
  tests run without network.
"""

from __future__ import annotations

import json as _json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from ..mapping.ir import SourceSpec

_ENV_RE = re.compile(r"\$\{([^}]+)\}")


def interpolate_env(text: str, env: dict[str, str] | None = None) -> str:
    """``${VAR}`` interpolation (reference sources/__init__.py:30-65)."""
    env = env if env is not None else dict(os.environ)
    return _ENV_RE.sub(lambda m: env.get(m.group(1), m.group(0)), text)


SourceBuilder = Callable[[SparkSession, SourceSpec, str], DataFrame]
_REGISTRY: dict[str, SourceBuilder] = {}


def register_source(fmt: str):
    def deco(fn: SourceBuilder) -> SourceBuilder:
        _REGISTRY[fmt] = fn
        return fn

    return deco


def registered_formats() -> list[str]:
    return sorted(_REGISTRY)


def load_source(
    spark: SparkSession, spec: SourceSpec, base_dir: str = "."
) -> DataFrame:
    """Dispatch (reference create_source, sources/__init__.py:252-277)."""
    fmt = spec.fmt.lower()
    if fmt not in _REGISTRY:
        raise ValueError(f"unregistered source format: {fmt!r}")
    return _REGISTRY[fmt](spark, spec, base_dir)


def _resolve(access: str, base_dir: str) -> str:
    access = interpolate_env(access)
    if access.startswith(("http://", "https://", "jdbc:")) or os.path.isabs(access):
        return access
    return os.path.join(base_dir, access)


# -- flattening (reference json_source.py:28-54: user.name → user_name) -----


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten struct columns into ``parent_child`` columns —
    pure projection, no shuffle. Arrays are left intact (explode is the
    iterator's job, not the flattener's)."""
    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        if not struct_cols:
            return df
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                for sub in f.dataType.fields:
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(
                            f"{f.name}{sep}{sub.name}"
                        )
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)


# -- file formats ------------------------------------------------------------


@register_source("csv")
def _csv(spark: SparkSession, spec: SourceSpec, base_dir: str) -> DataFrame:
    """S1 (sources/csv_source.py:18-45)."""
    opts = {
        "header": "true",
        "sep": spec.delimiter or ",",
        "inferSchema": spec.options.get("inferSchema", "true"),
        **{k: v for k, v in spec.options.items() if k not in {"schema"}},
    }
    reader = spark.read.options(**opts)
    if "schema" in spec.options:
        reader = reader.schema(spec.options["schema"])
    return reader.csv(_resolve(spec.access, base_dir))


@register_source("tsv")
def _tsv(spark: SparkSession, spec: SourceSpec, base_dir: str) -> DataFrame:
    """S2 (sources/csv_source.py:48-56)."""
    spec2 = SourceSpec(
        access=spec.access,
        fmt="csv",
        delimiter="\t",
        options=spec.options,
        name=spec.name,
    )
    return _csv(spark, spec2, base_dir)


def _jsonpath_to_cols(path: str) -> list[str]:
    """Parse the supported JSONPath subset ``$.a.b[*]`` → ["a","b"]
    (reference iterator semantics, sources/json_source.py:57-96)."""
    p = path.strip()
    if p.startswith("$"):
        p = p[1:]
    parts = [seg for seg in p.replace("[*]", "").split(".") if seg]
    return parts


@register_source("json")
def _json_src(spark: SparkSession, spec: SourceSpec, base_dir: str) -> DataFrame:
    """S3: JSON + iterator + flatten (sources/json_source.py:176-236)."""
    df = spark.read.option("multiLine", "true").json(_resolve(spec.access, base_dir))
    if spec.iterator:
        for seg in _jsonpath_to_cols(spec.iterator):
            if seg not in df.columns:
                raise ValueError(
                    f"iterator segment {seg!r} not found in {df.columns}"
                )
            field = dict(zip(df.columns, df.schema.fields))[seg]
            if isinstance(field.dataType, ArrayType):
                df = df.select(F.explode(F.col(f"`{seg}`")).alias("_it"))
                df = df.select("_it.*")
            else:
                df = df.select(F.col(f"`{seg}`.*"))
    return flatten_structs(df)


@register_source("xml")
def _xml(spark: SparkSession, spec: SourceSpec, base_dir: str) -> DataFrame:
    """S4: Spark 4 native XML; iterator ``//product`` → rowTag. Attributes
    surface as ``_attr`` columns (reference prefixes ``@`` —
    sources/xml_source.py:27-69; we keep Spark's ``_`` convention)."""
    row_tag = (spec.iterator or "//row").strip("/").split("/")[-1]
    return flatten_structs(
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .load(_resolve(spec.access, base_dir))
    )


@register_source("parquet")
def _parquet(spark: SparkSession, spec: SourceSpec, base_dir: str) -> DataFrame:
    return spark.read.parquet(_resolve(spec.access, base_dir))


# -- databases (S5-S7) -------------------------------------------------------


@register_source("jdbc")
def _jdbc(spark: SparkSession, spec: SourceSpec, base_dir: str) -> DataFrame:
    """S5-S7: one JDBC path covers sqlite/postgres/mysql — the reference's
    three near-identical connectors (sources/database/*.py) collapse into
    Spark's jdbc source with query pushdown. Driver jars go on the
    classpath; integration-tested end-to-end against the EMBEDDED Apache
    Derby database that ships with Spark (DDL + rows through java.sql,
    read back with pushed-down query and filters —
    tests/test_sources.py::test_jdbc_against_live_embedded_derby)."""
    url = interpolate_env(spec.access)
    opts = {"url": url, **spec.options}
    if spec.iterator:  # iterator doubles as the SQL query, pushed down
        opts["query"] = spec.iterator
    return spark.read.format("jdbc").options(**opts).load()


# -- remote (S8-S9) ----------------------------------------------------------


def _default_fetcher(url: str, headers: dict[str, str]) -> str:
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as r:  # noqa: S310
        return r.read().decode("utf-8")


@register_source("http")
def _http(spark: SparkSession, spec: SourceSpec, base_dir: str) -> DataFrame:
    """S8 (sources/remote/http.py:33-146): driver-side GET → JSON/CSV rows.
    ``spec.options['fetcher']`` injects a fake for offline tests."""
    fetcher = spec.options.get("fetcher", _default_fetcher)
    headers = {
        k[len("header."):]: interpolate_env(v)
        for k, v in spec.options.items()
        if isinstance(k, str) and k.startswith("header.")
    }
    body = fetcher(interpolate_env(spec.access), headers)
    if spec.options.get("body_format", "json") == "csv":
        lines = [ln for ln in body.splitlines() if ln.strip()]
        header = lines[0].split(",")
        rows = [dict(zip(header, ln.split(","))) for ln in lines[1:]]
    else:
        data = _json.loads(body)
        if spec.iterator:
            for seg in _jsonpath_to_cols(spec.iterator):
                data = data[seg]
        rows = data if isinstance(data, list) else [data]
    # route through the JSON reader so nested dicts become StructType
    # (createDataFrame would infer MapType and defeat flattening)
    df = spark.read.json(
        spark.sparkContext.parallelize([_json.dumps(r) for r in rows])
    )
    return flatten_structs(df)


@register_source("sparql")
def _sparql(spark: SparkSession, spec: SourceSpec, base_dir: str) -> DataFrame:
    """S9 (sources/remote/sparql.py:34-115): SELECT → bindings table via the
    SPARQL-JSON protocol (application/sparql-results+json)."""
    fetcher = spec.options.get("fetcher", _default_fetcher)
    query = spec.iterator or spec.options.get("query", "SELECT * WHERE {?s ?p ?o}")
    import urllib.parse

    url = (
        interpolate_env(spec.access)
        + "?query="
        + urllib.parse.quote(query)
    )
    body = fetcher(url, {"Accept": "application/sparql-results+json"})
    res = _json.loads(body)
    cols = res["head"]["vars"]
    rows = [
        {v: b.get(v, {}).get("value") for v in cols}
        for b in res["results"]["bindings"]
    ]
    return spark.createDataFrame(rows) if rows else spark.createDataFrame([], ", ".join(f"{c} string" for c in cols))
