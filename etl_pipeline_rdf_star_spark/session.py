"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same config block is what we'd pass to
``spark-submit`` on a real cluster (AQE on, skew-join handling on, Arrow
enabled for the few pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-pipeline-rdf-star-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or _default_shuffle_partitions(cores)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # task-side output commit (v2): job commit does not serially rename
        # every task file on the driver — standard practice for many-file
        # micro-batch sinks
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # JVM unified logging defaults WARNING-level messages to STDOUT
        # (observed: "[gc,alloc] ... Retried waiting for GCLocker" under
        # allocation pressure), which corrupts harnesses that parse this
        # process's stdout as one JSON line (bench.py contract). Merely
        # ADDING "-Xlog:gc*=warning:stderr" is not enough — the default
        # "stdout all=warning" output stays active and the message goes
        # to BOTH streams (verified via -Xlog:logging=debug). Disable
        # the default config first, then route all warnings to stderr.
        .config(
            "spark.driver.extraJavaOptions",
            "-Xlog:disable -Xlog:all=warning:stderr",
        )
    )
    return builder.getOrCreate()


def _default_shuffle_partitions(cores: int | str) -> int:
    try:
        n = int(cores)
    except (TypeError, ValueError):
        n = os.cpu_count() or 8
    return max(2 * n, 8)
