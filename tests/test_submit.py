"""Cluster-deployment contract: the engine runs under ``spark-submit
--py-files engine.zip`` exactly as documented in cdc_submit.py (north
star: deployed via spark-submit --py-files at N and 4N executors).

The child JVM is launched from a NEUTRAL working directory with the
package importable only from the zip, so a pass proves the whole ingest
path (Structured Streaming availableNow → foreachBatch MERGE → ledger
commit → lake read-back) works from a zip import, not from the repo
checkout leaking onto sys.path.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_deployment(spark, tmp_path):
    from etl_pipeline_rdf_star_spark.data import synth

    ev_dir = str(tmp_path / "events")
    events = synth.cdc_events(spark, SF_DIR)
    events.repartition(4).write.parquet(ev_dir)

    # expected live state: last op per (repo, path) by seq, minus deletes
    last = (
        events.groupBy("repo", "path")
        .agg(F.max_by("op", "seq").alias("op"))
        .where(F.col("op") != "D")
    )
    expected_live = last.count()

    zip_path = str(tmp_path / "engine.zip")
    pkg = os.path.join(REPO, "etl_pipeline_rdf_star_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))

    # neutral cwd + a copied entry script: the package must resolve from
    # the zip (--py-files), never from the repo checkout
    workdir = tmp_path / "neutral"
    workdir.mkdir()
    entry = str(workdir / "cdc_submit.py")
    shutil.copy(os.path.join(REPO, "cdc_submit.py"), entry)

    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            entry,
            "--events", ev_dir,
            "--warehouse", str(tmp_path / "wh"),
            "--checkpoint", str(tmp_path / "ck"),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(workdir),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["live_rows"] == expected_live
    assert res["batches"] >= 1
