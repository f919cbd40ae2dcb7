"""LakeTable: MERGE semantics, time travel, schema evolution, idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_rdf_star_spark.storage.lake import LakeTable, table_fingerprint


@pytest.fixture()
def tbl(spark, tmp_path):
    return LakeTable(spark, str(tmp_path / "t"), key_cols=["k"], n_buckets=4)


def _df(spark, rows, schema="k string, v long"):
    return spark.createDataFrame(rows, schema)


def test_create_and_read(spark, tbl):
    tbl.create(_df(spark, [("a", 1), ("b", 2)]))
    got = {(r.k, r.v) for r in tbl.read().collect()}
    assert got == {("a", 1), ("b", 2)}


def test_merge_upsert_and_delete(spark, tbl):
    tbl.create(_df(spark, [("a", 1), ("b", 2), ("c", 3)]))
    src = _df(
        spark,
        [("b", 20, "U"), ("c", None, "D"), ("d", 4, "I")],
        "k string, v long, op string",
    )
    st = tbl.merge(src, "b1", op_col="op")
    assert not st.skipped
    got = {(r.k, r.v) for r in tbl.read().collect()}
    assert got == {("a", 1), ("b", 20), ("d", 4)}


def test_merge_idempotent_batch_id(spark, tbl):
    tbl.create(_df(spark, [("a", 1)]))
    src = _df(spark, [("a", 100)])
    assert not tbl.merge(src, "b1").skipped
    fp = table_fingerprint(tbl.read(), ["k", "v"])
    st2 = tbl.merge(_df(spark, [("a", 999)]), "b1")  # same id → no-op
    assert st2.skipped
    assert table_fingerprint(tbl.read(), ["k", "v"]) == fp


def test_merge_only_rewrites_affected_buckets(spark, tbl):
    tbl.create(_df(spark, [(f"k{i}", i) for i in range(100)]))
    st = tbl.merge(_df(spark, [("k0", 1000)]), "b1")
    assert st.rewritten_buckets == 1
    snap = tbl.snapshot()
    # untouched buckets keep their original (v0) data files
    v0_files = {f["path"] for f in tbl.snapshot(0).files}
    kept = {f["path"] for f in snap.files} & v0_files
    assert kept  # most files survive the merge untouched


def test_time_travel(spark, tbl):
    tbl.create(_df(spark, [("a", 1)]))
    tbl.merge(_df(spark, [("a", 2)]), "b1")
    assert [r.v for r in tbl.read(version=0).collect()] == [1]
    assert [r.v for r in tbl.read().collect()] == [2]


def test_schema_evolution_add_column(spark, tbl):
    tbl.create(_df(spark, [("a", 1), ("b", 2)]))
    src = _df(spark, [("a", 10, "new")], "k string, v long, extra string")
    tbl.merge(src, "b1")
    rows = {r.k: (r.v, r.extra) for r in tbl.read().collect()}
    # new column added in place; untouched rows read as null
    assert rows["a"] == (10, "new")
    assert rows["b"] == (2, None)


def test_order_col_guard_rejects_stale(spark, tbl):
    tbl.create(
        _df(spark, [("a", 1, 100)], "k string, v long, seq long")
    )
    # stale update (seq 50 < 100) must not win
    tbl.merge(
        _df(spark, [("a", 999, 50)], "k string, v long, seq long"),
        "b1",
        order_col="seq",
    )
    assert [r.v for r in tbl.read().collect()] == [1]
    # newer update wins
    tbl.merge(
        _df(spark, [("a", 7, 200)], "k string, v long, seq long"),
        "b2",
        order_col="seq",
    )
    assert [r.v for r in tbl.read().collect()] == [7]


def test_append_ledger(spark, tmp_path):
    led = LakeTable(spark, str(tmp_path / "led"))
    led.append(_df(spark, [("b0", 1)], "batch_id string, n long"), "b0")
    led.append(_df(spark, [("b1", 2)], "batch_id string, n long"), "b1")
    led.append(_df(spark, [("b1", 99)], "batch_id string, n long"), "b1")  # dup
    assert sorted((r.batch_id, r.n) for r in led.read().collect()) == [
        ("b0", 1),
        ("b1", 2),
    ]


def test_concurrent_commit_raises(spark, tmp_path):
    """Two writers racing the same version: the loser gets
    ConcurrentCommitError, the winner's snapshot is untouched."""
    import pytest as _pytest

    from etl_pipeline_rdf_star_spark.storage.lake import ConcurrentCommitError

    tbl = LakeTable(spark, str(tmp_path / "cc"), key_cols=["k"], n_buckets=2)
    tbl.create(_df(spark, [("a", 1)], "k string, v long"))
    loser = LakeTable(spark, str(tmp_path / "cc"), key_cols=["k"], n_buckets=2)
    snap_stale = loser.snapshot()  # both see version 0
    tbl.merge(_df(spark, [("a", 2)], "k string, v long"), "winner")
    # the loser now tries to publish its own version 1 from the stale view
    from etl_pipeline_rdf_star_spark.storage.lake import Snapshot

    stale_next = Snapshot(
        version=snap_stale.version + 1,
        operation="merge",
        files=snap_stale.files,
        schema_json=snap_stale.schema_json,
        committed_batches=snap_stale.committed_batches + ["loser"],
    )
    with _pytest.raises(ConcurrentCommitError):
        loser._commit(stale_next)
    assert "winner" in tbl.snapshot().committed_batches
    assert "loser" not in tbl.snapshot().committed_batches
