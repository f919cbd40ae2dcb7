"""Property-based convergence: for ARBITRARY small CDC event logs — any
key/op/payload sequence, any batch split, forward or reverse application,
with or without duplicated delivery — the engine's final state equals a
sequential one-pass oracle. Complements the fixed synthetic-log tests with
adversarial shapes (delete-then-reinsert chains, single-key floods, empty
batches)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_rdf_star_spark.streaming.cdc import CdcEngine

EVENT = st.tuples(
    st.integers(min_value=0, max_value=4),  # key id
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=9),  # payload version
)

_BASE_TS = datetime(2024, 1, 1)


def _rows(events):
    out = []
    for seq, (k, op, payload) in enumerate(events):
        out.append(
            (
                seq,
                op,
                f"repo_{k % 2}",
                f"f_{k}",
                f"c{payload}",
                "en",
                f"content-{k}-{payload}",
                _BASE_TS + timedelta(seconds=seq),
            )
        )
    return out


def _oracle(events):
    state = {}
    for seq, (k, op, payload) in enumerate(events):
        key = (f"repo_{k % 2}", f"f_{k}")
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = (f"c{payload}", f"content-{k}-{payload}")
    return state


@pytest.mark.parametrize("mode", ["cow", "mor"])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=30),
    num_batches=st.integers(min_value=1, max_value=4),
    reverse=st.booleans(),
    duplicate=st.booleans(),
)
def test_any_log_converges(spark, tmp_path_factory, mode, events, num_batches, reverse, duplicate):
    schema = (
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp"
    )
    df = spark.createDataFrame(_rows(events), schema)
    wh = str(tmp_path_factory.mktemp("prop"))
    eng = CdcEngine(spark, wh, mode=mode, n_buckets=4)

    hi = len(events) - 1
    step = (hi + num_batches) // num_batches
    chunks = [
        df.where((F.col("seq") >= i * step) & (F.col("seq") < (i + 1) * step))
        for i in range(num_batches)
    ]
    if duplicate:
        chunks = [c.unionAll(c) for c in chunks]
    order = reversed(list(enumerate(chunks))) if reverse else enumerate(chunks)
    for i, chunk in order:
        eng.apply_batch(chunk, f"p-{i}")

    got = {
        (r["repo"], r["path"]): (r["commit"], r["content"])
        for r in eng.current_state().collect()
    }
    assert got == _oracle(events)
