"""Custom stateful streaming operators via ``applyInPandasWithState``.

The engine's exactly-once path needs no custom state (idempotent MERGE +
checkpoint), but the reference keeps in-engine counters across a run
(``stats`` dict, rdf_star_etl_yarrrml.py:142-147,427-432) and the serving
layer wants per-key running aggregates that survive micro-batches without
re-scanning the table. This is the Structured-Streaming-native analogue:
Arrow-batched per-key state, update-mode emission, checkpoint-recoverable.

Kernel contract (Spark docs): ``fn(key, iterator[pd.DataFrame], GroupState)``
— state is an engine-managed tuple, NOT driver memory; it scales per-key
across executors and restores from the checkpoint on resume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_OUT_SCHEMA = (
    "repo string, n_events long, n_deletes long, max_seq long"
)
RUNNING_STATE_SCHEMA = "n long, d long, mx long"


def running_repo_stats(events: DataFrame) -> DataFrame:
    """Per-repo running totals over the CDC event stream: cumulative event
    count, delete count, and high-water seq — emitted once per repo per
    micro-batch (update mode). The per-repo state is 3 longs: bounded,
    skew-safe (state size independent of the hot repo's row count)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, d, mx = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            n += len(pdf)
            d += int((pdf["op"] == "D").sum())
            mx = max(mx, int(pdf["seq"].max()))
        state.update((n, d, mx))
        yield pd.DataFrame(
            {
                "repo": [key[0]],
                "n_events": [n],
                "n_deletes": [d],
                "max_seq": [mx],
            }
        )

    return events.groupBy("repo").applyInPandasWithState(
        fn,
        RUNNING_OUT_SCHEMA,
        RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
