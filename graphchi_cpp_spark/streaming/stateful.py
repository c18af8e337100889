"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond-reference (SURVEY §2.7 X-surface): GraphChi has no streaming
state machine; Structured Streaming's arbitrary-stateful API is the
Spark-first tool for operators the built-in windowed aggregations can't
express (running totals that never age out, custom eviction policies,
per-key state machines). The engine checkpoints the state store and
replays exactly-once per micro-batch — the operator only declares the
per-key transition function.

Scale: state is partitioned by the group key across executors (RocksDB
or HDFS-backed state store at cluster scale); each micro-batch touches
only the keys present in that batch plus timed-out keys.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (n_events, sum_value) maintained in engine
    state across micro-batches — a running aggregate with no window, the
    canonical arbitrary-stateful example. Emits one updated row per user
    per micro-batch that touched that user (update output mode).

    ``events``: streaming DataFrame with (user_id, value, ...).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
