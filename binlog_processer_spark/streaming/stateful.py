"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-sink watermark + op totals that survive across micro-batches —
the Spark-managed-state replacement for the reference's externalized MySQL
status/counter state (t_binlog_process, DBbiz.java:43-112). Each group's
state is a (insert, update, delete, max_commit_ts) tuple updated per batch;
timeouts are not used (the reference's 30-min semaphore timeout is a
liveness concern Spark handles via task retries).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = StructType(
    [
        StructField("insert_cnt", LongType()),
        StructField("update_cnt", LongType()),
        StructField("delete_cnt", LongType()),
        StructField("max_commit_s", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("insert_cnt", LongType()),
        StructField("update_cnt", LongType()),
        StructField("delete_cnt", LongType()),
        StructField("max_commit_ts", TimestampType()),
    ]
)


def _update_counts(
    key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    ins = upd = dele = 0
    max_s = 0
    for pdf in pdfs:
        ins += int((pdf["op"] == "Create").sum())
        upd += int((pdf["op"] == "Update").sum())
        dele += int((pdf["op"] == "Delete").sum())
        if len(pdf):
            max_s = max(max_s, int(pdf["commit_ts"].max().timestamp()))

    if state.exists:
        p_ins, p_upd, p_del, p_max = state.get
        ins, upd, dele = ins + p_ins, upd + p_upd, dele + p_del
        max_s = max(max_s, p_max)
    state.update((ins, upd, dele, max_s))

    yield pd.DataFrame(
        {
            "source": [key[0]],
            "insert_cnt": [ins],
            "update_cnt": [upd],
            "delete_cnt": [dele],
            "max_commit_ts": [pd.to_datetime(max_s, unit="s")],
        }
    )


def stateful_running_counts(parsed_stream: DataFrame) -> DataFrame:
    """parsed_stream: streaming DF with (source, op, commit_ts). Emits the
    updated running totals per source on every batch."""
    return (
        parsed_stream.select("source", "op", "commit_ts")
        .groupBy("source")
        .applyInPandasWithState(
            _update_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
