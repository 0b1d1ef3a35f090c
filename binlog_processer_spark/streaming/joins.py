"""Stream-stream interval join: change events vs replica apply-acks.

The reference verifies the downstream replica AFTER the fact with batch
compare jobs (TiDBCompareByFile.java's existence/staleness probes); the
streaming-native form of the same question is ATTRIBUTION — pair each
routed change event with the replica's apply acknowledgment as both
streams arrive, and surface the apply lag. This is Spark's canonical
stream-stream join (the ad-impression/click shape from the Structured
Streaming guide): equality on the event identity plus an EVENT-TIME
RANGE predicate bounding how late an ack may trail its event.

Scale posture: both sides carry a watermark, and the range predicate
(``ack_ts BETWEEN commit_ts AND commit_ts + max_lag``) lets Spark
evict join state as the watermark passes ``commit_ts + max_lag +
delay`` — state is bounded by the lag window × arrival rate, not by
stream length. The join keys are the event identity, so the state
store partitions by the same hash as every other keyed stage. Inner
join emits pairs eagerly (no watermark wait on the result); events
whose ack never arrives inside the window simply never emit — the
batch reconcile (operators/verify.py) remains the completeness check,
exactly the reference's division of labor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ["database_name", "table_name", "doc_id", "event_seq"]


def ack_lag_join_stream(
    events: DataFrame,
    acks: DataFrame,
    max_lag_min: int = 5,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join the change-event stream with the ack stream on event
    identity, keeping only acks within ``[commit_ts, commit_ts +
    max_lag_min]`` — the time-range arm is what turns the equi-join
    into an interval join and what bounds the join state. Returns one
    row per attributed pair with the apply lag in whole seconds.

    ``how='left_outer'`` additionally emits every UNACKED event (ack
    columns null) once the watermark closes its join window — the
    streaming form of the batch reconcile's missing-row probe. The
    range condition must be written with an INTERVAL literal: Spark
    derives the state-cleanup bound for the outer side from it, and a
    ``make_interval`` call defeats that analysis. Outer emission at
    end-of-stream happens when a LATER batch runs under the advanced
    watermark — drive the stream with trailing watermark-heartbeat
    batches (see the contract query) to flush deterministically."""
    e = events.select(*KEYS, "commit_ts").withWatermark(
        "commit_ts", watermark
    )
    a = acks.select(
        *[F.col(k).alias(f"ack_{k}") for k in KEYS], "ack_ts"
    ).withWatermark("ack_ts", watermark)
    cond = (
        (e["database_name"] == a["ack_database_name"])
        & (e["table_name"] == a["ack_table_name"])
        & (e["doc_id"] == a["ack_doc_id"])
        & (e["event_seq"] == a["ack_event_seq"])
        & (a["ack_ts"] >= e["commit_ts"])
        & (
            a["ack_ts"]
            <= e["commit_ts"] + F.expr(f"INTERVAL {int(max_lag_min)} MINUTES")
        )
    )
    return (
        e.join(a, cond, how)
        .select(
            *KEYS,
            "commit_ts",
            "ack_ts",
            (F.unix_timestamp("ack_ts") - F.unix_timestamp("commit_ts"))
            .cast("bigint")
            .alias("lag_s"),
        )
    )
