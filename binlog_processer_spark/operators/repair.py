"""Repair — apply reconciliation findings back to the replica.

Reference parity (SURVEY.md §3.3): HiveDataRepair.java:105-171 /
TiDBDataRepair.java:57-146 replay routed rows for the flagged ids and apply
them Create→Update→Delete (HiveRepairByDataBase.java:28-35 op ordering) with a
last-writer-wins guard (`IF(last_update < VALUES(last_update), …)`,
DataBaseHandler.java:79-151).

Spark-first restatement: the op ordering + LWW guard collapse into one
MERGE-shaped dataflow — semi-join the routed final state to the finding ids,
then (a) delete replica rows whose final op is Delete, (b) upsert rows whose
final op is Create/Update and which are newer than the replica row. With
Iceberg this is literally `MERGE INTO`; on the parquet storage layer it is the
equivalent join expression producing the repaired replica snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import final_state

KEYS = ["database_name", "table_name", "doc_id"]


def repair(
    events: DataFrame | None,
    replica: DataFrame,
    findings: DataFrame,
    fs: DataFrame | None = None,
) -> DataFrame:
    """Return the repaired replica (new snapshot).

    events: enriched change records (the routed data to replay);
    replica: (…KEYS, replica_ts, replica_tokens);
    findings: reconcile() output — only flagged ids are touched
    (BinlogDBHandler.java:15-48 id-list scoping).
    Output shape is exactly (…KEYS, replica_ts, replica_tokens) — the
    replica table's canonical schema; extra replica columns do not survive.
    ``fs``: optionally pass the same precomputed ``final_state`` used by
    ``reconcile`` so verify→repair replays the event log once, not thrice
    (the reference keeps one in-memory replay, AvroDataReader.java:95-135).
    """
    if fs is None:
        fs = final_state(events)
    flagged = findings.select(*KEYS).distinct()
    src = fs.join(flagged, KEYS, "left_semi").select(
        *KEYS,
        "final_op",
        F.col("final_ts").alias("src_ts"),
        F.col("final_tokens").alias("src_tokens"),
    )

    # ONE full-outer join is the whole MERGE: WHEN MATCHED (delete) THEN
    # DELETE / WHEN MATCHED AND src newer THEN UPDATE / WHEN NOT MATCHED
    # THEN INSERT / unflagged replica rows pass through. Replaces the
    # anti+left+anti join cascade (3 shuffles + union) with 1 join.
    j = replica.join(src, KEYS, "full")
    keep = (
        # no repair source for this key → replica row passes through;
        # LWW guard: an equal-or-newer replica row wins over the upsert
        F.col("final_op").isNull()
        | (
            (F.col("final_op") != "Delete")
            & F.col("replica_ts").isNotNull()
            & (F.col("replica_ts") >= F.col("src_ts"))
        )
    )
    insert_or_update = (
        (F.col("final_op").isNotNull()) & (F.col("final_op") != "Delete")
    )
    return (
        j.filter(keep | insert_or_update)
        .select(
            *KEYS,
            F.when(keep, F.col("replica_ts"))
            .otherwise(F.col("src_ts"))
            .alias("replica_ts"),
            F.when(keep, F.col("replica_tokens"))
            .otherwise(F.col("src_tokens"))
            .alias("replica_tokens"),
        )
    )
