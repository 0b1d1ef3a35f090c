"""Verification (reconciliation) — the reference's comparer module as joins.

Reference parity (SURVEY.md §3.2): TiDBCompareByFile.java:52-265 /
HiveCompareByFile.java:63-169 replay routed Avro into per-op last-wins id→ts
maps, cancel across ops (AvroDataReader.java:128-135), then probe the replica:

- missing Create: id routed as final Create but absent from replica
  → **left-anti join** (BaseDataCompare.java:105-123 Maps.difference).
- stale Update: id routed as final Update whose replica row is older
  → **equi-join + theta residual** src.ts > dst.ts
  (MapCompareUtil.java:15-30; UNIX_TIMESTAMP staleness predicate
  TiDBCompareByFile.java:303-307).
- ghost Delete: id routed as final Delete still present in replica
  → **left-semi join** (MapCompareUtil.java:35-47 retainAll).

The reference batches 5000-id UNION SELECT probes against TiDB; in Spark the
replica is just a DataFrame and the probe is one shuffled (or broadcast, if
the finding set is small — AQE decides) join per finding class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import final_state

FINDING_COLS = ["database_name", "table_name", "doc_id", "finding", "src_ts"]


def reconcile(
    events: DataFrame | None,
    replica: DataFrame,
    fs: DataFrame | None = None,
) -> DataFrame:
    """events: enriched change records; replica: (database_name, table_name,
    doc_id, replica_ts). Returns the findings DataFrame (empty ⇔ consistent).

    ``fs``: optionally pass a precomputed (ideally persisted)
    ``final_state(events)`` — the reference replays the routed data ONCE and
    probes the replica from the in-memory maps (AvroDataReader.java:95-135);
    recomputing the replay per probe class would be a 3x scan at 100 TB.
    """
    if fs is None:
        fs = final_state(events)
    keys = ["database_name", "table_name", "doc_id"]

    # ONE left join carries all four probe classes (the reference's four
    # Maps.difference/retainAll passes collapse into CASE logic over
    # presence + staleness): anti ≡ left+null, semi ≡ left+not-null,
    # theta ≡ left+predicate. Replica keys are unique (it models a keyed
    # store), so the join fans out nothing. 1 shuffle instead of 4.
    r = replica.select(
        *keys, "replica_ts", F.lit(True).alias("__present")
    )
    joined = fs.join(r, keys, "left")
    finding = (
        F.when(
            (F.col("final_op") == "Create") & F.col("__present").isNull(),
            "missing_create",
        )
        # Updates may land on ids the replica never saw (reference counts
        # those as missing too: compareResult diff)
        .when(
            (F.col("final_op") == "Update") & F.col("__present").isNull(),
            "missing_update",
        )
        .when(
            (F.col("final_op") == "Update")
            & (F.col("final_ts") > F.col("replica_ts")),
            "stale_update",
        )
        .when(
            (F.col("final_op") == "Delete") & F.col("__present").isNotNull(),
            "ghost_delete",
        )
    )
    return (
        joined.withColumn("finding", finding)
        .filter(F.col("finding").isNotNull())
        .select(*keys, "finding", F.col("final_ts").alias("src_ts"))
    )
