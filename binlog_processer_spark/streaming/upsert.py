"""Streaming CDC apply: foreachBatch MERGE into a keyed current-state
table — the canonical streaming sink for a change stream (the
reference's end state lives in TiDB/MySQL via per-record upserts,
TransferProcess/DBbiz analogues; Spark-native, the state is a snapshot
table the stream merges into per micro-batch).

Semantics: the committed table always equals ``aggregate.final_state``
over every event drained so far, REGARDLESS of how events are split
into micro-batches or in what order files arrive:

- per batch, intra-batch churn collapses first with the same single-pass
  ``max_by`` last-wins as the batch operator (no per-op maps);
- the merge keeps whichever side carries the higher ``event_seq`` (a
  monotone guard — a late-replayed file with older events can never
  regress a key);
- deletes are kept as TOMBSTONES (``final_op = 'Delete'``), not removed:
  dropping the row would let an older Create re-insert it in a later
  batch. Filter ``final_op <> 'Delete'`` at read time for the live view.

Scale posture: the batch side is collapsed to one row per touched key
before the merge, so the join is |table| × |batch keys| — with AQE the
batch side broadcasts when small. The merge itself is ONE full-outer
join (the repair/MERGE shape, operators/repair.py), committed as a
snapshot overwrite: at 10^12 rows the rewrite is the cost, and the
honest fix is the same partition-scoped overwrite documented for
repair — unchanged partitions (no touched keys) can be carried by
reference through the manifest. Checkpointing makes the drain
resumable; a replayed batch is idempotent under the monotone guard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse import parse_raw, split_quarantine
from ..operators import aggregate as agg
from ..operators.enrich import enrich_routing
from ..operators.route import filter_system_schemas, split_ignored
from ..storage.table import SnapshotTable

KEYS = ["database_name", "table_name", "doc_id"]
_STATE = ["final_op", "final_ts", "final_tokens", "final_seq"]


def merge_final_state(cur: DataFrame, batch_state: DataFrame) -> DataFrame:
    """One full-outer join; per key the side with the higher final_seq
    wins (ties go to the batch — replays are idempotent)."""
    b = batch_state.select(
        *[F.col(k).alias(f"__bk_{k}") for k in KEYS],
        *[F.col(c).alias(f"__b_{c}") for c in _STATE],
    )
    cond = None
    for k in KEYS:
        eq = cur[k] == b[f"__bk_{k}"]
        cond = eq if cond is None else (cond & eq)
    take_b = F.col("__b_final_seq").isNotNull() & (
        F.col("final_seq").isNull()
        | (F.col("__b_final_seq") >= F.col("final_seq"))
    )
    return cur.join(b, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__bk_{k}"), cur[k]).alias(k)
            for k in KEYS
        ],
        *[
            F.when(take_b, F.col(f"__b_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in _STATE
        ],
    )


def run_streaming_upsert(
    spark: SparkSession,
    raw_dir: str,
    routing_df: DataFrame,
    out_dir: str,
    max_files_per_trigger: int | None = 1,
) -> SnapshotTable:
    """Drain ``raw_dir`` with AvailableNow; per micro-batch: parse →
    enrich → kept filters → batch-local last-wins → monotone merge into
    the state table → snapshot overwrite commit. Returns the state
    table (tombstones included; filter Delete for the live view)."""
    state_table = SnapshotTable(os.path.join(out_dir, "final_state_stream"))

    reader = spark.readStream.schema("raw string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(raw_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        good, _bad = split_quarantine(parse_raw(batch_df))
        good = good.withColumn(
            "table_key",
            F.concat_ws("#", F.col("source"), F.col("bucket").cast("string")),
        )
        kept, _ign = split_ignored(
            filter_system_schemas(enrich_routing(good, routing_df))
        )
        batch_state = agg.final_state(kept)
        if state_table.current_snapshot() is not None:
            # reading snap-N while writing snap-N+1 is safe: the commit
            # writes a NEW snapshot dir and flips _current atomically;
            # snap-N's data files are untouched until vacuum
            merged = merge_final_state(
                state_table.read(spark), batch_state
            )
        else:
            merged = batch_state
        state_table.write(merged, mode="overwrite")

    q = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state_table
