"""Streaming HyperLogLog: distinct-cardinality tracking over an
unbounded stream with constant state — the sketch family's streaming
face.

Why this exists. ``streaming/stateful.py`` keeps exact per-key counts;
exact DISTINCT over a stream would need per-key state proportional to
the key space. HLL registers are the standard fix: constant
(sources x m) state, merged per micro-batch by per-register max. And
because the merge is exactly associative+commutative+idempotent, the
accumulated registers — and therefore the published estimate — are
BIT-IDENTICAL to the one-shot batch sketch over the same rows, no
matter how the stream was batched. The contract query exploits that:
``streaming_hll_distinct`` shares ``sketch_distinct_hll``'s oracle
shape, a full hash gate on a streaming computation.

Shape. ``foreachBatch`` reuses the BATCH operators verbatim (the
foreachBatch body runs batch Spark): each micro-batch computes its own
``hll_registers`` (one vocabulary-bounded aggregate) and the driver
folds the ≤ sources x m register rows into an accumulator dict — the
same bounded-collect posture as the classifier's gradient and the BPE
word table. At 10^12 rows per batch nothing here grows: the collect is
register-count-bounded, never stream-bounded. (A snapshot-table-backed
accumulator — read, max-merge, rewrite — swaps the dict for durable
state with the same merge; the dict keeps the contract query
self-contained.)
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binlog_processer_spark.operators.sketch import (
    hll_estimate,
    hll_registers,
    kmv_row_sample,
    sample_quantile_report,
)


def streaming_hll_distinct(
    spark: SparkSession,
    raw_dir: str,
    to_kept: Callable[[DataFrame], DataFrame],
    b: int = 10,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain ``raw_dir`` as a rate-limited AvailableNow stream, fold
    each micro-batch's HLL registers into a driver accumulator, and
    return the estimate report over the merged registers.

    ``to_kept`` maps a raw micro-batch DataFrame to the kept-events
    relation (parse → enrich → filter), so the stream reuses the exact
    batch lineage. ``max_files_per_trigger=1`` forces one batch per
    input file — the multi-batch shape that actually exercises the
    merge (a single batch would be trivially equal to the batch
    sketch).
    """
    state: dict = {}  # (source, bucket) -> max rho; <= sources * 2^b keys

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(to_kept(batch_df), b).collect()
        for r in regs:
            key = (r["source"], r["bucket"])
            if r["rho"] > state.get(key, 0):
                state[key] = r["rho"]

    sq = (
        spark.readStream.schema("raw string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(raw_dir)
        .writeStream.foreachBatch(_fold)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()

    merged = spark.createDataFrame(
        [(s, bkt, rho) for (s, bkt), rho in sorted(state.items())],
        schema="source string, bucket int, rho int",
    )
    return hll_estimate(merged, b).orderBy("source")


def streaming_quantiles(
    spark: SparkSession,
    raw_dir: str,
    to_kept: Callable[[DataFrame], DataFrame],
    k: int = 128,
    qs: tuple[int, ...] = (50, 95),
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming sequence-length quantiles with constant state — the
    quantile sketch's streaming face, mirroring ``streaming_hll_distinct``.

    Each micro-batch computes its own bottom-k row sample
    (``kmv_row_sample`` — the zero-shuffle candidate pass runs inside
    the batch lineage) and the driver merges samples by the KMV law:
    union + re-sort by (h, seq) + truncate to k per source. The merge is
    associative/commutative/idempotent, so the accumulated sample — and
    therefore the published report — is BIT-IDENTICAL to the one-shot
    batch sketch over the same rows regardless of batching; the
    ``streaming_quantiles`` contract query shares the batch oracle's
    estimate arithmetic, a full hash gate on a streaming computation.

    State bound: sources x k (h, seq, val) triples on the driver; each
    micro-batch contributes at most sources x k collected rows — the
    same bounded-collect posture as the HLL register fold.
    """
    state: dict[str, list[tuple[int, int, int]]] = {}

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        rows = kmv_row_sample(to_kept(batch_df), k).collect()
        bysrc: dict[str, list[tuple[int, int, int]]] = {}
        for r in rows:
            bysrc.setdefault(r["source"], []).append(
                (r["h"], r["seq"], r["val"])
            )
        for s, triples in bysrc.items():
            merged = sorted(set(state.get(s, [])) | set(triples))
            state[s] = merged[:k]

    sq = (
        spark.readStream.schema("raw string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(raw_dir)
        .writeStream.foreachBatch(_fold)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()

    merged = spark.createDataFrame(
        [
            (s, h, seq, val)
            for s, triples in sorted(state.items())
            for (h, seq, val) in triples
        ],
        schema="source string, h bigint, seq bigint, val bigint",
    )
    return sample_quantile_report(merged, qs).orderBy("source")


def streaming_cms_counters(
    spark: SparkSession,
    raw_dir: str,
    to_kept: Callable[[DataFrame], DataFrame],
    depth: int = 4,
    width: int = 1024,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming Count-Min counters — the third streaming face of the
    sketch family (distinct: ``streaming_hll_distinct``; quantiles:
    ``streaming_quantiles``; frequency: this).

    CMS state merges by plain ADDITION (each counter is a sum of
    occurrences hashing there), the simplest merge law of the three; the
    driver accumulator holds at most depth x width integers, and each
    micro-batch contributes its own ``cms_counters`` aggregate (map-side
    combined, bounded at depth x width rows). The drained counter table
    is bit-identical to the one-shot batch counters over the same rows —
    the contract query's oracle recomputes every counter in SQL.
    """
    from binlog_processer_spark.operators.sketch import cms_counters

    state: dict[tuple[int, int], int] = {}

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        for r in cms_counters(to_kept(batch_df), depth, width).collect():
            key = (r["row"], r["bucket"])
            state[key] = state.get(key, 0) + r["cnt"]

    sq = (
        spark.readStream.schema("raw string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(raw_dir)
        .writeStream.foreachBatch(_fold)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()

    return spark.createDataFrame(
        [(r, b, c) for (r, b), c in sorted(state.items())],
        schema="row int, bucket int, cnt bigint",
    ).orderBy("row", "bucket")
