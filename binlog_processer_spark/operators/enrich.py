"""Enrichment joins — the reference's TABLE_MAP cache and schema-provider
lookups re-expressed as Spark broadcast joins.

Reference parity:
- J1 table-map lookup (BinlogFileReader.java:183-212): numeric table id →
  (database, table); a miss drops the row → broadcast **inner** join.
- J2 schema lookup, equi (SchemaData.java:192-233, SchemaProviders.java:75-131)
  and as-of-by-time (SchemaRepository.java:52-77 TreeMap floor): latest schema
  version with valid_from_ts <= event commit_ts.
- shard-merge name mapper (SchemaProviders.java:42-47): strip trailing digits.

Scale posture: the routing/schema dimensions are small by construction
(#sources × #buckets × #versions), so both joins are `broadcast()` hints —
zero shuffle on the 10^12-row fact side. The shard merge is a column
expression, not a UDF, so it stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_merge_expr(db_col: str = "database_sharded") -> F.Column:
    """`ecommerce12` → `ecommerce` (SchemaProviders.java:42-47 analogue)."""
    return F.regexp_replace(F.col(db_col), r"\d+$", "")


def enrich_routing(events: DataFrame, routing: DataFrame) -> DataFrame:
    """J1: broadcast inner join on table_key; unmatched rows drop (reference
    semantics: row events with no TABLE_MAP entry are skipped)."""
    return events.join(F.broadcast(routing), "table_key", "inner")


def enrich_schema_asof(
    events: DataFrame, schema_dim: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """J2 as-of: pick the latest schema version with valid_from_ts <= commit_ts.

    Implemented as broadcast range-join + per-event argmax window. The window
    partitions by event identity (event_seq is unique per key), so with the
    dimension broadcast this costs one shuffle on the fact's event key only;
    for the usual tiny dimension (<=versions per table) the multiplied
    intermediate is #events × #matching_versions, bounded and skew-free.
    """
    keys = keys or ["table_key"]
    joined = events.join(F.broadcast(schema_dim), keys, "inner").filter(
        F.col("valid_from_ts") <= F.col("commit_ts")
    )
    w = Window.partitionBy(*keys, "event_seq").orderBy(
        F.col("valid_from_ts").desc()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
