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

from pyspark.sql import DataFrame
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
    """J2 as-of: pick the latest schema version with valid_from_ts <= commit_ts
    (the TreeMap floor-lookup, SchemaRepository.java:52-77).

    Zero-shuffle on the fact side: the dimension's versions are packed into
    one descending-sorted array per key (a tiny pre-aggregate on the
    dimension only), broadcast, and the floor pick is a pure `filter(...)[0]`
    array expression inside whole-stage codegen. The alternative — multiply
    the fact by matching versions and window-argmax per event — would shuffle
    the whole 10^12-row fact on event identity.
    """
    keys = keys or ["table_key"]
    # valid_from_ts first so the struct sort orders by version time
    val_cols = ["valid_from_ts"] + [
        c for c in schema_dim.columns if c not in keys and c != "valid_from_ts"
    ]
    packed = schema_dim.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(*val_cols)), asc=False
        ).alias("__versions")
    )
    joined = events.join(F.broadcast(packed), keys, "inner")
    picked = (
        joined.withColumn(
            "__v",
            # get() (not [0]): ANSI mode throws on empty-array index when no
            # version is valid at event time
            F.expr("get(filter(__versions, v -> v.valid_from_ts <= commit_ts), 0)"),
        )
        # no version valid at event time ⇒ floor lookup misses ⇒ row drops
        .filter(F.col("__v").isNotNull())
        .drop("__versions")
    )
    for c in val_cols:
        picked = picked.withColumn(c, F.col("__v")[c])
    return picked.drop("__v")
