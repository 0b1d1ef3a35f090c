"""Typed extraction from semi-structured JSON columns.

Telemetry events carry a free-form JSON ``props`` payload next to the
typed columns; every log pipeline grows a "pull these N fields out,
typed, quarantine the garbage" step (the reference parses its payloads
with a fixed wire schema — functions/parse.py; this is the
schema-on-read twin for the JSON side). ``from_json`` with an explicit
schema keeps the parse JVM-side and vectorized — one parse per row, no
Python, and malformed payloads become NULL structs instead of task
failures (the same never-throw posture as the binlog parse's quarantine
lane, parse.py P6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_props(
    events: DataFrame,
    fields: dict[str, str],
    props_col: str = "props",
) -> DataFrame:
    """Project ``fields`` (name → Spark SQL type) out of a JSON string
    column, typed, plus ``props_ok`` (did the payload parse at all).

    One ``from_json`` per row against the explicit schema — never
    schema inference (a driver-side corpus scan at 10^12 rows) and never
    per-field ``get_json_object`` (k parses per row).
    """
    if not fields:
        raise ValueError("fields must name at least one JSON field")
    clash = (set(fields) | {"__corrupt", "__p", "props_ok"}) & set(
        events.columns
    )
    clash |= set(fields) & {"__corrupt", "__p", "props_ok"}
    if clash:
        # a colliding alias would yield duplicate output columns and an
        # AMBIGUOUS_REFERENCE at first use — fail loudly instead
        raise ValueError(
            f"extracted field names collide with input columns: {sorted(clash)}"
        )
    # PERMISSIVE from_json yields an all-null struct (not a NULL struct)
    # for malformed payloads, so "did it parse" needs the corrupt-record
    # lane: the raw string lands in __corrupt iff the parse failed
    schema = ", ".join(f"{k} {v}" for k, v in fields.items())
    parsed = F.from_json(
        F.col(props_col),
        schema + ", __corrupt string",
        {"columnNameOfCorruptRecord": "__corrupt"},
    )
    return events.withColumn("__p", parsed).select(
        *[c for c in events.columns],
        (
            F.col(props_col).isNotNull()
            & F.col("__p.__corrupt").isNull()
        ).alias("props_ok"),
        *[F.col(f"__p.{k}").alias(k) for k in fields],
    )


def props_stats(
    events: DataFrame,
    field: str = "k",
    field_type: str = "int",
    type_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """Per-event-type rollup of one extracted JSON field: row count,
    parse failures, null-field count, and sum/min/max of the value —
    the smoke report that tells you whether a producer changed its
    payload shape. One extraction pass + one bounded hash aggregate.
    """
    e = extract_props(events, {field: field_type}, props_col=props_col)
    v = F.col(field)
    return e.groupBy(type_col).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((~F.col("props_ok")).cast("int")).cast("bigint").alias("n_bad"),
        F.sum(
            (F.col("props_ok") & v.isNull()).cast("int")
        ).cast("bigint").alias("n_null"),
        F.sum(v).cast("bigint").alias(f"{field}_sum"),
        F.min(v).cast("bigint").alias(f"{field}_min"),
        F.max(v).cast("bigint").alias(f"{field}_max"),
    )
