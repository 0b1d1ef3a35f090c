"""Salted-key skew mitigation for hot sinks (north-rule requirement).

The reference has no skew handling — a hot (database, table) simply produces
one big Avro file on one thread (SURVEY.md §4). At 10^12 rows a groupBy on the
sink key puts ~46% of rows (the corpus's hot bucket 0) on one reducer. Fix:
two-phase aggregation — partial-aggregate by (key, salt), then final-aggregate
by key. Results are identical to the plain groupBy (proven by the shared
oracle); only the shuffle distribution changes.

AQE skew-join splitting (spark.sql.adaptive.skewJoin, on in session.py) covers
the join side; this helper covers aggregations, which AQE does not re-salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    salt_col: str = "doc_id",
) -> DataFrame:
    """Two-phase sum-decomposable aggregation.

    ``aggs`` maps output name → SUM-combinable partial expression evaluated in
    phase 1 (e.g. ``F.sum(F.when(...))``, ``F.count(...)``). Phase 2 sums the
    partials. Max/min are also re-applied correctly because max-of-max =
    max; pass ``combine="max"`` semantics by wrapping upstream if needed.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def salted_sink_counts(routed: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """A1 sink counts with salting — byte-identical output to
    aggregate.sink_counts, skew-resistant shuffle."""
    aggs = {
        "insert_cnt": F.sum(F.when(F.col("op") == "Create", 1).otherwise(0)),
        "update_cnt": F.sum(F.when(F.col("op") == "Update", 1).otherwise(0)),
        "delete_cnt": F.sum(F.when(F.col("op") == "Delete", 1).otherwise(0)),
    }
    return salted_agg(routed, keys, aggs, n_salts=n_salts)


def key_skew_report(
    df: DataFrame, keys: list[str], top: int = 10
) -> DataFrame:
    """Hot-key diagnostic: the top-N heaviest key groups with their row
    share — the measurement that decides WHEN the salted paths above (or
    a bigger n_salts) are worth their second aggregation phase, and the
    alert a routing pipeline fires when one table starts swallowing the
    corpus.

    Output: key columns + (cnt, share_ppm, rank), rank 1 = heaviest,
    deterministic tiebreak on the key columns. share_ppm is integer
    arithmetic (cnt * 10^6 / total, floored) so engines agree exactly.

    Scale plan: one map-side-combinable groupBy on the key (the same
    shuffle any per-key count pays — cardinality-bounded, not
    row-bounded), a broadcast 1-row total, and the global cut via
    orderBy + limit (TakeOrderedAndProject: per-partition heaps of N,
    never a full sort). Nothing is proportional to the row count after
    the first aggregate.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if top < 1:
        raise ValueError(f"top {top} must be >= 1")
    per_key = df.groupBy(*keys).agg(F.count("*").cast("bigint").alias("cnt"))
    total = df.agg(F.count("*").cast("bigint").alias("__total"))
    w = Window.orderBy(
        F.col("cnt").desc(), *[F.col(k).asc() for k in keys]
    )
    return (
        per_key.crossJoin(F.broadcast(total))
        .orderBy(F.col("cnt").desc(), *[F.col(k).asc() for k in keys])
        .limit(int(top))
        .select(
            *keys,
            "cnt",
            F.floor(F.col("cnt") * 1_000_000 / F.col("__total"))
            .cast("bigint")
            .alias("share_ppm"),
            F.row_number().over(w).cast("int").alias("rank"),
        )
    )
