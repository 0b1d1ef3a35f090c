"""Single-pass table profiling: per-column completeness, cardinality,
and range, plus key-uniqueness — the Deequ-style data-quality summary a
100 TB ingest publishes next to every snapshot.

The reference validates per-sink row counts (BinlogCount.java analogue);
a training-data pipeline needs the column-level complement before any
downstream job trusts a new drop: which columns went null, whether an id
column silently lost uniqueness, whether a timestamp range ran ahead of
the wall clock. One operator, long-format output (a row per column), so
the report is schema-stable as profiled columns change.

Scale posture: ONE aggregate job. Multiple exact COUNT(DISTINCT) in a
single agg makes Catalyst plan an Expand (input × #distinct-aggs before
the partial aggregate) — deliberate and documented: the expansion is
map-side and the shuffle stays bounded by per-column cardinality, which
for profile-worthy columns (enums, ids, dates) is far below the row
count. For genuinely unbounded columns swap in approx_count_distinct —
documented rather than silently approximated so the DuckDB oracle can
gate the exact path bit-for-bit. min/max are cast to strings AFTER
aggregation (cheap, and makes the long format type-stable across
int/string/timestamp columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: one row per column with
    (col_name, n_rows, n_null, n_distinct, min_s, max_s).

    ``n_rows`` repeats the table count on every row so each line is
    self-contained (completeness = 1 - n_null/n_rows without a join).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    aggs = [F.count("*").cast("bigint").alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).cast("bigint").alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_s"),
                F.col(f"__mx_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def key_uniqueness(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Uniqueness check on a composite key: total rows, distinct key
    tuples, and the number of violating duplicate rows (0 = the key
    holds). The assertion every exactly-once sink publishes.

    Plan: one hash aggregate on the key (map-side combinable) reduced
    to a 1-row summary — never a window or a self-join.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    per_key = df.groupBy(*key_cols).agg(F.count("*").alias("__c"))
    return per_key.agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        (F.sum("__c") - F.count("*")).cast("bigint").alias("dup_rows"),
    )
