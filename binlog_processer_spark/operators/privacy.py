"""Privacy risk reporting: k-anonymity over quasi-identifier columns.

Completes the privacy family (PII scrub functions/text.py:241-326, GDPR
erase jobs/run_erase.py + merge-on-read deletes): scrubbing removes
direct identifiers, erasure removes named subjects, but a release is
still re-identifiable when a COMBINATION of innocuous columns (the
quasi-identifiers, Sweeney 2002) isolates small groups. A release is
k-anonymous when every quasi-identifier equivalence class holds >= k
rows; the report quantifies how far a corpus is from that bar before
anyone ships it.

Reference parity: none — the reference has no privacy surface; this is
part of the training-pipeline family the build brief mandates beyond
SURVEY §2.

Scale posture: two hash aggregates (rows → equivalence classes →
per-database report), both map-side combined; nothing is proportional
to the row count on the wire past the first partial aggregate. No
windows, no joins, no driver collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default quasi-identifier set for the CDC corpus: the columns a
# "harmless" analytics release would plausibly keep after scrubbing
DEFAULT_QIDS = ("database_name", "table_name", "op", "commit_day")


def k_anonymity_report(
    kept: DataFrame,
    k: int = 5,
    qids: Sequence[str] = DEFAULT_QIDS,
    group_col: str = "database_name",
) -> DataFrame:
    """Per-database k-anonymity audit of the quasi-identifier grouping.

    For each database: total rows, number of equivalence classes (rows
    agreeing on every quasi-identifier), the classes/rows falling below
    the ``k`` bar, the smallest class size, and ``risk_ppm`` — the
    fraction (in ppm) of rows living in a below-k class, i.e. the share
    of the release an adversary with quasi-identifier knowledge can
    narrow to fewer than k candidates. ``commit_day`` (the date of
    ``commit_ts``) stands in for the classic coarse-date quasi-identifier.

    All arithmetic is integer until the final published integers, so the
    DuckDB oracle matches bit-for-bit.

    Generic over any table: pass ``qids`` naming existing columns and a
    ``group_col`` (must be one of the qids, so every equivalence class
    belongs to exactly one report row); ``commit_day`` is derived from
    ``commit_ts`` when requested and absent — the CDC default. The QA
    CLI reuses this over the documents drop with (source, lang,
    length-bucket) quasi-identifiers.
    """
    if k < 2:
        raise ValueError(f"k_anonymity_report: k must be >= 2, got {k}")
    if group_col not in qids:
        raise ValueError(
            f"k_anonymity_report: group_col {group_col!r} must be a "
            f"quasi-identifier (got qids={list(qids)})"
        )
    rows = kept
    if "commit_day" in qids and "commit_day" not in rows.columns:
        rows = rows.withColumn("commit_day", F.to_date("commit_ts"))
    missing = [c for c in qids if c not in rows.columns]
    if missing:
        raise ValueError(f"k_anonymity_report: missing quasi-identifiers {missing}")
    classes = rows.groupBy(*qids).agg(
        F.count("*").cast("bigint").alias("class_size")
    )
    below = F.col("class_size") < k
    return (
        classes.groupBy(group_col)
        .agg(
            F.sum("class_size").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum(below.cast("bigint")).cast("bigint").alias("classes_below_k"),
            F.sum(F.when(below, F.col("class_size")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("rows_below_k"),
            F.min("class_size").cast("bigint").alias("min_class_size"),
        )
        .select(
            group_col,
            "n_rows",
            "n_classes",
            "classes_below_k",
            "rows_below_k",
            "min_class_size",
            F.floor(F.col("rows_below_k") * 1_000_000 / F.col("n_rows"))
            .cast("bigint")
            .alias("risk_ppm"),
        )
        .orderBy(group_col)
    )
