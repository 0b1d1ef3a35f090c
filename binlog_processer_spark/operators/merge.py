"""Generic MERGE INTO over a SnapshotTable — the lakehouse DML verb.

The reference's repair CLIs are fixed-shape merges (HiveRepairByDataBase /
TiDBRepairByID: upsert the true row, delete the ghost); jobs/run_repair.py
and the streaming upsert implement those shapes directly. This operator is
the general form users of an Iceberg/Delta warehouse reach for:

    MERGE INTO target t USING source s ON <keys>
    WHEN MATCHED [AND <cond>] THEN DELETE
    WHEN MATCHED THEN UPDATE SET <col = expr | everything>
    WHEN NOT MATCHED THEN INSERT *

Physical shape — copy-on-write at FILE granularity, exactly the pattern
jobs/run_repair.py and streaming/upsert.py use: plan the target files that
may contain a source key (bloom-index probes when available, an
input_file_name() semi-join scan as fallback), full-outer join ONLY those
files' rows against the source, and commit the transformed scope with
``rewrite_files`` — untouched files are carried by manifest reference, so
merge cost scales with the touched keys, not the table. A key's rows live
in whole files, and hit planning returns a superset, so merging the hit
scope alone is exact (the run_repair argument).

Cardinality: like Iceberg/Delta, a source key matching more than one
target row is ambiguous for UPDATE/DELETE and raises (``validate=False``
skips the check and applies the action to every matched row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage.table import SnapshotTable


class MergeCardinalityError(RuntimeError):
    """A source key matched multiple target rows (ambiguous MERGE)."""


def merge_into(
    spark: SparkSession,
    target: SnapshotTable,
    source: DataFrame,
    on: list[str],
    matched_update: dict[str, str] | str | None = "all",
    matched_delete: str | None = None,
    not_matched_insert: bool = True,
    validate: bool = True,
) -> int:
    """Execute the MERGE and return the committed snapshot.

    - ``matched_update``: ``"all"`` replaces the matched target row with
      the source row; a dict maps column → SQL expression over aliases
      ``t`` (target) and ``s`` (source), unlisted columns keep the target
      value; ``None`` leaves matched rows unchanged.
    - ``matched_delete``: SQL condition over ``t``/``s``; matched rows
      satisfying it are deleted (checked BEFORE update, like the SQL
      WHEN-clause order here).
    - ``not_matched_insert``: source rows matching no target key are
      inserted (source must be target-shaped).

    Source keys must be unique (enforced); with ``validate``, a source
    key matching several target rows raises MergeCardinalityError.
    """
    tcols = (
        target.read(spark).columns
        if target.current_snapshot() is not None
        else source.columns
    )
    if sorted(source.columns) != sorted(tcols):
        raise ValueError(
            f"merge source columns {sorted(source.columns)} != target "
            f"columns {sorted(tcols)}"
        )
    dup_src = (
        source.groupBy(*on).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup_src:
        raise MergeCardinalityError(
            "source has duplicate keys on " + ",".join(on)
        )
    if target.current_snapshot() is None:
        if not not_matched_insert:
            raise FileNotFoundError(f"no committed snapshot in {target.root}")
        return target.write(source)

    # -- plan the hit scope (metadata first, null-safe scan fallback) -----
    from ..storage.table import plan_hit_files

    touched = source.select(*on).distinct()
    hit_files = plan_hit_files(spark, target, touched, on)
    t = target.read_files(spark, hit_files).alias("t")
    s = source.alias("s")

    if validate and (matched_update is not None or matched_delete):
        # null-safe, matching the merge join itself: a NULL-keyed source
        # row matching several NULL-keyed target rows must trip the check
        # too, or the action silently applies to every match
        multi = (
            t.join(
                s,
                F.expr(" AND ".join(f"t.{k} <=> s.{k}" for k in on)),
                "left_semi",
            )
            .groupBy(*on)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if multi:
            raise MergeCardinalityError(
                "a source key matches multiple target rows; resolve or "
                "pass validate=False to apply the action to every match"
            )

    j = t.join(
        s,
        F.expr(" AND ".join(f"t.{k} <=> s.{k}" for k in on)),
        "full_outer",
    )
    # null-safe presence flags: an all-NULL row is impossible for a keyed
    # table, so a column-level OR identifies each side's presence even
    # when individual key columns are NULL (the <=> join admits them)
    t_here = F.expr(" OR ".join(f"t.{c} IS NOT NULL" for c in tcols))
    s_here = F.expr(" OR ".join(f"s.{c} IS NOT NULL" for c in tcols))
    matched = t_here & s_here

    # SQL MERGE deletes only on cond = TRUE; a NULL condition (e.g. the
    # predicate references a NULL column) must KEEP the row, so coalesce
    # the three-valued result to false before it reaches filter()
    delete_cond = (
        matched & F.coalesce(F.expr(matched_delete), F.lit(False))
        if matched_delete
        else F.lit(False)
    )

    def _out(col: str) -> F.Column:
        keep_t = F.col(f"t.{col}")
        take_s = F.col(f"s.{col}")
        if matched_update == "all":
            upd = take_s
        elif isinstance(matched_update, dict):
            upd = (
                F.expr(matched_update[col])
                if col in matched_update
                else keep_t
            )
        else:  # None: matched rows keep target values
            upd = keep_t
        return (
            F.when(matched, upd)
            .when(t_here, keep_t)  # target-only: keep
            .otherwise(take_s)  # source-only: insert candidate
            .alias(col)
        )

    keep = ~delete_cond & (matched | t_here | F.lit(not_matched_insert))
    merged = j.filter(keep).select(*[_out(c) for c in tcols])
    return target.rewrite_files(hit_files, merged)
