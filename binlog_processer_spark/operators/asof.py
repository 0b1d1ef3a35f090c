"""Fact-to-fact AS-OF join: each left row paired with the latest right
row at-or-before its timestamp.

The reference solves the small-dimension case of this problem with a
driver-held ``TreeMap.floorEntry`` per key (SchemaUtils.java's
version-as-of lookup, mirrored by operators/enrich.py's packed-array
broadcast). That trick dies when the RIGHT side is itself fact-sized —
a checkpoint/metric stream with millions of rows per key cannot ride a
broadcast. The classic distributed answer (and the one pandas
``merge_asof`` uses single-node) is sort-based: interleave both sides
on (key, ts) and carry the most recent right payload forward.

Scale posture: ONE hash exchange on the join keys plus one sort — the
same shuffle a sort-merge join would pay, but with no join explosion
and no build-side memory: state while scanning a partition is a single
struct (the last right payload seen). Contrast the naive formulations:
``left JOIN right ON key AND r_ts <= l_ts`` explodes every left row by
its full right history before a window trims it back, and a theta-only
join is a cartesian product per key. Skew follows the per-key timeline
length, the same envelope as every other keyed stage here, so AQE skew
splitting applies. At 100 TB both sides stream through a single
stage — nothing is collected or broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_R = "__asof_r"
_SIDE = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row with ``right_cols`` (default: every
    non-key, non-ts column of ``right``) taken from the LATEST right
    row of the same ``on`` key with ``right_ts <= left_ts`` — nulls
    when no such row exists, or (with ``tolerance_s``) when the match
    is older than ``left_ts - tolerance_s``. The matched ``right_ts``
    is exposed as ``asof_ts``.

    Ties: a right row AT ``left_ts`` matches (inclusive). Duplicate
    right rows on the same (key, ts) resolve deterministically to the
    greatest payload struct; pre-aggregate the right side if another
    tie-break is wanted.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (*on, right_ts)
        ]
    right_cols = list(right_cols)
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {overlap}")

    payload = F.struct(
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        payload.alias(_R),
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_R].dataType).alias(_R),
    )
    # right rows sort BEFORE left rows at the same ts (backward-
    # INCLUSIVE); among duplicate right (key, ts) the greatest payload
    # struct wins (structs compare field-by-field)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__asof_ts").asc(), F.col(_SIDE).asc(), F.col(_R).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r, allowMissingColumns=True).withColumn(
        _R, F.last(_R, ignorenulls=True).over(w)
    )
    matched = u.filter(F.col(_SIDE) == 1)
    if tolerance_s is not None:
        matched = matched.withColumn(
            _R,
            F.when(
                F.col(f"{_R}.asof_ts")
                >= F.col(left_ts) - F.expr(
                    f"INTERVAL {int(tolerance_s)} SECONDS"
                ),
                F.col(_R),
            ),
        )
    out_cols = [c for c in left.columns] + [
        F.col(f"{_R}.asof_ts").alias("asof_ts"),
        *[F.col(f"{_R}.{c}").alias(c) for c in right_cols],
    ]
    return matched.select(*out_cols)
