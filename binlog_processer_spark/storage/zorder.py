"""Z-order (Morton-curve) clustering for multi-dimension file pruning.

Range-clustering on raw columns (``SnapshotTable.write(cluster_by=...)``)
is lexicographic: files get tight zone maps on the LEADING column and
domain-wide ranges on every other — a filter on the second column prunes
nothing. Interleaving the bits of all clustered columns into one Morton
key and range-distributing on THAT gives every file a tight range on
EVERY dimension (each file is a small hyper-rectangle of the value
space), so single-column predicates on any clustered dimension skip
files. This is Delta/Iceberg's ``ZORDER BY`` re-expressed over this
repo's manifest zone maps; the reference has no answer to this problem
(its sinks write in arrival order and its compare jobs always scan).

Scale posture: the Morton key is a pure-codegen bit-interleave (no UDF,
no shuffle of its own); clustering costs exactly the one range exchange
any clustered write already pays. Bounds for the fixed-point scaling
come from one tiny min/max aggregate (two scalars per column) or from
caller-known domains. Precision: ``bits`` per column, ``bits x n_cols
<= 63`` so the key stays a BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__z_order_key"


def zorder_key(bounds: dict[str, tuple], bits: int = 16) -> Column:
    """Morton key over the given columns, each fixed-point scaled from
    its ``(lo, hi)`` domain into ``bits`` bits. Out-of-domain values
    clamp to the edge; nulls and non-castable values cluster at 0 —
    clustering placement never affects correctness, only pruning."""
    n = len(bounds)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1 or bits * n > 63:
        raise ValueError(f"bits*n_cols must be in [1, 63], got {bits}*{n}")
    maxv = (1 << bits) - 1
    scaled: list[Column] = []
    for col, (lo, hi) in bounds.items():
        lo_f, hi_f = float(lo), float(hi)
        span = hi_f - lo_f
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
            continue
        c = (F.col(col).cast("double") - F.lit(lo_f)) / F.lit(span)
        s = F.floor(
            F.least(F.lit(1.0), F.greatest(F.lit(0.0), c)) * maxv
        ).cast("long")
        scaled.append(F.coalesce(s, F.lit(0)))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """One tiny aggregate for the fixed-point domains: ``{col: (min,
    max)}`` as doubles. Costs one column-pruned scan of ``df`` — pass
    known domains to ``zorder_cluster`` to skip it."""
    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [F.min(d).alias(f"__lo_{c}"), F.max(d).alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        out[c] = (0.0, 0.0) if lo is None else (float(lo), float(hi))
    return out


def zorder_cluster(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple] | None = None,
    num_files: int | None = None,
    prefix_cols: list[str] | None = None,
) -> DataFrame:
    """Range-distribute + sort ``df`` on its Morton key, then drop the
    key — the exchange keeps the clustering, the files never carry the
    helper column. ``num_files`` caps the output file count (default:
    spark.sql.shuffle.partitions).

    ``prefix_cols`` lead the range distribution and sort — REQUIRED for
    hive-partitioned sinks: without it every range task holds rows of
    every partition value, and the directory split fans each task into
    one file per value (more files than before, the opposite of
    clustering). With it each task holds a contiguous run of partition
    values and the Morton key refines WITHIN them."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    else:
        missing = set(cols) - set(bounds)
        if missing:
            raise ValueError(f"bounds missing for {sorted(missing)}")
    z = zorder_key({c: bounds[c] for c in cols}, bits=bits)
    out = df.withColumn(Z_COL, z)
    if num_files is None:
        # explicit partition count: an unsized range exchange is AQE-
        # coalescible, which would collapse the clustering into one file
        # on small inputs and defeat the whole point
        num_files = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    order = [*(prefix_cols or []), Z_COL]
    return (
        out.repartitionByRange(max(1, num_files), *order)
        .sortWithinPartitions(*order)
        .drop(Z_COL)
    )
