"""spark-submit entry point for generic table-to-table comparison.

Compares two SnapshotTables (or bare parquet paths) by key: Merkle-style
bucket digests first (operators/antientropy.py), row-level work only
inside buckets whose digests disagree. With ``--state-dir`` the per-table
digest state is maintained incrementally across invocations (fold in/out
the manifest file diff), so the recurring compare of two mostly-agreeing
stores scans only the churn — and nothing at all when neither table moved.

The reference's comparers (TiDBCompareByFile.java, HiveCompareByFile.java)
are special cases of this job (CDC final state vs a downstream store);
this surface generalizes them to ANY pair of keyed tables.

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_compare.py \
        --left /path/t1 --right /path/t2 --keys k1,k2 \
        [--values colA,colB]      # default: all shared non-key columns \
        [--n-buckets 4096] \
        [--state-dir /path/digests]   # incremental digest maintenance \
        [--output /path/diff]         # write row-level diff table \
        [--no-drill]                  # digests only (monitoring mode)

Prints one JSON line: bucket totals, suspect count, and (with drill-down)
rows_left_only / rows_right_only. Exit code 0 either way — consumers gate
on the JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binlog_processer_spark.operators.antientropy import (
    bucket_digests,
    bucket_id,
    diff_buckets,
    digest_state,
    row_diff,
)
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def _load(spark: SparkSession, path: str) -> tuple[DataFrame, SnapshotTable | None]:
    if os.path.exists(os.path.join(path, "_current")):
        t = SnapshotTable(path)
        return t.read(spark), t
    return spark.read.parquet(path), None


def _digests(
    spark: SparkSession,
    df: DataFrame,
    tbl: SnapshotTable | None,
    state_root: str | None,
    keys: list[str],
    values: list[str],
    n_buckets: int,
) -> DataFrame:
    if tbl is not None and state_root:
        return digest_state(
            spark, tbl, SnapshotTable(state_root), keys, values, n_buckets
        )
    return bucket_digests(df, keys, [F.expr(v) for v in values], n_buckets)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--left", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--keys", required=True, help="comma-separated key columns")
    ap.add_argument(
        "--values",
        help="comma-separated value columns/SQL exprs to compare "
        "(default: all shared non-key columns, name order)",
    )
    ap.add_argument("--n-buckets", type=int, default=4096)
    ap.add_argument(
        "--state-dir",
        help="maintain incremental digest state under <dir>/left and "
        "<dir>/right (snapshot-table inputs only)",
    )
    ap.add_argument("--output", help="write the row-level diff table here")
    ap.add_argument(
        "--no-drill", action="store_true",
        help="stop after the digest compare (monitoring mode)",
    )
    ap.add_argument(
        "--part-date", metavar="YYYY-MM-DD",
        help="compare ONE part_date day only (the reference's date-keyed "
        "compare drivers, TiDBCompareByDate.java:66-127 / "
        "HiveCompareByDate.java); snapshot-table sides use zone-map file "
        "pruning (SnapshotTable.read_where)",
    )
    ap.add_argument(
        "--date-range", nargs=2, metavar=("FROM", "TO"),
        help="compare an inclusive part_date range (YYYY-MM-DD x2)",
    )
    args = ap.parse_args()
    keys = [k.strip() for k in args.keys.split(",") if k.strip()]

    import datetime as _dt

    date_lo = date_hi = None
    if args.part_date and args.date_range:
        ap.error("--part-date and --date-range are mutually exclusive")
    if args.part_date:
        date_lo = date_hi = _dt.date.fromisoformat(args.part_date)
    elif args.date_range:
        date_lo = _dt.date.fromisoformat(args.date_range[0])
        date_hi = _dt.date.fromisoformat(args.date_range[1])
        if date_hi < date_lo:
            ap.error("--date-range FROM must be <= TO")
    if date_lo is not None and args.state_dir:
        # incremental digest state folds the FULL table's manifest diff;
        # mixing it with a scoped read would corrupt the persisted digests
        ap.error("--part-date/--date-range cannot combine with --state-dir")

    spark = get_spark("binlog-compare")

    def _scoped(path: str):
        df, tbl = _load(spark, path)
        if date_lo is None:
            return df, tbl
        if tbl is not None:
            # zone-map-pruned scoped scan; digests then derive from the
            # plain DataFrame (bucket_digests), not the state path
            return (
                tbl.read_where(spark, {"part_date": (date_lo, date_hi)}),
                None,
            )
        return (
            df.filter(F.col("part_date").between(date_lo, date_hi)),
            None,
        )

    left, lt = _scoped(args.left)
    right, rt = _scoped(args.right)

    if args.values:
        # paren-aware split: the help promises SQL exprs, and those carry
        # commas inside calls — "coalesce(v,0),w" is two values, not three
        values, depth, cur = [], 0, []
        for ch in args.values:
            if ch == "," and depth == 0:
                values.append("".join(cur).strip())
                cur = []
                continue
            depth += ch == "("
            depth -= ch == ")"
            cur.append(ch)
        values.append("".join(cur).strip())
        values = [v for v in values if v]
    else:
        values = sorted(
            (set(left.columns) & set(right.columns)) - set(keys)
        )
    summary: dict = {
        "keys": keys,
        "values": values,
        "n_buckets": args.n_buckets,
    }
    if date_lo is not None:
        summary["date_from"] = str(date_lo)
        summary["date_to"] = str(date_hi)

    ld = _digests(
        spark, left, lt,
        os.path.join(args.state_dir, "left") if args.state_dir else None,
        keys, values, args.n_buckets,
    )
    rd = _digests(
        spark, right, rt,
        os.path.join(args.state_dir, "right") if args.state_dir else None,
        keys, values, args.n_buckets,
    )
    suspects = diff_buckets(ld, rd)
    ids = [r["bucket"] for r in suspects.select("bucket").collect()]
    summary["suspect_buckets"] = len(ids)
    summary["agree"] = not ids

    if ids and not args.no_drill:
        proj = keys + [
            F.expr(v).alias(f"v{i}") for i, v in enumerate(values)
        ]
        lf = left.filter(bucket_id(keys, args.n_buckets).isin(ids)).select(*proj)
        rf = right.filter(bucket_id(keys, args.n_buckets).isin(ids)).select(*proj)
        out_cols = keys + [f"v{i}" for i in range(len(values))]
        diff = row_diff(lf, rf, out_cols).persist()
        sides = {
            r["_side"]: r["cnt"]
            for r in diff.groupBy("_side").agg(F.count("*").alias("cnt")).collect()
        }
        summary["rows_left_only"] = sides.get("left_only", 0)
        summary["rows_right_only"] = sides.get("right_only", 0)
        if args.output:
            SnapshotTable(args.output).write(diff)
            summary["diff_table"] = args.output
        diff.unpersist()

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
