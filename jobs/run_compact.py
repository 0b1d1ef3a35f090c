"""spark-submit entry point for small-file compaction of a snapshot table.

Bin-packs each partition's accumulated small files (one per pipeline run —
the reference's per-binlog-file Avro sink, PartitionWriterManager.java:60-96,
fragments exactly this way) toward a target file size and commits the
rewrite as a new snapshot. Planning is metadata-only (manifest file
inventory + recorded sizes); only the affected bytes are read or written;
untouched files are carried by reference. Rollback-able like any snapshot.

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_compact.py \
        --warehouse /path/to/wh [--table routed] \
        [--target-mb 128] [--min-files 2] [--dry-run] \
        [--zorder col1,col2 [--zorder-files N]]

Prints one JSON line: the plan (groups, files, bytes) and, unless
--dry-run, the committed snapshot.

``--zorder`` switches from bin-packing to a whole-table Morton-curve
re-layout (operators/compact.rewrite_zordered): after it, zone-map
pruning works on every listed column. Run it like any OPTIMIZE — off
the ingest path, as often as the read patterns are worth it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_processer_spark.operators.compact import (
    compact,
    compaction_plan,
)
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", default="routed",
                    help="table name under the warehouse root")
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--min-files", type=int, default=2)
    ap.add_argument("--dry-run", action="store_true",
                    help="print the plan without rewriting anything")
    ap.add_argument("--zorder", default=None, metavar="COLS",
                    help="comma-separated columns: whole-table z-order "
                         "re-layout instead of bin-packing")
    ap.add_argument("--zorder-files", type=int, default=None, metavar="N",
                    help="output file count for --zorder (default: keep "
                         "the current file count)")
    ap.add_argument("--expire-keep", type=int, default=None, metavar="N",
                    help="after compacting, expire snapshots keeping the "
                         "last N (physically vacuums superseded files; "
                         "keeps an N-deep rollback window)")
    args = ap.parse_args()

    from binlog_processer_spark.storage.catalog import Catalog, advance_pin

    tbl = SnapshotTable(os.path.join(args.warehouse, args.table))
    target = args.target_mb * 1024 * 1024

    def _advance(out, new_snap):
        # a compaction rewrite must move the warehouse catalog with it —
        # otherwise catalog readers keep pinning the pre-compact snapshot
        # and a later vacuum would break them
        v = advance_pin(args.warehouse, args.table, new_snap, note="compact")
        if v is not None:
            out["catalog_version"] = v

    def _expire(out, keep_last):
        cat = Catalog(args.warehouse)
        pins: set[int] = set()
        if cat.current_version() is not None:
            # trim catalog history to the same depth FIRST, then floor the
            # table expiry on what retained versions still pin
            cat.expire_versions(keep_last=keep_last)
            pins = cat.pinned_snapshots(args.table)
        exp = tbl.expire_snapshots(
            keep_last=keep_last, keep_snapshots=pins
        )
        out["snapshots_expired"] = len(exp["snapshots_removed"])
        out["files_vacuumed"] = exp["files_deleted"]
        out["bytes_freed"] = exp["bytes_freed"]

    if args.zorder:
        from binlog_processer_spark.operators.compact import rewrite_zordered

        cols = [c.strip() for c in args.zorder.split(",") if c.strip()]
        files_before = len(tbl.data_files())
        if args.dry_run:
            out = {
                "snapshot": tbl.current_snapshot(), "committed": False,
                "zorder": cols, "files": files_before,
            }
        else:
            spark = get_spark("binlog-compact")
            snap = rewrite_zordered(
                spark, tbl, cols, num_files=args.zorder_files
            )
            out = {
                "snapshot": snap, "committed": True, "zorder": cols,
                "files_before": files_before,
                "files_after": len(tbl.data_files()),
            }
            _advance(out, snap)
            if args.expire_keep is not None:
                _expire(out, args.expire_keep)
        print(json.dumps(out))
        return

    if args.dry_run:
        groups = compaction_plan(tbl, target, args.min_files)
        out = {"snapshot": tbl.current_snapshot(), "committed": False}
    else:
        spark = get_spark("binlog-compact")
        res = compact(spark, tbl, target, args.min_files)
        groups = res.groups
        out = {"snapshot": res.snapshot, "committed": bool(groups)}
        if groups:
            _advance(out, res.snapshot)

    out.update(
        {
            "groups": len(groups),
            "files_merged": sum(len(g.files) for g in groups),
            "files_target": sum(g.target_files for g in groups),
            "bytes": sum(g.bytes for g in groups),
            "partitions": [g.partition for g in groups[:20]],
        }
    )
    if args.expire_keep is not None and not args.dry_run:
        _expire(out, args.expire_keep)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
