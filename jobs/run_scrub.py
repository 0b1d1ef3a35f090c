"""spark-submit entry point for structural scrub of the routed warehouse.

Detects corrupt routed output files, quarantines them (metadata-only
snapshot — the table stays readable), identifies which SOURCE files lost
rows, rewrites the table without those sources, and resets their
processed-manifest status so the next ``run_pipeline`` replays them with no
duplicates (ListCorruptAvroFile.java:34-44 + Repair.java:179-260 restated
over snapshot storage).

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_scrub.py \
        --warehouse /path/to/wh [--deep] [--dry-run]

Prints one JSON line: files scanned/corrupt, affected source file_ids, and
the snapshots committed. With --dry-run only the scan runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binlog_processer_spark.operators.resume import ProcessedManifest
from binlog_processer_spark.operators.structural import (
    affected_file_ids,
    drop_file_ids,
    quarantine_corrupt,
    scan_corrupt_files,
)
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--deep", action="store_true",
                    help="decode all row groups, not just footers")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    spark = get_spark("binlog-scrub")
    routed = SnapshotTable(os.path.join(args.warehouse, "routed"))
    lineage = SnapshotTable(os.path.join(args.warehouse, "lineage"))

    # one scan, one action: the rows are one per data FILE (bounded by file
    # counts, never row counts), so collecting once and deriving both the
    # corrupt list and the total avoids re-reading every footer (--deep:
    # every file fully decoded) for a second count
    rows = scan_corrupt_files(spark, routed, deep=args.deep).collect()
    corrupt = [r.path for r in rows if not r.ok]
    out = {"files_scanned": len(rows), "files_corrupt": len(corrupt)}

    if corrupt and not args.dry_run:
        out["quarantine_snapshot"] = quarantine_corrupt(routed, corrupt)
        affected = affected_file_ids(spark, routed, lineage)
        out["affected_file_ids"] = affected
        if affected:
            out["rewrite_snapshot"] = drop_file_ids(spark, routed, affected)
            ProcessedManifest(
                os.path.join(args.warehouse, "_processed.json")
            ).unmark(affected)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
