"""spark-submit entry point for row-level erasure (GDPR/right-to-be-
forgotten) on a snapshot table, committed merge-on-read.

The keys to erase come from a predicate over the table itself
(``--where``) or from a parquet of key tuples (``--keys``). The commit is
an Iceberg-v2-style equality-delete file (``SnapshotTable.write_deletes``):
kilobytes written, zero data files rewritten — on a 100 TB table the
erasure of a few thousand subjects commits in seconds, and every
subsequent read applies the deletes as a broadcast anti-join. The rewrite
cost is deferred until ``--materialize`` (or any compaction) folds the
debt into the data files.

The reference has no row-level delete: its repair path rewrites whole
files (PartitionWriterManager.java analogue). Delete files are the
scale-path generalization of that rewrite.

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_erase.py \
        --warehouse /path/to/wh [--table routed] \
        --where "cast(doc_id as bigint) % 13 = 4" --key-cols doc_id \
        [--keys /path/keys.parquet] [--materialize] [--verify] [--dry-run]

Prints one JSON line: keys matched, snapshots committed, whether the data
file inventory was left untouched, and (with --verify) the count of
matching rows still visible (must be 0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", default="routed",
                    help="table dir under the warehouse (default: routed)")
    ap.add_argument("--where", metavar="PREDICATE",
                    help="SQL predicate over the table selecting the rows "
                         "to erase (keys are projected from the matches)")
    ap.add_argument("--keys", metavar="PARQUET",
                    help="parquet of key tuples to erase (alternative to "
                         "--where; columns default to --key-cols)")
    ap.add_argument("--key-cols", default="doc_id",
                    help="comma-separated equality-delete key columns "
                         "(default: doc_id)")
    ap.add_argument("--materialize", action="store_true",
                    help="fold the delete debt into the data files after "
                         "the delete commit (bounded rewrite)")
    ap.add_argument("--verify", action="store_true",
                    help="re-scan after the commit and report how many "
                         "matching rows are still visible (expect 0; "
                         "requires --where)")
    ap.add_argument("--dry-run", action="store_true",
                    help="report the matched key count, commit nothing")
    args = ap.parse_args()
    if bool(args.where) == bool(args.keys):
        ap.error("exactly one of --where / --keys is required")
    if args.verify and not args.where:
        ap.error("--verify needs --where to re-check against")
    key_cols = [c.strip() for c in args.key_cols.split(",") if c.strip()]

    spark = get_spark("binlog-erase")
    tbl = SnapshotTable(os.path.join(args.warehouse, args.table))

    if args.where:
        keys = tbl.read(spark).filter(args.where).select(*key_cols).distinct()
    else:
        keys = spark.read.parquet(args.keys).select(*key_cols).distinct()
    # one action: the distinct key count both reports and gates the commit
    n_keys = keys.count()
    out: dict = {
        "table": args.table,
        "key_cols": key_cols,
        "keys_matched": n_keys,
        "committed": False,
    }

    if n_keys and not args.dry_run:
        pre_files = tbl.data_files()
        out["delete_snapshot"] = tbl.write_deletes(keys, key_cols)
        out["committed"] = True
        # the merge-on-read claim, checked: the delete commit must not
        # have rewritten or dropped a single data file
        out["data_files_untouched"] = (
            tbl.data_files(out["delete_snapshot"]) == pre_files
        )
        if args.materialize:
            out["materialize_snapshot"] = tbl.materialize_deletes(spark)
            out["delete_debt_after"] = len(
                tbl._manifest(out["materialize_snapshot"]).get(
                    "delete_files"
                )
                or []
            )
        if args.verify:
            out["visible_matches_after"] = (
                tbl.read(spark).filter(args.where).count()
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
