"""spark-submit entry point for relaying a table's change feed downstream.

Polls a SnapshotTable's change-data-feed (storage/changes.ChangeFeed) and
appends each batch — the changed rows tagged with ``_change_type`` and the
source snapshot — to a downstream changelog table. Exactly-once end to
end despite the at-least-once cursor:

- the cursor commits AFTER the sink write (a crash re-polls the batch);
- the sink write is idempotent: each batch commits with the source
  snapshot recorded in the snapshot properties, and a re-polled batch
  whose snapshot the sink already recorded is skipped — the classic
  transactional-sink dedup, done with the metadata the storage layer
  already keeps.

Run it on a schedule (or in a loop) per consumer; cursors are
consumer-owned, so any number of downstreams follow one table at their
own pace without coordinating.

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_feed.py \
        --source /path/src_table --target /path/changelog \
        --cursor /path/consumer/cursor [--keys k1,k2] [--earliest]

Prints one JSON line: rows relayed, snapshot range, whether the sink
write was skipped as a replay.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.changes import ChangeFeed
from binlog_processer_spark.storage.table import SnapshotTable


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="source snapshot table")
    ap.add_argument("--target", required=True, help="changelog sink table")
    ap.add_argument("--cursor", required=True, help="consumer cursor file")
    ap.add_argument("--keys", help="comma-separated key columns for "
                    "update classification (else insert/delete only)")
    ap.add_argument("--earliest", action="store_true",
                    help="bootstrap: emit the full current snapshot as "
                    "inserts on the first poll")
    ap.add_argument(
        "--mirror", action="store_true",
        help="maintain --target as a MIRROR of the source (CDC "
        "replication, file-scoped rewrites) instead of appending a "
        "changelog; the apply is idempotent, so the at-least-once cursor "
        "already yields exactly-once state. Requires --keys. Caveat: if "
        "the CURSOR FILE itself is lost (not a mere crash), an --earliest "
        "re-bootstrap re-inserts the snapshot but cannot remove mirror "
        "rows whose keys the source deleted in the gap — drop the mirror "
        "with the cursor for a full resync.",
    )
    args = ap.parse_args()
    keys = [k.strip() for k in args.keys.split(",")] if args.keys else None
    if args.mirror and not keys:
        ap.error("--mirror requires --keys")

    spark = get_spark("binlog-feed")
    src = SnapshotTable(args.source)
    sink = SnapshotTable(args.target)
    feed = ChangeFeed(
        src, args.cursor, key_cols=keys,
        initial="earliest" if args.earliest else "latest",
    )
    out = {"rows": 0, "cursor_repaired": False}
    # exactly-once recovery: if a previous run crashed AFTER the sink
    # write but BEFORE the cursor commit, the sink's recorded watermark is
    # ahead of the cursor — roll the cursor forward FIRST, so the next
    # poll starts where the sink actually is. Checking only "is this the
    # same batch" would double-relay the old span whenever the source
    # advanced between the crash and the retry.
    last = sink.current_snapshot()
    sink_pos = (
        sink._manifest(last).get("properties", {}).get("feed_snapshot")
        if last is not None
        else None
    )
    pos = feed.position()
    if sink_pos is not None and (pos is None or sink_pos > pos):
        feed.commit(sink_pos)
        out["cursor_repaired"] = True
    out["from"] = feed.position()
    df, snap = feed.poll(spark)
    out["to"] = snap
    if df is not None:
        # the CDF batch feeds the sink write AND the row-count report (and
        # in --mirror mode several sub-plans): pin it so the manifest-diff
        # scan + signed-count aggregate run once, not per consumer
        df = df.persist()
        try:
            out["rows"] = df.count()
            if args.mirror:
                from binlog_processer_spark.storage.changes import (
                    apply_changes,
                )

                out["mirror_snapshot"] = apply_changes(spark, sink, df, keys)
            else:
                batch = df.withColumn("_feed_snapshot", F.lit(snap))
                sink.write(
                    batch,
                    mode="append" if last is not None else "overwrite",
                    properties={"feed_snapshot": snap},
                )
        finally:
            df.unpersist()
    feed.commit(snap)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
