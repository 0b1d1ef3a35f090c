"""spark-submit entry point for the streaming CDC apply.

Continuously (or in AvailableNow drains) merges a raw change stream
into a keyed current-state snapshot table — the Spark-native form of
the reference's per-record TiDB upsert end state. Each micro-batch is
collapsed to one row per touched key, monotone-merged (higher
event_seq wins, so replays and out-of-order files are harmless), and
committed file-scoped: only state files containing a batch key are
rewritten, everything else is carried by reference.

Usage (cluster)::

    spark-submit --py-files dist/engine.zip jobs/run_apply.py \
        --input /path/to/raw_events --output /path/to/state_wh

Usage (local dev, generated corpus)::

    python jobs/run_apply.py --generate 20000 --output /tmp/state_wh

Prints one JSON summary line. Rerunning with the same output dir
resumes from the stream checkpoint: already-drained files are skipped,
new files are merged in — the daily-ingest shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binlog_processer_spark.functions.parse import serialize_expr
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.sources.generator import generate_corpus, routing_dim
from binlog_processer_spark.streaming.upsert import run_streaming_upsert


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="parquet dir with a `raw` string column")
    ap.add_argument(
        "--generate", type=int, metavar="N_DOCS",
        help="generate a deterministic N_DOCS corpus instead of --input",
    )
    ap.add_argument("--output", required=True, help="state warehouse dir")
    ap.add_argument(
        "--max-files-per-trigger", type=int, default=1,
        help="micro-batch granularity (files per trigger; default 1)",
    )
    ap.add_argument(
        "--expire-below", type=int, metavar="SEQ",
        help="after the drain, drop Delete tombstones with final_seq <= "
             "SEQ (safe once the checkpoint can no longer replay them)",
    )
    ap.add_argument(
        "--digest-state", action="store_true",
        help="maintain per-bucket anti-entropy digests of the state table "
        "under <output>/digests — incremental: each run folds only the "
        "files this drain churned (operators/antientropy.digest_state), so "
        "a downstream run_compare verifies the store without scanning it",
    )
    args = ap.parse_args()
    if not args.input and not args.generate:
        ap.error("one of --input / --generate is required")

    spark = get_spark("binlog-apply")
    if args.generate:
        raw_dir = os.path.join(args.output, "_generated_raw")
        done = os.path.join(raw_dir, "_SUCCESS")
        # the corpus is deterministic: reuse an existing generation so a
        # rerun exercises the checkpoint skip (a rewrite would mint new
        # file identities and re-drain everything — harmless under the
        # idempotent merge, but it hides the resume behavior)
        if not os.path.exists(done):
            generate_corpus(spark, args.generate).select(
                serialize_expr().alias("raw")
            ).repartition(4).write.mode("overwrite").parquet(raw_dir)
    else:
        raw_dir = args.input

    table = run_streaming_upsert(
        spark, raw_dir, routing_dim(spark), args.output,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    if args.expire_below is not None:
        from binlog_processer_spark.streaming.upsert import (
            expire_tombstones,
        )

        expire_tombstones(spark, table, args.expire_below)
    state = table.read(spark)
    live = state.filter(F.col("final_op") != "Delete")
    out = {
        "snapshot": table.current_snapshot(),
        "keys_total": state.count(),
        "keys_live": live.count(),
        "tombstones": state.filter(F.col("final_op") == "Delete").count(),
        "max_seq": state.agg(F.max("final_seq")).collect()[0][0],
    }
    if args.digest_state:
        from binlog_processer_spark.operators.antientropy import digest_state
        from binlog_processer_spark.storage.table import SnapshotTable

        dig = digest_state(
            spark, table,
            SnapshotTable(os.path.join(args.output, "digests")),
            ["database_name", "table_name", "doc_id"],
            ["final_op", "final_seq"],
        )
        out["digest_buckets"] = dig.count()
        out["digest_of_snapshot"] = table.current_snapshot()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
