"""spark-submit entry point for corpus deduplication.

The LLM-data-side job surface: MinHash-LSH candidate pairs → connected
components → keep-one-per-cluster decision, with the band index persisted
as a snapshot table so the NEXT run over a new batch joins incrementally
instead of re-hashing the corpus (operators/dedup.py
incremental_minhash_pairs).

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_dedup.py \
        --docs /path/to/documents.parquet --output /path/to/dedup_wh \
        [--k 8] [--bands 4] [--incremental]

First run: full LSH over --docs; writes <output>/band_index,
<output>/components, <output>/keep_list (each a snapshot table) and
prints a JSON summary line. With --incremental, --docs is treated as a
NEW batch: pairs are generated against the existing band_index only
(the corpus is never re-hashed), the batch's bands are appended to the
index, pairs accumulate in <output>/pairs, and components + keep_list
are recomputed over the accumulated pair set — monotonicity (pairs only
grow, min-id reps only decrease) makes (previous keeps ∪ new batch)
re-filtered against current components the globally-correct keep list.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binlog_processer_spark.operators._cache import unpin_all
from binlog_processer_spark.operators.dedup import (
    connected_components,
    incremental_minhash_pairs,
    keep_representatives,
    minhash_bands,
    minhash_lsh_pairs,
)
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="dedup warehouse dir")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument(
        "--incremental",
        action="store_true",
        help="treat --docs as a new batch against the existing band index",
    )
    args = ap.parse_args()

    spark = get_spark("binlog-dedup")
    docs = spark.read.parquet(args.docs)
    index_t = SnapshotTable(os.path.join(args.output, "band_index"))
    pairs_t = SnapshotTable(os.path.join(args.output, "pairs"))
    comp_t = SnapshotTable(os.path.join(args.output, "components"))
    keep_t = SnapshotTable(os.path.join(args.output, "keep_list"))

    if args.incremental:
        index = index_t.read(spark)
        new_pairs = incremental_minhash_pairs(
            docs, index, k=args.k, bands=args.bands
        )
        pairs_t.write(new_pairs, mode="append")
        index_t.write(
            minhash_bands(docs, k=args.k, bands=args.bands), mode="append"
        )
        pairs = pairs_t.read(spark)
    else:
        pairs = minhash_lsh_pairs(docs, k=args.k, bands=args.bands)
        pairs_t.write(pairs, mode="overwrite")
        index_t.write(
            minhash_bands(docs, k=args.k, bands=args.bands), mode="overwrite"
        )
        pairs = pairs_t.read(spark)

    comp = connected_components(pairs)
    comp_t.write(comp, mode="overwrite")
    comp = comp_t.read(spark)

    # keep-list over every doc seen so far. Pairs only ever ACCUMULATE, so
    # a doc dropped in an earlier run can never become kept (its component
    # only grows and the min-id rep only decreases) — the candidates for
    # this run are exactly (previous keep list) ∪ (new batch), re-filtered
    # against the CURRENT components: a previously-kept doc that a new
    # pair just clustered is dropped now, never left stale.
    batch = docs.select("doc_id", "source")
    if args.incremental:
        candidates = keep_t.read(spark).unionByName(batch).distinct()
    else:
        candidates = batch
    kept = keep_representatives(candidates, comp)
    keep_t.write(kept, mode="overwrite")

    out = {
        "docs_in": docs.count(),
        "pairs_total": pairs.count(),
        "clustered_docs": comp.count(),
        "clusters": comp.select("component_id").distinct().count(),
        "kept_total": kept.count(),
        "incremental": args.incremental,
    }
    unpin_all()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
