"""spark-submit entry point for the ANN index: build once, probe many.

The vector-store surface over the engine's IVF stack
(operators/similarity.py): build materializes the inverted-list layout
— (vec_id, centroid_id, embedding) partitioned by centroid_id — plus
the frozen centroid set, each as a snapshot table; probes then touch
only their n_probe lists (file-level partition pruning does the rest),
and daily batches append against the frozen centroids without touching
old lists.

Usage::

    # build (optionally k-means-refined centroids)
    spark-submit --py-files dist/engine.zip jobs/run_index.py \
        --embeddings <parquet> --output <index wh> \
        [--centroids 16] [--refine 2]

    # incremental ingest: assign a new batch against the FROZEN
    # centroids, append its lists
    spark-submit ... jobs/run_index.py \
        --embeddings <new batch parquet> --output <index wh> --add

    # probe: top-k neighbors for the given vec_ids
    spark-submit ... jobs/run_index.py \
        --output <index wh> --probe 1,2,3 [--k 10] [--n-probe 4]

One JSON summary line per run. Probe results are bit-identical to
computing the index inline (ivf_topk) — same fixed-point scoring, same
tie order; tests/test_ann_index.py pins it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_processer_spark.operators._cache import unpin_all
from binlog_processer_spark.operators.similarity import (
    ivf_assignments,
    ivf_index,
    ivf_probe,
)
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", help="embeddings parquet (build/--add)")
    ap.add_argument("--output", required=True, help="index warehouse dir")
    ap.add_argument("--centroids", type=int, default=16)
    ap.add_argument("--refine", type=int, default=0,
                    help="k-means refinement rounds at build time")
    ap.add_argument("--add", action="store_true",
                    help="append a new batch against the frozen centroids")
    ap.add_argument("--probe", metavar="IDS",
                    help="comma-separated vec_ids to query")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-probe", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark("run_index")
    index_t = SnapshotTable(os.path.join(args.output, "ivf_index"))
    cent_t = SnapshotTable(os.path.join(args.output, "centroids"))
    out: dict = {}

    if args.probe:
        ids = [int(x) for x in args.probe.split(",") if x.strip()]
        top = ivf_probe(
            index_t.read(spark),
            cent_t.read(spark),
            ids,
            k=args.k,
            n_probe=args.n_probe,
        )
        rows = [r.asDict() for r in top.collect()]  # bounded: k × queries
        out = {"mode": "probe", "queries": len(ids), "rows": rows}
    elif args.add:
        if not args.embeddings:
            ap.error("--add requires --embeddings")
        batch = spark.read.parquet(args.embeddings).select(
            "vec_id", "embedding"
        )
        appended = ivf_assignments(
            batch, cent_t.read(spark), keep_embedding=True
        )
        index_t.write(
            appended, partition_by=["centroid_id"], mode="append"
        )
        out = {
            "mode": "add",
            "added": batch.count(),
            "total": index_t.read(spark).count(),
        }
    else:
        if not args.embeddings:
            ap.error("build requires --embeddings")
        emb = spark.read.parquet(args.embeddings)
        index, cent = ivf_index(
            emb, n_centroids=args.centroids, refine_iters=args.refine
        )
        index_t.write(index, partition_by=["centroid_id"])
        cent_t.write(cent)
        out = {
            "mode": "build",
            "vectors": index_t.read(spark).count(),
            "centroids": cent_t.read(spark).count(),
            "refined_iters": args.refine,
        }

    unpin_all()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
