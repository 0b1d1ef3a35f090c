"""Benchmark harness.

Default mode: runs the end-to-end parse→route→aggregate pipeline on a
deterministic generated corpus (BASELINE.json metric: sequences/sec) plus the
headline sf-dir queries, and prints ONE JSON line.

Scaling mode (--scaling): re-runs the pipeline at two parallelism levels
(local[8] vs local[32], the sandbox stand-in for N vs 4N executor clusters —
driver instruction) in fresh subprocesses on IDENTICAL input and writes
BENCH/BASELINE.md with throughput at both levels + scaling efficiency
eff = (T_8 / T_32) / 4 (≥0.8 target per north rule).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all), SPARK_GRAFT_BENCH_DOCS (corpus size).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
HEADLINE = [
    "parse_roundtrip",
    "sink_counts",
    "sink_counts_salted",
    "final_state",
    "windowed_histogram",
    "reconcile_findings",
    "repair_roundtrip",
]


def _bench_docs() -> int:
    if "SPARK_GRAFT_BENCH_DOCS" in os.environ:
        return int(os.environ["SPARK_GRAFT_BENCH_DOCS"])
    sf = _sf_of(SF_DIR)
    return max(50_000, int(5_000_000 * sf))  # sf0.1 → 500k docs ≈ 1M events


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_pipeline_bench(cpus: int, n_docs: int, keep_session: bool = False) -> dict:
    """Materialize raw input to parquet, then measure read→parse→enrich→
    route→write→aggregate wall time."""
    from pyspark.sql import functions as F

    from binlog_processer_spark.functions.parse import serialize_expr
    from binlog_processer_spark.plans.pipeline import run_pipeline
    from binlog_processer_spark.session import get_spark
    from binlog_processer_spark.sources.generator import generate_corpus, routing_dim

    spark = get_spark(
        f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    tmp = tempfile.mkdtemp(prefix="blp_bench_")
    try:
        raw_path = os.path.join(tmp, "raw")
        (
            generate_corpus(spark, n_docs, partitions=cpus * 2)
            .select(serialize_expr().alias("raw"))
            .write.mode("overwrite")
            .parquet(raw_path)
        )
        raw = spark.read.parquet(raw_path)
        n_events = raw.count()

        t0 = time.time()
        res = run_pipeline(
            spark, raw, routing_dim(spark), os.path.join(tmp, "out"), resume=False
        )
        wall = time.time() - t0
        return {
            "cpus": cpus,
            "n_docs": n_docs,
            "n_events": n_events,
            "rows_routed": res.metrics["rows_routed"],
            "pipeline_sec": round(wall, 3),
            "throughput_seq_per_sec": round(n_events / wall, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if not keep_session:
            spark.stop()


def run_query_bench(sf_dir: str, cpus: int) -> dict:
    import __spark_entry__ as entrymod
    from binlog_processer_spark.session import get_spark

    spark = get_spark(
        f"bench-q-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    spark.stop()
    return out


def scaling_run() -> None:
    """local[8] vs local[32] on identical input → BENCH/BASELINE.md."""
    n_docs = _bench_docs()
    results = {}
    for cpus in (8, 32):
        cmd = [
            sys.executable, __file__, "--pipeline-only", "--cpus", str(cpus),
            "--docs", str(n_docs),
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["pipeline_sec"], results[32]["pipeline_sec"]
    eff = (t8 / t32) / 4
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured pipeline throughput & scaling\n\n"
            f"Input: deterministic generated corpus, {n_docs} docs → "
            f"{results[32]['n_events']} events (identical at both levels).\n"
            "Job: read raw parquet → vectorized parse (mapInPandas) → broadcast\n"
            "enrich → route (filters, soft-delete window, dual trees) →\n"
            "partitioned snapshot write → per-sink aggregates + lineage.\n\n"
            "| parallelism | wall (s) | throughput (seq/s) |\n|---|---|---|\n"
            f"| local[8] (N) | {t8} | {results[8]['throughput_seq_per_sec']} |\n"
            f"| local[32] (4N) | {t32} | {results[32]['throughput_seq_per_sec']} |\n\n"
            f"**Scaling efficiency (T8/T32)/4 = {eff:.3f}** "
            f"(north-rule target ≥ 0.8).\n\n"
            "local[8] vs local[32] stands in for N vs 4N executor clusters per\n"
            "the driver's two-parallelism-level instruction; input, code, and\n"
            "configs are otherwise identical.\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3), **{f"local{c}": r for c, r in results.items()}}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--docs", type=int, default=None)
    args = ap.parse_args()

    if args.scaling:
        scaling_run()
        return

    n_docs = args.docs or _bench_docs()
    pipe = run_pipeline_bench(args.cpus, n_docs)
    if args.pipeline_only:
        print(json.dumps(pipe))
        return

    queries = run_query_bench(SF_DIR, args.cpus)
    result = {
        "metric": "end-to-end parse→route→aggregate throughput (sequences/sec)",
        "value": pipe["pipeline_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        **pipe,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
