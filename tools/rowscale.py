"""Weak-scaling campaign: same pipeline, fixed cores, growing input.

The core-scaling campaigns (bench.py --scaling) vary parallelism at fixed
input; this tool varies input at fixed parallelism — the other axis a
10^12-row deployment cares about. Each point is one `bench.py
--pipeline-only` subprocess (fresh JVM, cold caches) pinned to a fixed CPU
set with taskset so noisy neighbors on the shared host can't donate or
steal cores mid-series. Sizes are run interleaved across reps (1M, 2M, …,
then again 1M, 2M, …) so a host-load swing hits every size, not one.

Emits one JSON line per run (the bench line + rep/pinned_cores/load_1m)
to --out; BENCH/BASELINE.md's "Data-size (weak) scaling" section is the
reduced report.

Usage:
    python tools/rowscale.py --sizes 1000000,2000000,4000000,8000000 \
        --reps 2 --cores 16 --out BENCH/rows_scaling_pinned16.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000000,2000000,4000000,8000000")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--out", default="/tmp/rowscale.jsonl")
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    cpu_list = f"0-{args.cores - 1}"
    out = open(args.out, "a")
    for rep in range(args.reps):
        for n in sizes:
            cmd = [
                "taskset", "-c", cpu_list, sys.executable,
                os.path.join(ROOT, "bench.py"),
                "--pipeline-only", "--cpus", str(args.cores), "--docs", str(n),
            ]
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600, cwd=ROOT
            )
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print("FAIL", n, r.stderr[-500:], file=sys.stderr)
                continue
            d = json.loads(lines[-1])
            d["rep"] = rep
            d["pinned_cores"] = args.cores
            try:
                d["load_1m"] = round(os.getloadavg()[0], 2)
            except OSError:
                pass
            out.write(json.dumps(d) + "\n")
            out.flush()
            print(rep, n, d.get("pipeline_sec"), d.get("throughput_seq_per_sec"))


if __name__ == "__main__":
    main()
