"""Shuffle-growth audit: compare per-query I/O across two sweep scales.

Usage:
    python tools/io_growth.py SELFCHECK_r4_sf0.01.json SELFCHECK_r4_sf0.1.json

Reads the ``io`` block tools/selfcheck.py records per query and prints a
markdown table of shuffle_write_mb at both scales plus the growth ratio.
The input corpus grows 10x between sf0.01 and sf0.1, so:

- ratio ≈ 0-2   → wire traffic is BOUNDED (map-side-combined aggregate,
  broadcast join, top-k heap): the shapes that survive 100 TB unchanged.
- ratio ≈ 10    → row-scale operator (candidate-pair explodes, payload
  repartitions): linear in input by design; fine as long as per-row
  constants are small — flag if a supposedly-bounded operator shows up here.
- ratio ≫ 10    → superlinear: a rebuild flag, nothing should print here.

Queries with zero shuffle at BOTH scales are summarized in one line (the
zero-Exchange set — parse, scrubs, funnels, literal-argmax ANN).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    small = json.load(open(sys.argv[1]))["results"]
    big = json.load(open(sys.argv[2]))["results"]
    shared = [
        n
        for n in small
        if n in big and small[n].get("io") and big[n].get("io")
    ]
    zero, rows = [], []
    for n in sorted(shared):
        a = small[n]["io"]["shuffle_write_mb"]
        b = big[n]["io"]["shuffle_write_mb"]
        if a == 0 and b == 0:
            zero.append(n)
            continue
        ratio = round(b / a, 1) if a > 0 else float("inf")
        rows.append((n, a, b, ratio))
    # heaviest large-scale shufflers first: those dominate a 100x run
    rows.sort(key=lambda r: -r[2])
    print(f"| query | shuffle MB @{sys.argv[1].split('sf')[-1].removesuffix('.json')}"
          f" | @{sys.argv[2].split('sf')[-1].removesuffix('.json')} | growth |")
    print("|---|---|---|---|")
    for n, a, b, ratio in rows:
        print(f"| {n} | {a} | {b} | {ratio if ratio != float('inf') else '∞'}x |")
    print()
    print(
        f"{len(zero)} queries shuffle ZERO bytes at both scales: "
        + ", ".join(zero)
    )


if __name__ == "__main__":
    main()
