"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, then compares
row-count, column names, and order-insensitive values (columns sorted by
name, rows sorted) — approximating the driver's value-hash compare.

Usage: python tools/selfcheck.py [--out ARTIFACT.json] [sf_dir] [query ...]

With ``--out``, writes a driver-shaped JSON artifact — per query:
``rows_match`` / ``schema_match`` / ``hash_match`` booleans (rows-only
queries report ``hash_match: null``), row counts, error, and wall time —
so the full-suite sweep is a committed, auditable record rather than a
claim (VERDICT r3 next-round item 2).
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            import numpy as np

            # the driver's canon sort_values THROWS on list cells
            # ("unhashable type: 'list'") — do NOT soften it here (tuple
            # normalization hid exactly this in round 1); surface it the
            # same way the driver would
            bad = s.map(lambda v: isinstance(v, (list, tuple, np.ndarray)))
            if bad.any():
                raise TypeError(
                    f"column {c!r} holds array values — the driver's canon "
                    "cannot hash these; project a scalar digest instead"
                )
            df[c] = s.astype(str)
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype.kind == "f":
            df[c] = s.round(6)
        elif str(s.dtype).startswith(("Int", "int", "uint")):
            df[c] = s.astype("float64").round(0)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, spark_pdf, duck_pdf) -> list[str]:
    errs = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        errs.append(f"columns spark={sc} duck={dc}")
        return errs
    # the driver's value hash is dtype-sensitive: DuckDB HUGEINT sums arrive
    # as object/float and hash-mismatch Spark's int64 even when values are
    # equal — flag any dtype-KIND divergence instead of coercing it away
    for c in sc:
        ka = spark_pdf[c].dtype.kind
        kb = duck_pdf[c].dtype.kind
        if ka != kb and {ka, kb} - {"M", "m"}:
            errs.append(
                f"dtype-kind col {c}: spark={spark_pdf[c].dtype} "
                f"duck={duck_pdf[c].dtype} (driver hash would mismatch)"
            )
    if errs:
        return errs
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" and bv.dtype.kind == "f":
                bad = [
                    i
                    for i, (x, y) in enumerate(zip(av, bv))
                    if not (
                        (math.isnan(x) and math.isnan(y))
                        or math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6)
                    )
                ]
            else:
                neq = av.astype(str) != bv.astype(str)
                bad = list(av.index[neq])
            if bad:
                i = bad[0]
                errs.append(
                    f"col {c}: {len(bad)} diffs, first row {i}: "
                    f"spark={a[c][i]!r} duck={b[c][i]!r}"
                )
    return errs


def main():
    import json
    import time

    import duckdb

    import __spark_entry__ as entrymod
    from binlog_processer_spark.operators._cache import unpin_all
    from binlog_processer_spark.plans import iostat
    from binlog_processer_spark.session import get_spark

    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    record: dict[str, dict] = {}

    def _rec(name, spdf=None, dpdf=None, errs=None, err=None, wall=0.0,
             io=None):
        etxt = "; ".join(errs) if errs else err
        record[name] = {
            # measured per-query Spark I/O (plans/iostat.py): shuffle
            # bytes are exact, input bytes a lower bound on local files.
            # Comparing the same query's shuffle volume across the
            # sf0.01 and sf0.1 artifacts shows which operators' wire
            # traffic grows with rows (row-scale ops) vs stays bounded
            # (map-side-combined aggregates) — the 100 TB growth audit
            # as committed data.
            "io": io,
            "rows_match": bool(
                spdf is not None
                and (dpdf is None or len(spdf) == len(dpdf))
                and not any("rowcount" in e for e in errs or [])
            ),
            "schema_match": bool(
                spdf is not None
                and not any(
                    e.startswith(("columns", "dtype-kind"))
                    for e in errs or []
                )
            ),
            # rows-only queries (no oracle) report null, like the driver
            "hash_match": (
                None
                if spdf is not None and dpdf is None and not err
                else bool(spdf is not None and dpdf is not None and not errs)
            ),
            "spark_rows": len(spdf) if spdf is not None else None,
            "oracle_rows": len(dpdf) if dpdf is not None else None,
            "err": etxt or None,
            "wall_sec": round(wall, 3),
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        pre = iostat.stage_totals(spark)
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            _rec(name, err=f"spark error: {e}", wall=time.time() - t0)
            continue
        finally:
            unpin_all()  # queries pin LSH/IVF intermediates; time them cold
        io = iostat.to_mb(iostat.delta(pre, iostat.stage_totals(spark)))
        if name not in oracles:
            print(f"PASS {name} (rows-only: {len(spdf)} rows)")
            _rec(name, spdf=spdf, wall=time.time() - t0, io=io)
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            _rec(name, spdf=spdf, err=f"duckdb error: {e}",
                 wall=time.time() - t0, io=io)
            continue
        errs = compare(name, spdf, dpdf)
        _rec(name, spdf=spdf, dpdf=dpdf, errs=errs, wall=time.time() - t0,
             io=io)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            failed.append(name)
        else:
            print(f"PASS {name} ({len(spdf)} rows)")
    n_run = len(record) if only else len(qs)
    print(f"\n{n_run - len(failed)}/{n_run} pass")
    if out_path:
        doc = {
            "sf_dir": sf_dir,
            "queries_total": len(qs),
            "queries_run": len(record),
            "failed": sorted(failed),
            "results": record,
        }
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
        print(f"artifact: {out_path}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
