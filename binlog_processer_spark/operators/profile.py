"""Single-pass table profiling: per-column completeness, cardinality,
and range, plus key-uniqueness — the Deequ-style data-quality summary a
100 TB ingest publishes next to every snapshot.

The reference validates per-sink row counts (BinlogCount.java analogue);
a training-data pipeline needs the column-level complement before any
downstream job trusts a new drop: which columns went null, whether an id
column silently lost uniqueness, whether a timestamp range ran ahead of
the wall clock. One operator, long-format output (a row per column), so
the report is schema-stable as profiled columns change.

Scale posture: ONE aggregate job. Multiple exact COUNT(DISTINCT) in a
single agg makes Catalyst plan an Expand (input × #distinct-aggs before
the partial aggregate) — deliberate and documented: the expansion is
map-side and the shuffle stays bounded by per-column cardinality, which
for profile-worthy columns (enums, ids, dates) is far below the row
count. For genuinely unbounded columns swap in approx_count_distinct —
documented rather than silently approximated so the DuckDB oracle can
gate the exact path bit-for-bit. min/max are cast to strings AFTER
aggregation (cheap, and makes the long format type-stable across
int/string/timestamp columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: one row per column with
    (col_name, n_rows, n_null, n_distinct, min_s, max_s).

    ``n_rows`` repeats the table count on every row so each line is
    self-contained (completeness = 1 - n_null/n_rows without a join).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    aggs = [F.count("*").cast("bigint").alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).cast("bigint").alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_s"),
                F.col(f"__mx_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def key_uniqueness(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Uniqueness check on a composite key: total rows, distinct key
    tuples, and the number of violating duplicate rows (0 = the key
    holds). The assertion every exactly-once sink publishes.

    Plan: one hash aggregate on the key (map-side combinable) reduced
    to a 1-row summary — never a window or a self-join.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    per_key = df.groupBy(*key_cols).agg(F.count("*").alias("__c"))
    return per_key.agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        (F.sum("__c") - F.count("*")).cast("bigint").alias("dup_rows"),
    )


def expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data contract (Deequ/Great-Expectations shape): evaluate
    every row-level rule in ONE scan and emit a long-format report
    ``(rule, col_name, violations, passed)``.

    Rule specs (dicts):

    - ``{"rule": "not_null", "column": c}``
    - ``{"rule": "in_range", "column": c, "lo": x, "hi": y}`` — bounds
      inclusive, either side may be absent; NULLs pass (compose with
      not_null to forbid them) so the rules stay orthogonal
    - ``{"rule": "in_set", "column": c, "values": [...]}`` — NULLs pass
    - ``{"rule": "matches", "column": c, "pattern": r}`` — regex SEARCH
      semantics (Spark ``rlike`` / DuckDB ``regexp_matches``): anchor with
      ``^...$`` for a full match; NULLs pass
    - ``{"rule": "sql", "name": n, "predicate": "<boolean sql>"}`` — rows
      must satisfy the predicate (NULL result counts as a violation: an
      undecidable contract is a broken contract)
    - ``{"rule": "unique", "columns": [c1, ...]}`` — composite-key
      uniqueness; violations = rows carrying a duplicated key

    Scale posture: all row-level rules ride one aggregate over one scan
    (a wide one-row frame stacked to long format — no per-rule jobs, no
    second read of a 100 TB table); each ``unique`` rule adds one
    key-grouped aggregate, the unavoidable shuffle for exact uniqueness
    (swap to a digest compare when approximate suffices)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs: list[F.Column] = []
    meta: list[tuple[str, str]] = []  # (rule, col_name) per agg, in order
    uniques: list[list[str]] = []
    for r in rules:
        kind = r["rule"]
        if kind == "unique":
            uniques.append(list(r["columns"]))
            continue
        if kind == "not_null":
            bad = F.col(r["column"]).isNull()
            label = (kind, r["column"])
        elif kind == "in_range":
            c = F.col(r["column"])
            conds = []
            if "lo" in r:
                conds.append(c < F.lit(r["lo"]))
            if "hi" in r:
                conds.append(c > F.lit(r["hi"]))
            if not conds:
                raise ValueError("in_range needs lo and/or hi")
            bad = conds[0]
            for extra in conds[1:]:
                bad = bad | extra
            bad = c.isNotNull() & bad
            label = (kind, r["column"])
        elif kind == "in_set":
            c = F.col(r["column"])
            bad = c.isNotNull() & ~c.isin(list(r["values"]))
            label = (kind, r["column"])
        elif kind == "matches":
            c = F.col(r["column"])
            bad = c.isNotNull() & ~c.rlike(r["pattern"])
            label = (kind, r["column"])
        elif kind == "sql":
            # NULL predicate = violation: negate under coalesce
            bad = ~F.coalesce(F.expr(r["predicate"]), F.lit(False))
            label = (kind, r["name"])
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        i = len(meta)
        aggs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias(f"__v{i}")
        )
        meta.append(label)

    parts: list[DataFrame] = []
    if aggs:
        wide = df.agg(*aggs)

        def _q(s: str) -> str:  # SQL string literal (quotes doubled)
            return "'" + s.replace("'", "''") + "'"

        stack_args = ", ".join(
            f"{_q(rule)}, {_q(col)}, __v{i}"
            for i, (rule, col) in enumerate(meta)
        )
        parts.append(
            wide.select(
                F.expr(
                    f"stack({len(meta)}, {stack_args}) AS"
                    " (rule, col_name, violations)"
                )
            )
        )
    for cols in uniques:
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
                )
                .cast("bigint")
                .alias("violations")
            )
            .select(
                F.lit("unique").alias("rule"),
                F.lit(",".join(cols)).alias("col_name"),
                "violations",
            )
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)
