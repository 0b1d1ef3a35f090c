"""Round-4 late additions: quantile sketch (sketch.py
kmv_sample_quantiles), HLL rollup cube (sketch.py hll_rollup),
k-anonymity audit (privacy.py), dense daily timeline (aggregate.py
timeline_densify).

Oracle exactness is pinned by the four contract queries; these tests pin
what the oracle can't see — partition invariance of the sample pass,
the sample merge law (union + re-truncate), exhaustive-k exactness, the
register-merge consistency of the rollup levels, and the densify
zero-fill/forward-fill semantics on a hand-built gap corpus.
"""

import datetime

import pytest

from pyspark.sql import functions as F

from binlog_processer_spark.operators.aggregate import timeline_densify
from binlog_processer_spark.operators.privacy import k_anonymity_report
from binlog_processer_spark.operators.sketch import (
    hll_distinct,
    hll_rollup,
    kmv_sample_quantiles,
)

_KEPT_SCHEMA = (
    "source string, event_seq bigint, n_tok int, tokens array<int>, "
    "route string, database_name string, table_name string, op string, "
    "doc_id string, commit_ts timestamp"
)


def _kept_rows(n=300):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        src = f"s{i % 3}"
        rows.append(
            (
                src,
                i,
                (i * 7) % 97 + 1,
                [(i * 13 + j) % 500 for j in range(8)],
                f"db_{src}.t{i % 2}",
                f"db_{src}",
                f"t{i % 2}",
                ["Create", "Update", "Delete"][i % 3],
                str(i % 50),
                t0 + datetime.timedelta(minutes=(i * 31) % 5000),
            )
        )
    return rows


def _kept(spark, rows, parts=4):
    return spark.createDataFrame(rows, _KEPT_SCHEMA).repartition(parts)


def test_quantile_sample_partition_invariant(spark):
    rows = _kept_rows()
    a = kmv_sample_quantiles(_kept(spark, rows, parts=2), k=32).collect()
    b = kmv_sample_quantiles(_kept(spark, rows, parts=16), k=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_quantile_exhaustive_k_is_exact(spark):
    """k >= n makes the sample the whole data: est == exact at every q."""
    rows = _kept_rows(n=90)  # 30 rows per source < k
    out = kmv_sample_quantiles(
        _kept(spark, rows), k=128, qs=(25, 50, 95)
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r.k_used == r.n_rows
        for q in (25, 50, 95):
            assert r[f"q{q}_est"] == r[f"q{q}_exact"], r
            assert r[f"q{q}_abs_err"] == 0


def test_quantile_sample_merge_law(spark):
    """Bottom-k-by-hash samples merge like KMV: the union of two
    halves' samples, re-truncated to k, IS the whole corpus's sample —
    so the published sketch rows agree."""
    rows = _kept_rows()
    half1, half2 = rows[::2], rows[1::2]
    whole = kmv_sample_quantiles(
        _kept(spark, rows), k=32, with_exact=False
    ).collect()
    s1 = kmv_sample_quantiles(_kept(spark, half1), k=32, with_exact=False)
    s2 = kmv_sample_quantiles(_kept(spark, half2), k=32, with_exact=False)
    # the half sketches disagree with the whole individually...
    assert s1.collect() != whole or s2.collect() != whole
    # ...but the union corpus sketch equals re-sketching all rows
    merged = kmv_sample_quantiles(
        _kept(spark, half1 + half2), k=32, with_exact=False
    ).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, whole))


def test_quantile_validation(spark):
    df = _kept(spark, _kept_rows(10))
    with pytest.raises(ValueError):
        kmv_sample_quantiles(df, k=1)
    with pytest.raises(ValueError):
        kmv_sample_quantiles(df, qs=(0,))


def test_hll_rollup_levels_consistent(spark):
    """The global row must equal hll_distinct's estimate over a
    source-collapsed frame (register merge is associative), and every
    level's registers derive from the same corpus pass."""
    rows = _kept_rows()
    kept = _kept(spark, rows)
    out = hll_rollup(kept, b=8)
    rolled = {(r.level, r.key): r for r in out.collect()}
    # level cardinalities: 3 sources x 2 tables, 3 databases, 1 global
    assert sum(1 for lv, _ in rolled if lv == "table") == 6
    assert sum(1 for lv, _ in rolled if lv == "database") == 3
    assert sum(1 for lv, _ in rolled if lv == "global") == 1
    # global estimate == single-group HLL over the same tokens
    one = (
        hll_distinct(
            kept.select(F.lit("all").alias("source"), "tokens"),
            b=8,
            with_exact=False,
        )
        .collect()[0]
    )
    g = rolled[("global", "*")]
    assert g.est_distinct == one.est_distinct
    assert g.sum_scaled == one.sum_scaled
    # database estimate == single-group HLL over that database's tokens
    db = rolled[("database", "db_s0")]
    only = kept.filter(F.col("database_name") == "db_s0")
    one_db = (
        hll_distinct(
            only.select(F.lit("x").alias("source"), "tokens"),
            b=8,
            with_exact=False,
        )
        .collect()[0]
    )
    assert db.est_distinct == one_db.est_distinct


def test_k_anonymity_report_counts(spark):
    """Hand-built corpus: db A has one singleton class, db B is fully
    5-anonymous."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    # db A: 6 rows in one class + 1 singleton (different op)
    for i in range(6):
        rows.append(("s0", i, 5, [1], "A.t", "A", "t", "Create", "d", t0))
    rows.append(("s0", 99, 5, [1], "A.t", "A", "t", "Delete", "d", t0))
    # db B: two classes of 5 (different days)
    for i in range(5):
        rows.append(("s1", 200 + i, 5, [1], "B.t", "B", "t", "Create", "d", t0))
        rows.append(
            ("s1", 300 + i, 5, [1], "B.t", "B", "t", "Create", "d",
             t0 + datetime.timedelta(days=1))
        )
    out = {r.database_name: r for r in
           k_anonymity_report(_kept(spark, rows), k=5).collect()}
    a, b = out["A"], out["B"]
    assert (a.n_rows, a.n_classes, a.classes_below_k, a.rows_below_k) == (7, 2, 1, 1)
    assert a.min_class_size == 1
    assert a.risk_ppm == 142857  # floor(1e6 / 7)
    assert (b.n_rows, b.n_classes, b.classes_below_k, b.rows_below_k) == (10, 2, 0, 0)
    assert b.risk_ppm == 0


def test_k_anonymity_validation(spark):
    df = _kept(spark, _kept_rows(5))
    with pytest.raises(ValueError):
        k_anonymity_report(df, k=1)
    with pytest.raises(ValueError):
        k_anonymity_report(df, qids=("no_such_col",))


def test_timeline_densify_gap_semantics(spark):
    """A 3-day silence inside the span surfaces as zero-event days
    carrying the last watermark forward; days outside the span don't
    exist."""
    t = lambda d, h: datetime.datetime(2024, 5, d, h)
    rows = [
        ("s0", 1, 5, [1], "A.t", "A", "t", "Create", "d", t(1, 9)),
        ("s0", 2, 5, [1], "A.t", "A", "t", "Update", "d", t(1, 17)),
        ("s0", 3, 5, [1], "A.t", "A", "t", "Create", "d", t(5, 12)),
    ]
    out = timeline_densify(_kept(spark, rows)).collect()
    assert [r.day.isoformat() for r in out] == [
        "2024-05-0%d" % d for d in range(1, 6)
    ]
    assert [r.events for r in out] == [2, 0, 0, 0, 1]
    # watermark sticks at day-1's max through the silence
    assert [r.watermark_ts.hour for r in out] == [17, 17, 17, 17, 12]


def test_partition_splits_exhaustive_k_exact_and_invariant(spark):
    """k >= n makes the sample exhaustive: estimated splits equal the
    exact order statistics at every boundary; and the candidate pass is
    an exact pruning, so results are partition-invariant."""
    from binlog_processer_spark.operators.sketch import (
        partition_split_points,
    )

    rows = _kept_rows(n=100)
    a = partition_split_points(
        _kept(spark, rows, parts=2), n_partitions=4, k=512
    ).collect()
    b = partition_split_points(
        _kept(spark, rows, parts=16), n_partitions=4, k=512
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert r.k_used == r.n_rows
        assert r.est_split == r.exact_split and r.abs_err == 0
    assert [r.split_idx for r in sorted(a, key=lambda r: r.split_idx)] == [1, 2, 3]
    # splits are non-decreasing in the boundary index
    vals = [r.est_split for r in sorted(a, key=lambda r: r.split_idx)]
    assert vals == sorted(vals)


def test_partition_splits_validation(spark):
    from binlog_processer_spark.operators.sketch import (
        partition_split_points,
    )

    df = _kept(spark, _kept_rows(10))
    import pytest as _pt

    with _pt.raises(ValueError):
        partition_split_points(df, n_partitions=1)
    with _pt.raises(ValueError):
        partition_split_points(df, n_partitions=8, k=4)
