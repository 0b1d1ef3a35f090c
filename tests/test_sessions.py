"""Gap-based sessionization: relational (lag+cumsum) and native
session_window paths must agree boundary-exactly."""

from datetime import datetime

from pyspark.sql import functions as F

from binlog_processer_spark.operators.sessions import (
    session_stats,
    session_window_agg,
    sessionize,
)


def _events(spark):
    # one key, events at minutes 0, 10, 20, 80, 140(=80+60 exactly), 300
    # with a 60-minute gap: sessions [0..140], [300] — Spark's
    # session_window merges touching windows, so events at exactly
    # last+gap (80 after 20, 140 after 80) EXTEND the session; only the
    # 160-minute silence before 300 breaks it
    rows = [
        (1, i, datetime(2024, 1, 1, m // 60, m % 60))
        for i, m in enumerate([0, 10, 20, 80, 140, 300])
    ]
    return spark.createDataFrame(
        rows, "doc_id long, event_seq long, commit_ts timestamp"
    )


def test_sessionize_boundary_exact(spark):
    out = sessionize(_events(spark), gap_minutes=60, keys=["doc_id"])
    got = {r.event_seq: r.session_id for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 1}


def test_relational_and_native_paths_agree(spark):
    ev = _events(spark)
    rel = session_stats(ev, gap_minutes=60, keys=["doc_id"]).select(
        "doc_id", "n_events", "session_start", "session_end"
    )
    nat = session_window_agg(ev, gap_minutes=60, keys=["doc_id"])
    assert sorted(map(tuple, rel.collect())) == sorted(
        map(tuple, nat.collect())
    )


def test_session_stats_rollup(spark):
    out = {
        r.session_id: r
        for r in session_stats(
            _events(spark), gap_minutes=60, keys=["doc_id"]
        ).collect()
    }
    assert out[0].n_events == 5 and out[0].duration_s == 140 * 60
    assert out[1].n_events == 1 and out[1].duration_s == 0
    assert len(out) == 2


def test_one_shuffle_per_sessionization(spark):
    plan = (
        session_stats(_events(spark), gap_minutes=60, keys=["doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange moves each key's events once; the groupBy reuses the
    # window's hash partitioning instead of shuffling again
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_conversion_orders_steps(spark):
    from datetime import datetime as dt

    from binlog_processer_spark.operators.sessions import funnel_conversion

    def t(m):
        return dt(2024, 1, 1, 0, m)

    rows = [
        # u1 completes A->B->C in order
        (1, t(0), "A"), (1, t(1), "B"), (1, t(2), "C"),
        # u2 does B before A: reaches A only (B never strictly after A)
        (2, t(0), "B"), (2, t(1), "A"),
        # u3 does A then C (skips B): reaches A only
        (3, t(0), "A"), (3, t(5), "C"),
        # u4 never does A: contributes nothing
        (4, t(0), "B"), (4, t(1), "C"),
    ]
    e = spark.createDataFrame(
        [(u, ts, ty) for u, ts, ty in rows],
        "user_id long, ts timestamp, event_type string",
    )
    out = {r.step: r for r in funnel_conversion(e, ["A", "B", "C"]).collect()}
    assert out["A"].users_reached == 3 and out["A"].conversion_bp == 10000
    assert out["B"].users_reached == 1
    assert out["C"].users_reached == 1
    assert out["C"].conversion_bp == 3333
    import pytest

    with pytest.raises(ValueError):
        funnel_conversion(e, ["A"])


def test_retention_cohorts_day0_full(spark):
    from datetime import datetime as dt

    from binlog_processer_spark.operators.sessions import retention_cohorts

    e = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 10), "x"),
            (1, dt(2024, 1, 3, 10), "x"),   # day-2 return
            (2, dt(2024, 1, 1, 11), "x"),
            (3, dt(2024, 1, 2, 9), "x"),
            (3, dt(2024, 1, 2, 23), "x"),   # same-day dup: one active row
        ],
        "user_id long, ts timestamp, event_type string",
    )
    out = {
        (str(r.cohort_day), r.day_offset): r
        for r in retention_cohorts(e).collect()
    }
    d0 = out[("2024-01-01", 0)]
    assert d0.active_users == 2 and d0.retention_bp == 10000
    assert out[("2024-01-01", 2)].active_users == 1
    assert out[("2024-01-01", 2)].retention_bp == 5000
    d1 = out[("2024-01-02", 0)]
    assert d1.active_users == 1 and d1.cohort_users == 1
