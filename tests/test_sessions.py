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
