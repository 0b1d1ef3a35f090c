import datetime

from binlog_processer_spark.operators.scd2 import as_of_state, scd2_history


def _t(minute):
    return datetime.datetime(2024, 1, 1, 10, minute)


def _events(spark):
    rows = [
        ("db", "t", "A", 1, "Create", _t(1)),
        ("db", "t", "A", 3, "Update", _t(3)),
        ("db", "t", "A", 5, "Delete", _t(5)),
        ("db", "t", "A", 7, "Create", _t(7)),
        ("db", "t", "B", 2, "Create", _t(2)),
    ]
    return spark.createDataFrame(
        rows,
        "database_name string, table_name string, doc_id string,"
        " event_seq long, op string, commit_ts timestamp",
    )


def test_scd2_versions(spark):
    hist = scd2_history(_events(spark))
    got = sorted(
        (r.doc_id, r.event_seq, r.valid_from, r.valid_to, r.is_current)
        for r in hist.collect()
    )
    assert got == [
        ("A", 1, _t(1), _t(3), False),
        ("A", 3, _t(3), _t(5), False),   # closed by the Delete
        ("A", 7, _t(7), None, True),     # re-created, open
        ("B", 2, _t(2), None, True),
    ]


def test_scd2_point_in_time(spark):
    hist = scd2_history(_events(spark))
    at4 = {(r.doc_id, r.event_seq) for r in as_of_state(hist, _t(4)).collect()}
    assert at4 == {("A", 3), ("B", 2)}
    at6 = {(r.doc_id, r.event_seq) for r in as_of_state(hist, _t(6)).collect()}
    assert at6 == {("B", 2)}  # A deleted at t5, not yet re-created
    at1 = {(r.doc_id, r.event_seq) for r in as_of_state(hist, _t(1)).collect()}
    assert at1 == {("A", 1)}  # inclusive at valid_from


def test_scd2_single_shuffle(spark):
    plan = (
        scd2_history(_events(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
