import datetime

from binlog_processer_spark.operators.asof import asof_join


def _t(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("a", _t(0), 1),   # before any checkpoint -> null
            ("a", _t(5), 2),   # exact tie with ckpt@5 -> inclusive
            ("a", _t(9), 3),   # between 5 and 10 -> ckpt@5
            ("a", _t(30), 4),  # long after 10 -> ckpt@10 (tolerance trims)
            ("b", _t(7), 5),   # key with no checkpoints -> null
        ],
        "k string, ts timestamp, seq int",
    )
    right = spark.createDataFrame(
        [("a", _t(5), 50), ("a", _t(10), 100)],
        "k string, ts timestamp, v int",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    got = {r.seq: (r.v, r.asof_ts) for r in out.collect()}
    assert got == {
        1: (None, None),
        2: (50, _t(5)),
        3: (50, _t(5)),
        4: (100, _t(10)),
        5: (None, None),
    }
    assert out.count() == left.count()  # never explodes or drops


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        tolerance_s=600,
    )
    got = {r.seq: r.v for r in out.collect()}
    # seq 4 matches ckpt@10 but lags 20 min > 10 min tolerance -> nulled
    assert got == {1: None, 2: 50, 3: 50, 4: None, 5: None}


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame(
        [("a", _t(6), 1)], "k string, ts timestamp, seq int"
    )
    right = spark.createDataFrame(
        [("a", _t(5), 7), ("a", _t(5), 9)],
        "k string, ts timestamp, v int",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    assert [r.v for r in out.collect()] == [9]  # greatest payload wins


def test_asof_single_shuffle_plan(spark):
    """The whole as-of is ONE hash exchange + sort — no join node at all.
    A regression to a join-then-window shape explodes left x right-history
    at 10^12 rows."""
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
