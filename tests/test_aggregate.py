"""Aggregate semantics vs an independent pandas oracle + the cancellation
law property (AvroDataReader.java:128-135: create∖update∖delete ≡
last-op-wins)."""

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from binlog_processer_spark.operators import aggregate as agg
from binlog_processer_spark.operators.skew import salted_sink_counts

TS = datetime.datetime(2024, 1, 2)
EV_SCHEMA = (
    "tree string, db_instance string, database_name string, table_name string,"
    " part_date date, op string, doc_id string, event_seq bigint,"
    " commit_ts timestamp, tokens array<int>, file_id string"
)


def _routed(spark, n=200):
    rows = []
    for i in range(n):
        for tree in ("create", "update"):
            rows.append(
                (
                    tree,
                    f"inst{i % 2}",
                    f"db{i % 3}",
                    f"t{i % 2}",
                    datetime.date(2024, 1, 1 + i % 4),
                    ["Create", "Update", "Delete"][i % 3],
                    str(i % 50),
                    i,
                    TS + datetime.timedelta(minutes=i),
                    [i % 7],
                    f"f{i % 5}",
                )
            )
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_sink_counts_vs_pandas_oracle(spark):
    df = _routed(spark)
    got = agg.sink_counts(df).toPandas()
    pdf = df.toPandas()
    oracle = (
        pdf.assign(
            insert_cnt=(pdf.op == "Create").astype(int),
            update_cnt=(pdf.op == "Update").astype(int),
            delete_cnt=(pdf.op == "Delete").astype(int),
        )
        .groupby(
            ["tree", "db_instance", "database_name", "table_name", "part_date"],
            as_index=False,
        )[["insert_cnt", "update_cnt", "delete_cnt"]]
        .sum()
    )
    key = ["tree", "db_instance", "database_name", "table_name", "part_date"]
    got = got.sort_values(key).reset_index(drop=True)
    oracle = oracle.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"part_date": str}), oracle.astype({"part_date": str}),
        check_dtype=False,
    )


def test_salted_equals_plain(spark):
    df = _routed(spark)
    keys = ["tree", "db_instance", "database_name", "table_name", "part_date"]
    plain = {tuple(r[k] for k in keys): (r.insert_cnt, r.update_cnt, r.delete_cnt)
             for r in agg.sink_counts(df).collect()}
    salted = {tuple(r[k] for k in keys): (r.insert_cnt, r.update_cnt, r.delete_cnt)
              for r in salted_sink_counts(df, keys).collect()}
    assert plain == salted


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.sampled_from(["Create", "Update", "Delete"]), min_size=1, max_size=12
    )
)
def test_cancellation_law_property(spark, ops):
    """Random per-id op sequences: final_state's op == last op in file order
    (the HashMap-overwrite + cross-op cancellation collapse)."""
    rows = [
        ("db", "t", str(0), i, op, TS + datetime.timedelta(minutes=i), [i])
        for i, op in enumerate(ops)
    ]
    df = spark.createDataFrame(
        rows,
        "database_name string, table_name string, doc_id string,"
        " event_seq bigint, op string, commit_ts timestamp, tokens array<int>",
    )
    fs = agg.final_state(df).collect()
    assert len(fs) == 1
    assert fs[0].final_op == ops[-1]
    assert fs[0].final_seq == len(ops) - 1
    assert list(fs[0].final_tokens) == [len(ops) - 1]


def test_gap_detection(spark):
    files = spark.createDataFrame(
        [("d", 1), ("d", 2), ("d", 5), ("d", 9), ("e", 3), ("e", 4)],
        "dir string, file_num bigint",
    )
    gaps = {(r.dir, r.gap_start, r.gap_end) for r in agg.file_gap_detection(files).collect()}
    assert gaps == {("d", 3, 4), ("d", 6, 8)}


def test_watermarks_and_histogram(spark):
    df = _routed(spark, n=50)
    wm = {(r.database_name, r.table_name): r.max_commit_ts for r in agg.watermarks(df).collect()}
    pdf = df.toPandas()
    oracle = pdf.groupby(["database_name", "table_name"])["commit_ts"].max()
    for k, v in wm.items():
        assert v == oracle[k]
    hist = agg.windowed_histogram(df).toPandas()
    assert (hist.insert_cnt + hist.update_cnt + hist.delete_cnt).sum() == len(pdf)


def test_ingestion_lag_buckets_and_mean(spark):
    from datetime import datetime as dt

    from binlog_processer_spark.operators.aggregate import ingestion_lag

    base = dt(2024, 1, 2, 0, 0, 0)

    def ev(lag_s):
        return ("db1", "t1", dt.fromtimestamp(base.timestamp() + lag_s), base)

    d = spark.createDataFrame(
        [ev(10), ev(59), ev(60), ev(7200), ev(100000), ev(-5)],
        "database_name string, table_name string,"
        " commit_ts timestamp, create_ts timestamp",
    )
    r = ingestion_lag(d).collect()[0]
    # buckets: <1m counts negatives too; boundaries are half-open
    assert (r.lt_1m, r.lt_1h, r.lt_1d, r.ge_1d) == (3, 1, 1, 1)
    assert r.n == 6 and r.max_lag_s == 100000
    assert r.mean_lag_s == (10 + 59 + 60 + 7200 + 100000 - 5) // 6


def test_key_skew_report_ranks_and_shares(spark):
    import pytest

    from binlog_processer_spark.operators.skew import key_skew_report

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_report(df, ["k"], top=2).collect()
    assert [(r.k, r.cnt, r.share_ppm, r.rank) for r in got] == [
        ("hot", 6, 600000, 1),
        ("warm", 3, 300000, 2),
    ]
    # tie broken by key ascending, deterministically
    df2 = spark.createDataFrame([("b",), ("a",)], "k string")
    got = key_skew_report(df2, ["k"], top=2).collect()
    assert [(r.k, r.rank) for r in got] == [("a", 1), ("b", 2)]
    with pytest.raises(ValueError):
        key_skew_report(df, [], top=2)
    with pytest.raises(ValueError):
        key_skew_report(df, ["k"], top=0)


def test_key_skew_report_topk_not_full_sort(spark):
    from binlog_processer_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [("k%d" % (i % 50),) for i in range(500)], "k string"
    ).repartition(8)
    plan = (
        key_skew_report(df, ["k"], top=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_merge_counts_ivm_algebra(spark):
    """base ⊕ delta == recompute, including keys only in one side and
    negative (retraction) deltas."""
    from binlog_processer_spark.operators.aggregate import merge_counts

    schema = "database_name string, table_name string, insert_cnt long, update_cnt long, delete_cnt long"
    base = spark.createDataFrame(
        [("db", "t1", 5, 2, 1), ("db", "t2", 3, 0, 0)], schema
    )
    delta = spark.createDataFrame(
        [("db", "t1", 1, 0, 4), ("db", "t3", 7, 7, 7),
         ("db", "t2", -3, 0, 0)],  # retraction zeroes t2 inserts
        schema,
    )
    got = {
        (r.database_name, r.table_name): (r.insert_cnt, r.update_cnt, r.delete_cnt)
        for r in merge_counts(
            base, delta, keys=["database_name", "table_name"]
        ).collect()
    }
    assert got == {
        ("db", "t1"): (6, 2, 5),
        ("db", "t2"): (0, 0, 0),
        ("db", "t3"): (7, 7, 7),
    }
