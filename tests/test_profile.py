"""Table profiler: per-column stats, key uniqueness, single-agg plans."""

import pytest

from binlog_processer_spark.operators.profile import (
    key_uniqueness,
    profile_columns,
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("a", 1, None),
            ("a", 2, 10),
            ("b", 2, 20),
            (None, 3, 20),
        ],
        "k string, v int, w int",
    )


def test_profile_columns_stats(spark):
    got = {r.col_name: r for r in profile_columns(_df(spark), ["k", "v", "w"]).collect()}
    assert set(got) == {"k", "v", "w"}
    k = got["k"]
    assert (k.n_rows, k.n_null, k.n_distinct, k.min_s, k.max_s) == (4, 1, 2, "a", "b")
    v = got["v"]
    assert (v.n_null, v.n_distinct, v.min_s, v.max_s) == (0, 3, "1", "3")
    w = got["w"]
    assert (w.n_null, w.n_distinct, w.min_s, w.max_s) == (1, 2, "10", "20")
    with pytest.raises(ValueError):
        profile_columns(_df(spark), [])
    with pytest.raises(ValueError):
        profile_columns(_df(spark), ["nope"])


def test_profile_is_one_aggregate_job(spark):
    """All per-column stats come out of ONE agg (Expand + partial
    aggregate) — a per-column job loop would rescan the corpus k times."""
    plan = (
        profile_columns(_df(spark), ["k", "v", "w"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one Expand feeding one aggregate chain; no join, no union of scans
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1, plan
    assert "Join" not in plan, plan


def test_key_uniqueness_pass_and_violation(spark):
    df = _df(spark)
    ok = key_uniqueness(df, ["k", "v"]).collect()[0]
    assert (ok.n_rows, ok.n_keys, ok.dup_rows) == (4, 4, 0)
    dup = df.union(df.limit(1))
    bad = key_uniqueness(dup, ["k", "v"]).collect()[0]
    assert (bad.n_rows, bad.n_keys, bad.dup_rows) == (5, 4, 1)
    with pytest.raises(ValueError):
        key_uniqueness(df, [])


def test_expectations_rules_and_null_semantics(spark):
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from binlog_processer_spark.operators.profile import expectations

    df = spark.createDataFrame(
        [
            (1, "en", 10, "a-1"),
            (2, "xx", -5, "b2"),       # in_set + in_range + matches fail
            (3, None, None, None),     # NULLs pass range/set/matches
            (3, "en", 10, "a-3"),      # duplicate key 3
        ],
        "id long, lang string, n int, code string",
    )
    rep = {
        (r.rule, r.col_name): (r.violations, r.passed)
        for r in expectations(
            df,
            [
                {"rule": "not_null", "column": "lang"},
                {"rule": "in_range", "column": "n", "lo": 0},
                {"rule": "in_set", "column": "lang", "values": ["en"]},
                {"rule": "matches", "column": "code",
                 "pattern": "^[a-z]-[0-9]$"},
                {"rule": "sql", "name": "n_matches_id",
                 "predicate": "n = id * 10"},
                {"rule": "unique", "columns": ["id"]},
            ],
        ).collect()
    }
    assert rep[("not_null", "lang")] == (1, False)
    assert rep[("in_range", "n")] == (1, False)      # NULL n passes
    assert rep[("in_set", "lang")] == (1, False)     # NULL lang passes
    assert rep[("matches", "code")] == (1, False)    # 'b2' only
    # NULL predicate counts as violation: rows 2 (false) + 3 (null) + 4?
    # row 4: n=10, id=3 -> 10 != 30 -> violation. rows: 2,3,4 = 3
    assert rep[("sql", "n_matches_id")] == (3, False)
    assert rep[("unique", "id")] == (2, False)       # both rows of key 3

    clean = expectations(
        df.filter("id = 1"), [{"rule": "not_null", "column": "lang"}]
    ).collect()
    assert clean[0].passed is True

    with pytest.raises(ValueError):
        expectations(df, [])
    with pytest.raises(ValueError):
        expectations(df, [{"rule": "nope", "column": "id"}])
    with pytest.raises(ValueError):
        expectations(df, [{"rule": "in_range", "column": "n"}])


def test_expectations_quotes_in_rule_names(spark):
    from binlog_processer_spark.operators.profile import expectations

    df = spark.createDataFrame([(1,)], "n long")
    rep = expectations(
        df, [{"rule": "sql", "name": "can't be negative",
              "predicate": "n >= 0"}]
    ).collect()
    assert rep[0].col_name == "can't be negative" and rep[0].passed
