"""Distribution drift (histogram + JSD) and exact percentile rollups."""

import math

from binlog_processer_spark.operators.aggregate import sink_token_percentiles
from binlog_processer_spark.operators.drift import (
    distribution_drift,
    token_length_histogram,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, n_tok int")


def test_histogram_buckets_and_clamp(spark):
    df = _df(spark, [("a", 0), ("a", 3), ("a", 4), ("a", 999)])
    got = {
        (r.source, r.bucket): r.cnt
        for r in token_length_histogram(df).collect()
    }
    # width 4: 0 and 3 share bucket 0, 4 opens bucket 1, 999 clamps to 31
    assert got == {("a", 0): 2, ("a", 1): 1, ("a", 31): 1}


def test_jsd_zero_for_identical_distributions(spark):
    rows = [(s, n) for s in ("a", "b") for n in (4, 4, 8, 12)]
    out = distribution_drift(_df(spark, rows)).collect()
    assert {r.jsd_ppm for r in out} == {0}


def test_jsd_ln2_for_disjoint_distributions(spark):
    # a lives entirely in bucket 0, b entirely in bucket 5 — no overlap,
    # so each source's JSD vs its complement is exactly ln 2
    rows = [("a", 1)] * 3 + [("b", 20)] * 5
    out = {r.source: r.jsd_ppm for r in distribution_drift(_df(spark, rows)).collect()}
    expect = round(math.log(2) * 1_000_000)
    assert out == {"a": expect, "b": expect}


def test_jsd_detects_partial_shift(spark):
    # c shares half its mass with the pool: 0 < JSD < ln 2
    rows = [("c", 1), ("c", 20), ("d", 20), ("d", 20), ("d", 21)]
    out = {r.source: r.jsd_ppm for r in distribution_drift(_df(spark, rows)).collect()}
    assert 0 < out["c"] < round(math.log(2) * 1_000_000)


def test_percentiles_interpolated_exact(spark):
    df = spark.createDataFrame(
        [("db", "t", n) for n in range(1, 101)],
        "database_name string, table_name string, n_tok int",
    )
    r = sink_token_percentiles(df).collect()[0]
    # continuous quantile over 1..100: p = 1 + q*99
    assert (r.p50_c, r.p95_c, r.p99_c) == (5050, 9505, 9901)


def test_rate_anomalies_exact_sigma_flags(spark):
    from datetime import datetime as dt

    from binlog_processer_spark.operators.drift import rate_anomalies

    rows = []
    # source 'a': 10 events/day for 9 days, then a 100-event burst
    for d in range(9):
        rows += [("a", dt(2024, 1, 1 + d, h % 24)) for h in range(10)]
    rows += [("a", dt(2024, 1, 10, h % 24)) for h in range(100)]
    # source 'b': flat 5/day — nothing flagged (zero variance days equal)
    for d in range(10):
        rows += [("b", dt(2024, 1, 1 + d, h % 24)) for h in range(5)]
    e = spark.createDataFrame(rows, "source string, commit_ts timestamp")
    out = {
        (r.source, str(r.day)[:10]): r.is_anomaly
        for r in rate_anomalies(e).collect()
    }
    assert out[("a", "2024-01-10")] is True
    assert not any(
        v for (s, d), v in out.items() if not (s == "a" and d == "2024-01-10")
    )


def test_psi_zero_on_identical_distributions(spark):
    from binlog_processer_spark.operators.drift import psi_drift

    rows = [(s, (i * 4) % 100) for s in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "source string, n_tok int")
    out = {r.source: r.psi_ppm for r in psi_drift(df).collect()}
    assert out == {"a": 0, "b": 0}


def test_psi_flags_shifted_source(spark):
    """A source whose mass lives in buckets the complement never touches
    must blow past the classic 0.25 alert bar (250000 ppm); JSD on the
    same data saturates at ln 2 — PSI keeps growing, which is why
    monitoring teams use it."""
    from binlog_processer_spark.operators.drift import psi_drift

    rows = [("base", 5) for _ in range(300)] + [("shift", 120)] * 300
    df = spark.createDataFrame(rows, "source string, n_tok int")
    out = {r.source: r.psi_ppm for r in psi_drift(df).collect()}
    assert out["shift"] > 250_000
    assert out["base"] > 250_000  # symmetric complement view
