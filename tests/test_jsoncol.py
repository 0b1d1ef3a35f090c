"""Schema-on-read JSON extraction: typed fields, quarantine lane, and
the per-type rollup (functions/jsoncol.py)."""

from pyspark.sql import functions as F

from binlog_processer_spark.functions.jsoncol import extract_props, props_stats


def _e(spark):
    return spark.createDataFrame(
        [
            (1, "a", '{"k": 5, "extra": true}'),
            (2, "a", '{}'),
            (3, "a", '{not json'),
            (4, "b", None),
            (5, "b", '{"k": -7}'),
        ],
        "event_id long, event_type string, props string",
    )


def test_extract_props_typed_and_quarantined(spark):
    out = {r.event_id: r for r in extract_props(_e(spark), {"k": "int"}).collect()}
    assert out[1].k == 5 and out[1].props_ok
    assert out[2].k is None and out[2].props_ok      # valid JSON, field absent
    assert out[3].k is None and not out[3].props_ok  # malformed -> quarantine
    assert out[4].k is None and not out[4].props_ok  # NULL payload
    assert out[5].k == -7
    import pytest

    with pytest.raises(ValueError):
        extract_props(_e(spark), {})


def test_props_stats_rollup_and_plan(spark):
    out = {r.event_type: r for r in props_stats(_e(spark), "k", "int").collect()}
    a, b = out["a"], out["b"]
    assert (a.n, a.n_bad, a.n_null, a.k_sum) == (3, 1, 1, 5)
    assert (b.n, b.n_bad, b.k_sum, b.k_min) == (2, 1, -7, -7)
    # one extraction pass + one hash aggregate: a single Exchange
    plan = (
        props_stats(_e(spark), "k", "int")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_extract_props_rejects_column_collisions(spark):
    import pytest

    from binlog_processer_spark.functions.jsoncol import extract_props

    e = spark.createDataFrame(
        [(1, "a", '{"k": 1}')],
        "event_id long, event_type string, props string",
    )
    with pytest.raises(ValueError, match="collide"):
        extract_props(e, {"event_type": "string"})
    with pytest.raises(ValueError, match="collide"):
        extract_props(e, {"props_ok": "boolean"})
