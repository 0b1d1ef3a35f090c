"""plans/iostat.py: measured stage-metric deltas attribute per query.

The value of the bench's query_io block rests on two properties checked
here against live Spark: (1) a map-only job shows ZERO shuffle bytes —
so nonzero shuffle in the bench output is real, not accounting noise;
(2) a groupBy shows shuffle_write == shuffle_read > 0 (one Exchange,
fully consumed) and input bytes from the scan — and sequential deltas
don't bleed between queries.
"""


import pytest

from binlog_processer_spark.plans import iostat


@pytest.fixture(scope="module")
def parquet_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("iostat") / "t.parquet")
    spark.range(200_000).selectExpr(
        "id", "id % 97 as k", "cast(id as string) as s"
    ).write.mode("overwrite").parquet(p)
    return p


def test_map_only_job_shuffles_nothing(spark, parquet_path):
    pre = iostat.stage_totals(spark)
    spark.read.parquet(parquet_path).selectExpr("k + 1 as k1").write.format(
        "noop"
    ).mode("overwrite").save()
    d = iostat.delta(pre, iostat.stage_totals(spark))
    assert d["shuffle_read_b"] == d["shuffle_write_b"] == 0
    assert d["input_b"] > 0  # the scan is visible
    assert d["task_ms"] >= 0


def test_groupby_shuffle_is_symmetric_and_attributed(spark, parquet_path):
    pre = iostat.stage_totals(spark)
    spark.read.parquet(parquet_path).groupBy("k").count().write.format(
        "noop"
    ).mode("overwrite").save()
    d = iostat.delta(pre, iostat.stage_totals(spark))
    # one Exchange: everything written is read back, and 97 groups of a
    # pre-aggregated count are tiny next to the 200k-row scan
    assert d["shuffle_write_b"] > 0
    assert d["shuffle_read_b"] == d["shuffle_write_b"]
    assert d["shuffle_write_b"] < d["input_b"]

    # a following query starts from a clean delta (serial attribution)
    pre2 = iostat.stage_totals(spark)
    spark.read.parquet(parquet_path).selectExpr("id").write.format(
        "noop"
    ).mode("overwrite").save()
    d2 = iostat.delta(pre2, iostat.stage_totals(spark))
    assert d2["shuffle_read_b"] == d2["shuffle_write_b"] == 0


def test_to_mb_shapes_the_emission():
    io = {
        "shuffle_read_b": 1_500_000,
        "shuffle_write_b": 0,
        "input_b": 2_000_000,
        "output_b": 0,
        "task_ms": 1234,
        "cpu_ms": 1000,
        "mem_spill_b": 3_000_000,
        "disk_spill_b": 0,
    }
    mb = iostat.to_mb(io)
    assert mb == {
        "shuffle_read_mb": 1.5,
        "shuffle_write_mb": 0.0,
        "input_mb": 2.0,
        "output_mb": 0.0,
        "task_sec": 1.23,
        "cpu_sec": 1.0,
        "mem_spill_mb": 3.0,
        "disk_spill_mb": 0.0,
    }


def test_map_side_combine_shrinks_shuffle_volume(spark, parquet_path):
    """The claim query_io exists to audit: a partial-aggregated groupBy
    moves orders of magnitude fewer bytes than a raw repartition of the
    same rows. 97 distinct keys × 32 partitions of partial counts vs
    200k rows of (id, k, s) on the wire."""
    pre = iostat.stage_totals(spark)
    spark.read.parquet(parquet_path).groupBy("k").count().write.format(
        "noop"
    ).mode("overwrite").save()
    agg = iostat.delta(pre, iostat.stage_totals(spark))["shuffle_write_b"]

    pre = iostat.stage_totals(spark)
    spark.read.parquet(parquet_path).repartition("k").write.format(
        "noop"
    ).mode("overwrite").save()
    raw = iostat.delta(pre, iostat.stage_totals(spark))["shuffle_write_b"]
    assert 0 < agg < raw / 100
