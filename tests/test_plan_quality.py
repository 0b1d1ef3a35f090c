"""Physical-plan quality guards (SURVEY.md §4 scale posture).

These tests pin the plan shapes that make the engine viable at 10^12 rows:
broadcast (never sort-merge) dimension joins, parquet column pruning +
filter pushdown, and a single fact-side shuffle in the routed-write plan.
A regression here usually means a silent 10-100x cost at scale even though
results stay correct.
"""

from pyspark.sql import functions as F

from binlog_processer_spark.operators.enrich import enrich_routing
from binlog_processer_spark.operators.route import route
from binlog_processer_spark.sources.generator import generate_corpus, routing_dim


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark):
    return generate_corpus(spark, 500, partitions=2)


def test_routing_join_is_broadcast(spark):
    plan = _plan(enrich_routing(_events(spark), routing_dim(spark)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_routed_plan_no_sort_merge_join(spark):
    routed, _ = route(enrich_routing(_events(spark), routing_dim(spark)))
    plan = _plan(routed)
    # soft-delete timeline + routing dim are both broadcast
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_routed_write_plan_single_fact_shuffle(spark):
    routed, _ = route(
        enrich_routing(_events(spark), routing_dim(spark)),
        cluster_for_write=True,
    )
    plan = _plan(routed.select("tree", "database_name", "img"))
    # shuffles: one for the write clustering (fact) + one tiny one building
    # the sign timeline; the fan-out/envelope/filters add none
    fact_shuffles = plan.count("Exchange hashpartitioning")
    assert fact_shuffles <= 2, plan
    assert "Exchange rangepartitioning" not in plan


def test_parquet_column_pruning(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    plan = _plan(df)
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan


def test_parquet_filter_pushdown(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_id") > 100
    )
    plan = _plan(df)
    assert "GreaterThan(event_id,100)" in plan, plan
