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


def test_reconcile_is_single_join(spark):
    """The four probe classes ride ONE join (operators/verify.py): a
    regression back to per-class joins re-shuffles the final-state relation
    4x at 10^12 rows."""
    from binlog_processer_spark.operators.aggregate import final_state
    from binlog_processer_spark.operators.verify import reconcile

    ev = enrich_routing(_events(spark), routing_dim(spark))
    fs = final_state(ev)
    replica = fs.filter(F.col("final_op") != "Delete").select(
        "database_name", "table_name", "doc_id",
        F.col("final_ts").alias("replica_ts"),
        F.col("final_tokens").alias("replica_tokens"),
    )
    plan = _plan(reconcile(None, replica, fs=fs))
    # exactly one outer (probe) join; upstream dimension joins are broadcast
    # inner joins and don't count
    assert plan.count("LeftOuter") == 1, plan
    assert "Union" not in plan, plan


def test_lsh_signature_is_codegen(spark):
    """Sign-LSH signatures are pure expressions — no Python eval, no
    shuffle before the band join."""
    from binlog_processer_spark.operators.similarity import (
        sign_signature_expr,
    )

    emb = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), i ->"
            " cast(pmod(hash(id, i), 100) as float) / 100.0F)"
        ).alias("embedding"),
    )
    plan = _plan(emb.withColumn("sig", sign_signature_expr(16, dim=8)))
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_ivf_assignment_no_exchange(spark):
    """IVF nearest-centroid assignment is a literal-centroid codegen argmax —
    no broadcast ×k explode, no per-vector window: a regression re-shuffles
    n×k embedding payloads at 10^9 vectors."""
    from binlog_processer_spark.operators.similarity import (
        ivf_assignments,
        ivf_centroids,
    )

    emb = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), i ->"
            " cast(pmod(hash(id, i), 100) as float) / 100.0F)"
        ).alias("embedding"),
    )
    plan = _plan(ivf_assignments(emb, ivf_centroids(emb, 4)))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Join" not in plan, plan


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


def test_heavy_hitter_candidate_pass_has_no_shuffle(spark):
    # the Misra-Gries candidate stage must scan -> mapInArrow with no
    # Exchange: its whole point is pruning the explode+aggregate shuffle
    from binlog_processer_spark.operators.tokens import _mg_candidates

    df = spark.createDataFrame(
        [("a", [1, 2, 3])], "source string, tokens array<int>"
    )
    cand = df.select("tokens").mapInArrow(_mg_candidates(64), "token int")
    plan = _plan(cand)
    assert "Exchange" not in plan, plan


def test_drift_single_fact_aggregate(spark):
    # everything after the first groupBy operates on the bounded
    # histogram; the fact relation must be aggregated exactly once
    from binlog_processer_spark.operators.drift import distribution_drift

    df = spark.createDataFrame(
        [("a", 4), ("b", 8)], "source string, n_tok int"
    )
    plan = _plan(distribution_drift(df))
    assert plan.count("Scan ExistingRDD") <= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_bucket_digest_plan_partial_aggregates_before_the_exchange(spark):
    """The anti-entropy digest pass must combine map-side: the one shuffle
    carries at most n_buckets rows per task, never the table. A regression
    to a final-only aggregate re-shuffles every row (with its 60-bit hash)
    at 10^12 rows — the exact cost the digest exchange exists to avoid."""
    from binlog_processer_spark.operators.antientropy import bucket_digests

    ev = _events(spark).select("doc_id", "event_seq")
    plan = _plan(bucket_digests(ev, ["doc_id"], ["event_seq"], 64))
    # partial + final HashAggregate pair around exactly one exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.count("Exchange") == 1, plan
    assert "SortAggregate" not in plan


def test_antientropy_drilldown_never_joins_outside_suspect_buckets(spark):
    """The drill-down reconcile's inputs are bucket-filtered BEFORE the
    join: the filter must sit under the join in the plan (scan-side),
    not above it — otherwise the full tables shuffle anyway."""
    from binlog_processer_spark.operators.aggregate import final_state
    from binlog_processer_spark.operators.antientropy import bucket_id

    ev = enrich_routing(_events(spark), routing_dim(spark))
    fs = final_state(ev)
    keys = ["database_name", "table_name", "doc_id"]
    filtered = fs.filter(bucket_id(keys, 64).isin([1, 2, 3]))
    plan = _plan(filtered)
    assert "Filter" in plan and "pmod" in plan, plan


def test_kmv_candidate_pass_zero_shuffle(spark):
    """The KMV bottom-k candidate pass must stay map-only up to
    mapInArrow: a pre-distinct or repartition before it would shuffle
    the full token stream the sketch exists to avoid."""
    from binlog_processer_spark.operators.sketch import (
        _bottom_k_candidates,
        hash32,
    )

    ev = _events(spark).select(
        "source", F.explode("tokens").alias("token")
    ).select("source", hash32(F.col("token")).alias("h"))
    cand = ev.mapInArrow(
        _bottom_k_candidates(64), schema="source string, h bigint"
    )
    plan = _plan(cand)
    assert "Exchange" not in plan, plan


def test_hll_registers_single_exchange(spark):
    """HLL register fold: exactly ONE hash-partitioned exchange (the
    register aggregate, bounded at m rows/source/task by the map-side
    partial max) — no pre-distinct of the token stream."""
    from binlog_processer_spark.operators.sketch import hll_registers

    plan = _plan(hll_registers(_events(spark), b=8))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_quantile_sample_candidate_pass_zero_shuffle(spark):
    """The bottom-k-rows sample pass (kmv_sample_quantiles) must stay
    map-only up to mapInArrow — only numPartitions x k candidate rows
    may cross the wire."""
    from binlog_processer_spark.operators.sketch import (
        _bottom_k_rows,
        hash32,
    )

    ev = _events(spark).select(
        "source",
        hash32(F.col("event_seq")).alias("h"),
        F.col("event_seq").alias("seq"),
        F.col("n_tok").cast("bigint").alias("val"),
    )
    cand = ev.mapInArrow(
        _bottom_k_rows(64),
        schema="source string, h bigint, seq bigint, val bigint",
    )
    plan = _plan(cand)
    assert "Exchange" not in plan, plan


def test_k_anonymity_two_aggregates(spark):
    """k-anonymity = rows -> classes -> report: exactly two
    hash-partitioned exchanges, both map-side combined; no joins, no
    windows (a window here would sort the full release)."""
    from binlog_processer_spark.operators.privacy import k_anonymity_report
    from binlog_processer_spark.sources.generator import routing_dim

    kept = enrich_routing(_events(spark), routing_dim(spark))
    plan = _plan(k_anonymity_report(kept, k=5))
    # the routing broadcast exchange is not hash-partitioned; only the
    # two aggregate shuffles are
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Window" not in plan, plan


def test_timeline_densify_calendar_join_is_broadcast(spark):
    """The calendar relation is |sinks| x |days| (metadata-scale): it
    must broadcast back onto the daily aggregate, never sort-merge."""
    from binlog_processer_spark.operators.aggregate import timeline_densify
    from binlog_processer_spark.sources.generator import routing_dim

    kept = enrich_routing(_events(spark), routing_dim(spark))
    plan = _plan(timeline_densify(kept))
    assert "SortMergeJoin" not in plan, plan


def test_pivot_single_aggregate(spark):
    """The closed-vocabulary pivot must be ONE hash aggregate (no extra
    distinct-values job, no second shuffle)."""
    from binlog_processer_spark.operators.aggregate import sink_op_pivot
    from binlog_processer_spark.sources.generator import routing_dim

    kept = enrich_routing(_events(spark), routing_dim(spark))
    plan = _plan(sink_op_pivot(kept))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_rollup_is_one_expand_aggregate(spark):
    """ROLLUP plans as a single Expand + aggregate — three grouping
    levels must NOT become three scans."""
    from binlog_processer_spark.operators.aggregate import (
        sink_counts_rollup,
    )
    from binlog_processer_spark.sources.generator import routing_dim

    kept = enrich_routing(_events(spark), routing_dim(spark))
    plan = _plan(sink_counts_rollup(kept))
    assert "Expand" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
