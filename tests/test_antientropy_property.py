"""Property-based invariants of the anti-entropy digest algebra on
ARBITRARY edit histories: however a table is mutated (appends, updates,
deletes, in any order), the incrementally-folded digest state equals a
from-scratch recompute, and the digests diff empty iff the row multisets
are equal. Few examples — each runs a whole Spark + SnapshotTable cycle."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from binlog_processer_spark.operators.antientropy import (
    bucket_digests,
    diff_buckets,
    digest_state,
)
from binlog_processer_spark.storage.table import SnapshotTable

# an edit script: initial rows, then a sequence of (kind, key, value) ops
_KEY = st.integers(min_value=0, max_value=30)
_VAL = st.integers(min_value=-5, max_value=5)
_EDITS = st.lists(
    st.tuples(st.sampled_from(["append", "update", "delete"]), _KEY, _VAL),
    min_size=1,
    max_size=5,
)


def _write_df(spark, rows):
    return spark.createDataFrame(
        [(str(k), v) for k, v in rows], "k string, v long"
    )


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    init=st.lists(st.tuples(_KEY, _VAL), min_size=1, max_size=25),
    edits=_EDITS,
    data=st.data(),
)
def test_incremental_fold_equals_recompute_on_any_history(
    spark, tmp_path_factory, init, edits, data
):
    tmp = tmp_path_factory.mktemp("ae_prop")
    t = SnapshotTable(str(tmp / "t"))
    t.write(_write_df(spark, init).repartition(3))
    state = SnapshotTable(str(tmp / "dig"))
    digest_state(spark, t, state, ["k"], ["v"], 8)

    for kind, key, val in edits:
        if kind == "append":
            t.write(_write_df(spark, [(key, val)]), mode="append")
        else:
            cur = t.read(spark)
            hit = (
                cur.withColumn("f", F.input_file_name())
                .filter(F.col("k") == str(key))
                .select("f")
                .limit(1)
                .collect()
            )
            if not hit:
                continue  # key not present: edit is a no-op
            f = hit[0]["f"]
            sub = t.read_files(spark, [f])
            if kind == "delete":
                repl = sub.filter(F.col("k") != str(key))
            else:
                repl = sub.withColumn(
                    "v",
                    F.when(F.col("k") == str(key), F.lit(val)).otherwise(
                        F.col("v")
                    ),
                )
            t.rewrite_files([f], repl)
        # fold the churn in at a random cadence: sometimes per edit,
        # sometimes batched across several edits — both must stay exact
        if data.draw(st.booleans()):
            digest_state(spark, t, state, ["k"], ["v"], 8)

    folded = digest_state(spark, t, state, ["k"], ["v"], 8)
    fresh = bucket_digests(t.read(spark), ["k"], [F.expr("v")], 8)
    assert diff_buckets(folded, fresh).count() == 0
    # completeness cross-check: total row count survives the algebra
    n = t.read(spark).count()
    total = folded.agg(F.sum("n_rows")).collect()[0][0] or 0
    assert total == n
