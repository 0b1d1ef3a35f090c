"""Bloom file index: point-lookup pruning on high-cardinality keys.

Zone maps (test_zonemap.py) prune RANGE scans but need clustering to
help; blooms prune EQUALITY probes with no clustering at all — each
file records which keys it holds, so a doc_id lookup opens ~1 file of
a table whose every file spans the whole key domain."""


def _mk(spark, n=200, parts=4):
    return (
        spark.range(n)
        .selectExpr(
            "cast(id as string) as doc_id",
            "cast(id as bigint) as doc_num",
            "cast(id % 7 as double) as score",
        )
        .repartition(parts, "doc_id")
    )


def test_bloom_point_lookup_prunes(spark, tmp_path):
    from binlog_processer_spark.storage.table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.write(_mk(spark), bloom_columns=["doc_id", "doc_num"])
    n_files = len(t.data_files())
    assert n_files == 4
    for key in ["0", "17", "88", "123", "199"]:
        pruned = t.prune_files({"doc_id": (key, key)})
        # unclustered high-cardinality key: min/max never prunes, the
        # bloom must (deterministic data + deterministic hashes)
        assert len(pruned) < n_files
        got = t.read_where(spark, {"doc_id": (key, key)}).collect()
        assert [r.doc_id for r in got] == [key]
    # int column probed with an int value
    pruned = t.prune_files({"doc_num": (88, 88)})
    assert len(pruned) < n_files
    got = t.read_where(spark, {"doc_num": (88, 88)}).collect()
    assert [r.doc_num for r in got] == [88]
    # absent key: every file's bloom proves it out
    assert t.prune_files({"doc_id": ("nope", "nope")}) == []
    assert t.read_where(spark, {"doc_id": ("nope", "nope")}).count() == 0
    # RANGE predicate on a bloom column: blooms don't apply, stays exact
    got = t.read_where(spark, {"doc_num": (10, 12)}).collect()
    assert sorted(r.doc_num for r in got) == [10, 11, 12]


def test_bloom_unsupported_type_is_safe(spark, tmp_path):
    from binlog_processer_spark.storage.table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.write(_mk(spark), bloom_columns=["score"])  # double: never recorded
    n_files = len(t.data_files())
    assert len(t.prune_files({"score": (3.0, 3.0)})) == n_files
    got = t.read_where(spark, {"score": (3.0, 3.0)}).count()
    assert got == spark.range(200).filter("id % 7 = 3").count()


def test_bloom_survives_commits_and_expiry(spark, tmp_path):
    """Append inherits the bloom contract; rewrite drops replaced files'
    entries; every commit's sidecar is self-contained, so pruning still
    works after expire_snapshots deletes the ancestor snap dirs."""
    from binlog_processer_spark.storage.table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.write(_mk(spark, 100, 2), bloom_columns=["doc_id"])
    extra = (
        spark.range(100, 200)
        .selectExpr(
            "cast(id as string) as doc_id",
            "cast(id as bigint) as doc_num",
            "cast(id % 7 as double) as score",
        )
        .coalesce(1)
    )
    t.write(extra, mode="append")  # inherits bloom_columns from parent
    # a key that lives only in the appended file prunes to that file
    pruned = t.prune_files({"doc_id": ("150", "150")})
    assert len(pruned) == 1
    assert [r.doc_id for r in t.read_where(
        spark, {"doc_id": ("150", "150")}
    ).collect()] == ["150"]

    # rewrite the appended file away (drop rows >= 150): its old entry
    # must not resurrect keys, the replacement file gets a fresh bloom
    old = pruned
    surv = t.read_files(spark, old).filter("doc_num < 150").coalesce(1)
    t.rewrite_files(old, surv)
    assert [r.doc_id for r in t.read_where(
        spark, {"doc_id": ("120", "120")}
    ).collect()] == ["120"]
    assert t.read_where(spark, {"doc_id": ("150", "150")}).count() == 0

    # expire everything but the head: sidecars of deleted ancestors are
    # gone, the head's own sidecar still serves pruning
    t.expire_snapshots(keep_last=1)
    pruned = t.prune_files({"doc_id": ("120", "120")})
    assert 0 < len(pruned) < len(t.data_files())
    assert [r.doc_id for r in t.read_where(
        spark, {"doc_id": ("120", "120")}
    ).collect()] == ["120"]


def test_bloom_exclude_files_drops_entries(spark, tmp_path):
    from binlog_processer_spark.storage.table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.write(_mk(spark), bloom_columns=["doc_id"])
    victim = t.prune_files({"doc_id": ("42", "42")})
    assert len(victim) == 1
    t.exclude_files(victim)
    # the excluded file's keys are gone from table AND index
    assert t.prune_files({"doc_id": ("42", "42")}) == []
    assert t.read_where(spark, {"doc_id": ("42", "42")}).count() == 0
    # other keys still resolve through the re-pointed sidecar
    m = t._manifest(t.current_snapshot())
    assert m["blooms"].startswith(f"snap-{t.current_snapshot()}/")


def test_prune_files_any_multi_key(spark, tmp_path):
    """The multi-key planner returns a superset of the true hit files
    and None whenever it cannot answer (no index, unsupported value,
    probe budget)."""
    from binlog_processer_spark.storage.table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.write(_mk(spark), bloom_columns=["doc_id"])
    truth = set()
    for k in ["3", "77", "190"]:
        truth.update(t.prune_files({"doc_id": (k, k)}))
    got = t.prune_files_any("doc_id", ["3", "77", "190"])
    assert truth <= set(got) and len(got) <= 3
    # rows behind the planned files cover the exact lookup
    rows = t.read_files(spark, got).filter(
        "doc_id in ('3', '77', '190')"
    ).count()
    assert rows == 3
    # can't answer → None (caller falls back to a scan)
    assert t.prune_files_any("source", ["a"]) is None  # no bloom recorded
    assert t.prune_files_any("doc_id", ["3", None]) is None  # bad value
    assert t.prune_files_any("doc_id", ["3"], max_probes=1) is None


def test_upsert_plans_hits_from_bloom(spark, tmp_path):
    """The streaming upsert's state table records a doc_id bloom from
    its first commit, so later triggers plan hit files without reading
    the table."""
    from pyspark.sql import functions as F

    from binlog_processer_spark.functions.parse import serialize_expr
    from binlog_processer_spark.sources.generator import (
        generate_corpus,
        routing_dim,
    )
    from binlog_processer_spark.streaming.upsert import run_streaming_upsert

    corpus = generate_corpus(spark, 300, partitions=2)
    raw = corpus.select("source", serialize_expr().alias("raw"))
    d = str(tmp_path / "stream")
    for pred in [F.col("source") == "src0", F.col("source") != "src0"]:
        raw.filter(pred).select("raw").coalesce(1).write.mode(
            "append"
        ).parquet(d + "/raw")
    table = run_streaming_upsert(
        spark, d + "/raw", routing_dim(spark), d + "/out",
        max_files_per_trigger=1,
    )
    m = table._manifest(table.current_snapshot())
    assert m["bloom_columns"] == ["doc_id", "final_op"]
    assert m["stats_columns"] == ["final_seq"]
    assert m.get("blooms")
    # the planner answers for this table (the in-stream path used it)
    some_key = table.read(spark).select("doc_id").first()["doc_id"]
    assert table.prune_files_any("doc_id", [some_key]) is not None
