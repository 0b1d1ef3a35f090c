"""Manifest zone maps: per-file min/max recorded at commit from parquet
footers, file pruning planned from the manifest alone, and read_where's
exactness guarantee (pruning is a superset; the residual filter makes the
result identical to a full-scan filter). The Iceberg-manifest file-skipping
technique over the JSON-manifest stand-in."""

from pyspark.sql import functions as F

from binlog_processer_spark.storage.table import SnapshotTable


def _ranged_table(spark, tmp_path, stats=("id",)):
    """8 files with tight, near-disjoint id ranges (range partitioning
    sorts before the split, so footer min/max per file is narrow)."""
    t = SnapshotTable(str(tmp_path / "zt"))
    df = spark.range(0, 800).select(
        "id",
        (F.col("id") % 3).cast("string").alias("k"),
        F.when(F.col("id") < 100, None)
        .otherwise(F.concat(F.lit("s"), (F.col("id") / 100).cast("int")))
        .alias("tag"),
    ).repartitionByRange(8, "id")
    t.write(df, stats_columns=list(stats))
    return t


def test_stats_recorded_and_pruning_skips_files(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    m = t._manifest(t.current_snapshot())
    assert m["stats_columns"] == ["id"]
    assert set(m["file_stats"]) == set(m["files"])
    all_files = t.data_files()
    pruned = t.prune_files({"id": (42, 58)})
    assert 0 < len(pruned) < len(all_files)

    got = t.read_where(spark, {"id": (42, 58)})
    want = t.read(spark).filter(F.col("id").between(42, 58))
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )
    # the planned scan must actually open fewer files
    assert len(got.inputFiles()) < len(all_files)


def test_open_bounds_and_empty_prune(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    lo_only = t.read_where(spark, {"id": (790, None)})
    assert sorted(r.id for r in lo_only.collect()) == list(range(790, 800))
    assert len(lo_only.inputFiles()) <= 2
    # a range outside every file's bounds prunes EVERYTHING and still
    # returns a readable empty frame with the table schema
    none = t.read_where(spark, {"id": (5000, 6000)})
    assert none.count() == 0
    assert set(none.columns) == {"id", "k", "tag"}


def test_string_stats_and_unknown_column_kept(spark, tmp_path):
    t = _ranged_table(spark, tmp_path, stats=("id", "tag"))
    # tag='s7' lives only in the top id range; the all-null tag file
    # (id<100) must be prunable too (recorded as null zone map)
    pruned = t.prune_files({"tag": ("s7", "s7")})
    assert 0 < len(pruned) < len(t.data_files())
    got = t.read_where(spark, {"tag": ("s7", "s7")})
    assert sorted(r.id for r in got.collect()) == list(range(700, 800))
    # un-recorded column: prune keeps every file, residual filter exact
    unk = t.read_where(spark, {"k": ("1", "1")})
    assert unk.count() == t.read(spark).filter(F.col("k") == "1").count()
    assert len(t.prune_files({"k": ("1", "1")})) == len(t.data_files())


def test_append_inherits_stats_contract(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    more = spark.range(800, 900).select(
        "id",
        (F.col("id") % 3).cast("string").alias("k"),
        F.lit("s8").alias("tag"),
    )
    # no stats_columns passed: the append inherits the table's contract
    t.write(more, mode="append")
    m = t._manifest(t.current_snapshot())
    assert m["stats_columns"] == ["id"]
    assert set(m["file_stats"]) == set(m["files"])
    got = t.read_where(spark, {"id": (850, 860)})
    assert got.count() == 11
    assert len(got.inputFiles()) < len(t.data_files())


def test_rewrite_files_recomputes_stats(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    victim = t.prune_files({"id": (0, 10)})[:1]
    replacement = t.read_files(spark, victim).filter(F.col("id") >= 5)
    t.rewrite_files(victim, replacement)
    m = t._manifest(t.current_snapshot())
    assert set(m["file_stats"]) == set(m["files"])
    # pruning still plans correctly over the mixed kept+rewritten set
    got = t.read_where(spark, {"id": (0, 20)})
    want = t.read(spark).filter(F.col("id") <= 20)
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )


def test_table_without_stats_is_unpruned_but_exact(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "plain"))
    t.write(spark.range(0, 50).select("id"))
    assert len(t.prune_files({"id": (1, 2)})) == len(t.data_files())
    assert sorted(r.id for r in t.read_where(spark, {"id": (1, 2)}).collect()) == [1, 2]


def test_timestamp_stats_prune(spark, tmp_path):
    import datetime as dt

    t = SnapshotTable(str(tmp_path / "ts"))
    df = spark.range(0, 240).select(
        "id",
        F.expr(
            "timestamp_seconds(1700000000 + id * 3600)"
        ).alias("commit_ts"),
    ).repartitionByRange(6, "id")
    t.write(df, stats_columns=["commit_ts"])
    m = t._manifest(t.current_snapshot())
    # timestamps recorded as epoch micros for every file
    assert all("commit_ts" in st for st in m["file_stats"].values())
    lo = dt.datetime.fromtimestamp(1700000000 + 100 * 3600, dt.timezone.utc)
    hi = dt.datetime.fromtimestamp(1700000000 + 110 * 3600, dt.timezone.utc)
    got = t.read_where(spark, {"commit_ts": (lo, hi)})
    assert sorted(r.id for r in got.collect()) == list(range(100, 111))
    assert len(got.inputFiles()) < len(t.data_files())


def test_cluster_by_makes_pruning_effective(spark, tmp_path):
    """Zone maps on UNCLUSTERED writes are correct but useless (every
    file spans the whole domain); cluster_by range-distributes so the
    same predicate prunes most files."""
    rows = spark.range(0, 4000).select(
        (F.col("id") * 2654435761 % 4000).alias("v")  # scrambled order
    ).repartition(8)
    flat = SnapshotTable(str(tmp_path / "flat"))
    flat.write(rows, stats_columns=["v"])
    clus = SnapshotTable(str(tmp_path / "clus"))
    # AQE would coalesce this toy-sized range shuffle into ONE partition
    # (correct for real volumes, defeats the multi-file assertion here)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesce_key, "false")
    try:
        clus.write(rows, stats_columns=["v"], cluster_by=["v"])
    finally:
        spark.conf.set(coalesce_key, "true")

    pred = {"v": (100, 140)}
    assert len(flat.prune_files(pred)) == len(flat.data_files())  # no help
    assert len(clus.prune_files(pred)) < len(clus.data_files()) / 2
    a = sorted(r.v for r in flat.read_where(spark, pred).collect())
    b = sorted(r.v for r in clus.read_where(spark, pred).collect())
    assert a == b and len(a) == 41


def test_uri_rooted_table_records_stats_and_blooms(spark, tmp_path):
    """Zone maps AND blooms must exist for URI-rooted tables (HDFS/S3 is
    the reference's native habitat, HdfsStorage.java:40-104): the commit
    collects them executor-side via input_file_name(), so pruning works
    through the HadoopFS metadata path too."""
    t = SnapshotTable(f"file://{tmp_path}/rt")
    df = spark.range(0, 800).select(
        "id", F.concat(F.lit("k"), F.col("id")).alias("key")
    ).repartitionByRange(8, "id")
    t.write(df, stats_columns=["id"], bloom_columns=["key"])

    m = t._manifest(t.current_snapshot())
    assert m["stats_columns"] == ["id"]
    assert set(m["file_stats"]) == set(m["files"])
    assert m["bloom_columns"] == ["key"]
    assert set(t._load_blooms(m)) == set(m["files"])

    all_files = t.data_files()
    assert 0 < len(t.prune_files({"id": (42, 58)})) < len(all_files)
    hit = t.prune_files({"key": ("k42", "k42")})
    assert len(hit) == 1  # bloom point-lookup narrows to one file
    got = t.read_where(spark, {"key": ("k42", "k42")})
    assert [r.id for r in got.collect()] == [42]

    # appends inherit the contract on the URI path as well
    t.write(
        spark.range(800, 900).select(
            "id", F.concat(F.lit("k"), F.col("id")).alias("key")
        ).coalesce(1),
        mode="append",
    )
    m2 = t._manifest(t.current_snapshot())
    assert set(m2["file_stats"]) == set(m2["files"])
    assert set(t._load_blooms(m2)) == set(m2["files"])
    assert len(t.prune_files({"key": ("k850", "k850")})) == 1


def test_commit_never_reads_files_driver_side(spark, tmp_path, monkeypatch):
    """Stats/bloom collection is an executor job: a commit of N files must
    trigger ZERO driver-side parquet reads (pyarrow) — at a 100× commit,
    driver-side per-file Python serializes minutes inside the commit."""
    import pyarrow.parquet as pq

    def _boom(*a, **kw):
        raise AssertionError("driver-side pq.ParquetFile read at commit")

    monkeypatch.setattr(pq, "ParquetFile", _boom)
    t = SnapshotTable(str(tmp_path / "nt"))
    df = spark.range(0, 400).select(
        "id", F.concat(F.lit("k"), F.col("id")).alias("key")
    ).repartitionByRange(4, "id")
    t.write(df, stats_columns=["id"], bloom_columns=["key"])
    m = t._manifest(t.current_snapshot())
    assert set(m["file_stats"]) == set(m["files"])
    assert len(t.prune_files({"key": ("k7", "k7")})) == 1
