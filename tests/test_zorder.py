"""Z-order clustering: the Morton key interleave, multi-dimension file
pruning after a z-ordered write, and the rewrite_zordered maintenance
action. The pay-off under test: a lexicographic cluster prunes only its
leading column; a z-ordered layout prunes on EVERY clustered column."""

import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.operators.compact import rewrite_zordered
from binlog_processer_spark.storage.table import SnapshotTable
from binlog_processer_spark.storage.zorder import zorder_key


def test_zorder_key_known_morton_codes(spark):
    """bits=2, 2 dims over domain [0,3]: the classic 4x4 Morton table —
    z(x,y) interleaves x into even bits, y into odd bits."""
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    ).withColumn("z", zorder_key({"x": (0, 3), "y": (0, 3)}, bits=2))
    got = {(r.x, r.y): r.z for r in df.collect()}
    for x in range(4):
        for y in range(4):
            want = sum(((x >> b) & 1) << (2 * b) for b in range(2)) | sum(
                ((y >> b) & 1) << (2 * b + 1) for b in range(2)
            )
            assert got[(x, y)] == want, (x, y)


def test_zorder_key_clamps_and_nulls(spark):
    df = spark.createDataFrame(
        [(-5.0,), (99.0,), (None,)], "x double"
    ).withColumn("z", zorder_key({"x": (0, 10)}, bits=4))
    vals = [r.z for r in df.collect()]
    assert vals == [0, 15, 0]  # below-domain clamps, above clamps, null->0


def test_zorder_key_rejects_bad_width():
    with pytest.raises(ValueError):
        zorder_key({"a": (0, 1), "b": (0, 1)}, bits=32)  # 64 > 63
    with pytest.raises(ValueError):
        zorder_key({}, bits=8)


def _xy(spark, n=4096):
    """Independent uniform dims: x = row id, y = bit-reversed id, so
    neither column orders the other (worst case for lexicographic)."""
    rev = sum(
        F.shiftleft(F.shiftright(F.col("id"), b).bitwiseAND(F.lit(1)), 11 - b)
        for b in range(12)
    )
    return spark.range(n).select(
        F.col("id").alias("x"), rev.cast("long").alias("y")
    )


def test_zordered_write_prunes_both_dims(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "zt"))
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        t.write(_xy(spark), zorder_by=["x", "y"])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    m = t._manifest(t.current_snapshot())
    assert m["stats_columns"] == ["x", "y"]
    n_files = len(t.data_files())
    assert n_files >= 8
    for col in ("x", "y"):
        kept = t.prune_files({col: (0, 255)})
        assert len(kept) < n_files / 2, (col, len(kept), n_files)
        got = t.read_where(spark, {col: (0, 255)})
        assert sorted(r[col] for r in got.collect()) == list(range(256))


def test_lexicographic_cluster_cannot_prune_second_dim(spark, tmp_path):
    """The control: cluster_by=['x','y'] leaves y domain-wide per file."""
    t = SnapshotTable(str(tmp_path / "lex"))
    t.write(
        _xy(spark).repartitionByRange(16, "x", "y").sortWithinPartitions(
            "x", "y"
        ),
        stats_columns=["x", "y"],
    )
    n_files = len(t.data_files())
    assert n_files >= 8
    assert len(t.prune_files({"x": (0, 255)})) < n_files / 2
    assert len(t.prune_files({"y": (0, 255)})) == n_files  # prunes nothing


def test_rewrite_zordered_roundtrip(spark, tmp_path):
    """Arrival-order table -> z-order rewrite: same rows, new snapshot,
    stats appear for the clustered columns, both dims prune."""
    t = SnapshotTable(str(tmp_path / "rz"))
    t.write(_xy(spark).repartition(8))  # arrival order, no stats at all
    before = t.current_snapshot()
    n_before = len(t.data_files())
    snap = rewrite_zordered(spark, t, ["x", "y"], num_files=16)
    assert snap == before + 1
    assert sorted(
        (r.x, r.y) for r in t.read(spark).collect()
    ) == sorted((r.x, r.y) for r in _xy(spark).collect())
    n_after = len(t.data_files())
    for col in ("x", "y"):
        assert len(t.prune_files({col: (0, 255)})) < n_after / 2
    # rollback still serves the pre-rewrite layout
    t.rollback(before)
    assert len(t.data_files()) == n_before


def test_zorder_partitioned_table_no_file_fanout(spark, tmp_path):
    """On a hive-partitioned table the Morton key must refine WITHIN the
    partition columns: without the prefix every range task holds every
    partition value and the directory split fans out MORE files than it
    started with."""
    t = SnapshotTable(str(tmp_path / "pz"))
    df = _xy(spark).withColumn("p", (F.col("x") % 4).cast("string"))
    t.write(df.repartition(8), partition_by=["p"])
    n_before = len(t.data_files())
    rewrite_zordered(spark, t, ["x", "y"], num_files=16)
    n_after = len(t.data_files())
    assert n_after <= n_before, (n_before, n_after)
    assert sorted((r.x, r.y) for r in t.read(spark).collect()) == sorted(
        (r.x, r.y) for r in _xy(spark).collect()
    )


def test_snapshot_ids_never_reuse_after_rollback(spark, tmp_path):
    """rollback is a pointer flip; the rolled-past snapshot dir stays on
    disk until expire_snapshots. The next commit must mint PAST it, not
    collide with or adopt it."""
    t = SnapshotTable(str(tmp_path / "rb"))
    t.write(spark.range(10))
    t.write(spark.range(10, 20), mode="append")  # snap 1
    t.rollback(0)
    snap = t.write(spark.range(30, 35), mode="append")
    assert snap == 2  # not 1: snap-1 dir still exists
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == list(range(10)) + list(range(30, 35))
