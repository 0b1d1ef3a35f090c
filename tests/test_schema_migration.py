"""Metadata-only schema evolution on snapshot tables: widen + add without
rewriting data (Iceberg-style; promotion set = SchemaConverter.java:14-74,
applied by Spark's parquet reader at scan time)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlog_processer_spark.storage.table import SnapshotTable

V1 = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("f", T.FloatType()),
        T.StructField("b", T.BinaryType()),
        T.StructField("arr", T.ArrayType(T.IntegerType())),
        T.StructField("k", T.StringType()),
    ]
)
V2 = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("b", T.StringType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("k", T.StringType()),
        T.StructField("extra", T.StringType(), nullable=True),
    ]
)


def _v1_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, 1.5, bytearray(b"ab"), [1, 2], "a"),
         (2, 2.5, bytearray(b"cd"), [3], "b")],
        V1,
    )
    t.write(df, partition_by=["k"])
    return t


def test_migrate_widens_without_touching_data(spark, tmp_path):
    t = _v1_table(spark, tmp_path)
    files = t.data_files()
    stats = {p: (os.stat(p).st_ino, os.stat(p).st_mtime_ns) for p in files}

    snap = t.migrate_schema(V2)
    m = t._manifest(snap)
    assert m["mode"] == "migrate"
    # not one data file listed, read, or rewritten
    assert t.data_files() == files
    for p in files:
        st = os.stat(p)
        assert (st.st_ino, st.st_mtime_ns) == stats[p]

    out = t.read(spark)
    assert {f.name: f.dataType for f in out.schema.fields} == {
        f.name: f.dataType for f in V2.fields
    }
    rows = {r.i: r for r in out.collect()}
    assert rows[1].f == 1.5 and rows[1].b == "ab" and rows[1].arr == [1, 2]
    assert rows[1].extra is None


def test_append_follows_the_migrated_schema(spark, tmp_path):
    t = _v1_table(spark, tmp_path)
    t.migrate_schema(V2)
    v2_rows = spark.createDataFrame([(3, 3.5, "ef", [4, 5], "a", "x")], V2)
    t.write(v2_rows, partition_by=["k"], mode="append")
    out = t.read(spark)
    assert out.count() == 3
    assert out.filter(F.col("extra") == "x").count() == 1
    # the pre-migration shape is no longer appendable (schema is pinned to
    # the table's CURRENT schema)
    v1_rows = spark.createDataFrame(
        [(4, 4.5, bytearray(b"gh"), [6], "b")], V1
    )
    with pytest.raises(ValueError, match="append schema mismatch"):
        t.write(v1_rows, partition_by=["k"], mode="append")


def test_rollback_restores_the_old_schema(spark, tmp_path):
    t = _v1_table(spark, tmp_path)
    snap0 = t.current_snapshot()
    t.migrate_schema(V2)
    t.rollback(snap0)
    assert t.read(spark).schema["i"].dataType == T.IntegerType()


@pytest.mark.parametrize(
    "schema,msg",
    [
        # dropping a column
        (
            T.StructType([f for f in V2.fields if f.name != "b"]),
            "cannot drop",
        ),
        # narrowing int -> short
        (
            T.StructType(
                [
                    T.StructField("i", T.ShortType()),
                    *[f for f in V1.fields if f.name != "i"],
                ]
            ),
            "non-widening",
        ),
        # non-nullable add
        (
            T.StructType(
                [*V1.fields, T.StructField("req", T.StringType(), False)]
            ),
            "must be nullable",
        ),
    ],
)
def test_unsafe_migrations_rejected(spark, tmp_path, schema, msg):
    t = _v1_table(spark, tmp_path)
    with pytest.raises(ValueError, match=msg):
        t.migrate_schema(schema)


def test_orc_tables_refuse_metadata_migration(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "orc"))
    t.write(
        spark.createDataFrame([(1,)], "i int"), file_format="orc"
    )
    with pytest.raises(ValueError, match="parquet-only"):
        t.migrate_schema(T.StructType([T.StructField("i", T.LongType())]))
