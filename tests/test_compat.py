"""Reference-compat operators: CST shift, epoch heuristic, identifier
normalization, id-list truncation, √n sampling, type widening."""

import datetime
import math

from pyspark.sql import functions as F

from binlog_processer_spark.functions.compat import (
    ID_LIST_MAX,
    cst_date_shift,
    epoch_to_ts,
    normalize_identifier,
    sqrt_sample,
    truncated_id_list,
    widen_types,
)


def test_epoch_heuristic_and_cst_shift(spark):
    rows = [
        (1, 1704067200),            # 10-digit → seconds
        (2, 1704067200000),         # 13-digit → millis
        (3, 999999999),             # 9-digit → seconds (2001)
    ]
    df = spark.createDataFrame(rows, "id int, v long").select(
        "id", epoch_to_ts(F.col("v")).alias("ts")
    )
    got = {r.id: r.ts for r in df.collect()}
    assert got[1] == got[2] == datetime.datetime(2024, 1, 1)
    assert got[3].year == 2001

    # CST-midnight value: 2024-01-01T00:00 CST stored as 2023-12-31T16:00 UTC
    # plus the +8h ambient display the reference undoes → shifting −8h on the
    # CST-rendered value recovers the intended date
    d = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 7, 59),),
         (datetime.datetime(2024, 1, 1, 8, 0),)],
        "ts timestamp",
    ).select(F.to_date(cst_date_shift(F.col("ts"))).alias("d")).collect()
    assert [str(r.d) for r in d] == ["2023-12-31", "2024-01-01"]


def test_normalize_identifier(spark):
    df = spark.createDataFrame([("`My_DB`.`T1`",)], "s string").select(
        normalize_identifier(F.col("s")).alias("n")
    )
    assert df.collect()[0].n == "my_db.t1"


def test_truncated_id_list(spark):
    rows = [("g", str(i)) for i in range(50)] + [("h", "7")]
    df = spark.createDataFrame(rows, "k string, doc_id string")
    out = {
        r.k: r
        for r in truncated_id_list(df, ["k"], max_ids=10).collect()
    }
    assert out["g"].total_ids == 50 and out["g"].probe_ids == 10
    assert out["h"].total_ids == 1 and out["h"].probe_ids == 1
    assert ID_LIST_MAX == 1000  # reference default (CheckDBUtil.java:39-46)


def test_sqrt_sample_size_and_determinism(spark):
    rows = [("g", str(i)) for i in range(100)] + [("h", str(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, doc_id string")
    a = sqrt_sample(df, ["k"]).collect()
    b = sqrt_sample(df, ["k"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    sizes = {}
    for r in a:
        sizes[r.k] = sizes.get(r.k, 0) + 1
    assert sizes["g"] == math.ceil(math.sqrt(100))
    assert sizes["h"] == math.ceil(math.sqrt(5))


def test_widen_types(spark):
    df = spark.createDataFrame(
        [(1, 1.5, bytearray(b"ab"), "s", 9)],
        "i int, f float, b binary, s string, l long",
    )
    out = widen_types(df)
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types == {
        "i": "bigint", "f": "double", "b": "string", "s": "string",
        "l": "bigint",
    }
    row = out.collect()[0]
    assert row.i == 1 and row.b == "ab" and row.l == 9
