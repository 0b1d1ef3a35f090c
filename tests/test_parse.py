"""Vectorized parse: roundtrip identity, quarantine on malformed lines.

Reference test model (SURVEY.md §5): runtime reconciliation — parse output
must byte-equal the pre-serialization record; failures go to a side output
(Status.java:3-15 analogue), never crash the job.
"""

from pyspark.sql import functions as F

from binlog_processer_spark.functions.parse import (
    parse_raw,
    serialize_expr,
    split_quarantine,
)
from binlog_processer_spark.sources.generator import generate_corpus


def test_roundtrip_identity(spark):
    corpus = generate_corpus(spark, 300, partitions=4)
    raw = corpus.select(serialize_expr().alias("raw"))
    good, bad = split_quarantine(parse_raw(raw))
    assert bad.count() == 0

    cols = ["doc_id", "source", "op", "event_seq", "n_tok", "tokens", "commit_ts"]
    left = corpus.select(cols).sort("event_seq").collect()
    right = good.select(cols).sort("event_seq").collect()
    assert len(left) == len(right) > 0
    for a, b in zip(left, right):
        assert a == b  # exact token-array equality (BASELINE.json invariant)


def test_malformed_lines_quarantined(spark):
    lines = [
        ("v1|1|1704067200|1704067200|Create|f0|src0|0|42||2|0000000700000009",),  # good
        ("v1|2|1704067200|1704067200|Create|f0|src0|0|43|1|0|",),    # good, empty tokens, sign=1
        ("v1|3|170406",),                                   # truncated
        ("",),                                              # empty
        ("garbage with no pipes",),
        ("v0|4|1704067200|1704067200|Create|f0|src0|0|44||1|00000005",),  # wrong version
        ("v1|x|1704067200|1704067200|Create|f0|src0|0|45||1|00000005",),  # non-numeric seq
        ("v1|5|1704067200|1704067200|Create|f0|src0|0|46||2|0000000700",),  # payload/count mismatch
        ("v1|6|1704067200|1704067200|Create|f0|src0|0|47||1|zzzzzzzz",),    # non-hex payload
    ]
    df = spark.createDataFrame(lines, "raw string")
    good, bad = split_quarantine(parse_raw(df))
    assert good.count() == 2
    assert bad.count() == 7
    rows = {r.doc_id: r for r in good.collect()}
    assert list(rows["42"].tokens) == [7, 9]
    assert rows["42"].sign is None
    assert list(rows["43"].tokens) == []
    assert rows["43"].n_tok == 0
    assert rows["43"].sign == 1


def test_malformed_numerics_quarantined_not_raised(spark):
    """Malformed numeric fields are DATA: they must fold into PARSE_ERROR,
    never raise ArrowInvalid in the executor (module contract; regression
    guard for the unvalidated bucket cast)."""
    lines = [
        ("v1|1|1704067200|1704067200|Create|f0|src0|0|42||1|00000007",),  # good
        ("v1|2|1704067200|1704067200|Create|f0|src0|XX|43||1|00000007",),  # bucket non-numeric
        ("v1|3|1704067200|1704067200|Create|f0|src0|99999999999|44||1|00000007",),  # bucket > int32
        ("v1|4|1704067200|1704067200|Create|f0|src0|0|45|-|1|00000007",),  # bare '-' sign
        ("v1|99999999999999999999999999|1704067200|1704067200|Create|f0|src0|0|46||1|00000007",),  # seq > int64
        ("v1|5|1704067200|1704067200|Create|f0|src0|0|47||9999999999|00000007",),  # n_tok > int32
        ("v1|6|99999999999999999999|1704067200|Create|f0|src0|0|48||1|00000007",),  # ts > int64
    ]
    df = spark.createDataFrame(lines, "raw string")
    good, bad = split_quarantine(parse_raw(df))
    assert good.count() == 1
    assert bad.count() == 6
    assert {r.status for r in bad.collect()} == {"PARSE_ERROR"}
    row = good.collect()[0]
    assert row.doc_id == "42" and list(row.tokens) == [7]


def test_parse_is_arrow_batched(spark):
    """No row-at-a-time Python: physical plan shows one ArrowEvalPython-free
    mapInPandas (MapInPandas node), not BatchEvalPython."""
    corpus = generate_corpus(spark, 50, partitions=2)
    good, _ = split_quarantine(parse_raw(corpus.select(serialize_expr().alias("raw"))))
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_negative_tokens_roundtrip(spark):
    """hex() of a negative int renders 64-bit two's complement; the
    serializer must mask to 32 bits or lpad keeps the wrong half
    (regression: -2 roundtripped as -1)."""
    import datetime

    rows = [(1, datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 1),
             "Create", "f0", "s0", 0, "d0", None, 4,
             [-1, -2, -2147483648, 2147483647])]
    ev = ("event_seq bigint, commit_ts timestamp, create_ts timestamp,"
          " op string, file_id string, source string, bucket int,"
          " doc_id string, sign int, n_tok int, tokens array<int>")
    df = spark.createDataFrame(rows, ev)
    good, bad = split_quarantine(parse_raw(df.select(serialize_expr().alias("raw"))))
    assert bad.count() == 0
    assert list(good.collect()[0].tokens) == [-1, -2, -2147483648, 2147483647]


def test_sql_parse_equals_arrow_parse(spark):
    from pyspark.sql import functions as F

    from binlog_processer_spark.functions.parse import (
        corrupt_expr,
        parse_raw,
        parse_raw_sql,
        serialize_expr,
    )
    import __spark_entry__ as em

    from tests.conftest import SF_SMOKE

    c = em._corpus(spark, SF_SMOKE)
    raw = c.select(
        corrupt_expr(serialize_expr(), F.col("doc_num"), F.col("r")).alias("raw")
    )
    a, b = parse_raw(raw), parse_raw_sql(raw)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_sql_parse_malformed_never_raises(spark):
    from binlog_processer_spark.functions.parse import parse_raw_sql

    bad = spark.createDataFrame(
        [
            ("v1|9" * 3,),                         # wrong field count
            ("v2|1|1|1|Create|f|s|1|d||0|",),      # wrong version
            ("v1|999999999999999999999|1|1|Create|f|s|1|d||0|",),  # >18 digits
            ("v1|1|1|1|Create|f|s|1|d|x|0|",),     # non-numeric sign
            ("v1|1|1|1|Create|f|s|1|d||2|0000000a",),  # payload len mismatch
            ("v1|1|1|1|Create|f|s|1|d||1|zzzzzzzz",),  # non-hex payload
            ("v1|1\n|1|1|Create|f|s|1|d||0|",),    # trailing \n in int field
            ("v1|1|1|1|Create|f|s|1|d||1|0000000\n",),  # \n inside 8-char hex
            ("",),
        ],
        "raw string",
    )
    rows = parse_raw_sql(bad).collect()
    assert all(r.status == "PARSE_ERROR" for r in rows)
    assert all(r.raw is not None for r in rows)


def test_sql_parse_negative_and_empty_tokens(spark):
    from binlog_processer_spark.functions.parse import (
        parse_raw,
        parse_raw_sql,
        serialize_expr,
    )

    src = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 00:00:00", "Create",
             "f0", "s", 3, "d1", None, 3, [-1, -2147483648, 2147483647]),
            (2, "2024-01-01 00:00:00", "2024-01-01 00:00:00", "Delete",
             "f0", "s", 3, "d2", 1, 0, []),
        ],
        "event_seq long, commit_ts string, create_ts string, op string,"
        " file_id string, source string, bucket int, doc_id string,"
        " sign int, n_tok int, tokens array<int>",
    ).selectExpr(
        "event_seq", "cast(commit_ts as timestamp) commit_ts",
        "cast(create_ts as timestamp) create_ts", "op", "file_id",
        "source", "bucket", "doc_id", "sign", "n_tok", "tokens",
    )
    raw = src.select(serialize_expr().alias("raw"))
    a = {r.doc_id: (r.tokens, r.sign) for r in parse_raw(raw).collect()}
    b = {r.doc_id: (r.tokens, r.sign) for r in parse_raw_sql(raw).collect()}
    assert a == b
    assert b["d1"] == ([-1, -2147483648, 2147483647], None)
    assert b["d2"] == ([], 1)
