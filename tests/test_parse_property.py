"""Property-based wire-format roundtrip: serialize → parse is the identity
on ARBITRARY valid records, and corrupting any prefix of a line never
crashes the parse (quarantine or survive, never raise) — the reference's
runtime-reconciliation invariant (SURVEY §5) generalized beyond the fixed
corpus.

One Spark job per hypothesis CASE would be minutes-slow, so the strategy
generates a BATCH of records per example and the test runs few examples.
"""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from binlog_processer_spark.functions.parse import (
    parse_raw,
    serialize_expr,
    split_quarantine,
)

EV = (
    "event_seq bigint, commit_ts timestamp, create_ts timestamp, op string,"
    " file_id string, source string, bucket int, doc_id string, sign int,"
    " n_tok int, tokens array<int>"
)

_TS = st.datetimes(
    min_value=datetime.datetime(2000, 1, 1),
    max_value=datetime.datetime(2100, 1, 1),
).map(lambda d: d.replace(microsecond=0))
# identifier-ish strings: no '|' (field separator), non-empty
_IDENT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="_-."
    ),
    min_size=1,
    max_size=20,
)

_RECORD = st.fixed_dictionaries(
    {
        # wire-format contract: int64 fields carry <= 18 digits
        "event_seq": st.integers(min_value=0, max_value=10**18 - 1),
        "commit_ts": _TS,
        "create_ts": _TS,
        "op": st.sampled_from(["Create", "Update", "Delete"]),
        "file_id": _IDENT,
        "source": _IDENT,
        "bucket": st.integers(min_value=0, max_value=999_999_999),
        "doc_id": _IDENT,
        "sign": st.one_of(st.none(), st.integers(min_value=0, max_value=1)),
        "n_tok": st.just(-1),  # filled from tokens below
        "tokens": st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=30
        ),
    }
)


def _rows(records):
    return [
        tuple(
            len(r["tokens"]) if k == "n_tok" else r[k]
            for k in (
                "event_seq", "commit_ts", "create_ts", "op", "file_id",
                "source", "bucket", "doc_id", "sign", "n_tok", "tokens",
            )
        )
        for r in records
    ]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_RECORD, min_size=1, max_size=40))
def test_roundtrip_identity_property(spark, records):
    df = spark.createDataFrame(_rows(records), EV)
    good, bad = split_quarantine(parse_raw(df.select(serialize_expr().alias("raw"))))
    assert bad.count() == 0
    cols = ["event_seq", "op", "doc_id", "sign", "n_tok", "tokens", "commit_ts"]
    left = sorted(map(tuple, df.select(cols).collect()))
    right = sorted(map(tuple, good.select(cols).collect()))
    assert left == right


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(_RECORD, min_size=1, max_size=10),
    st.integers(min_value=0, max_value=200),
)
def test_truncation_never_crashes(spark, records, cut):
    """Any prefix truncation yields OK or PARSE_ERROR rows — never an
    executor exception (module contract: malformed lines are DATA)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(_rows(records), EV)
    raw = df.select(
        F.substring(serialize_expr(), 1, cut + 1).alias("raw")
    )
    parsed = parse_raw(raw)
    n = parsed.count()
    assert n == len(records)
    assert parsed.filter(
        ~F.col("status").isin("OK", "PARSE_ERROR")
    ).count() == 0
