"""Serialize / parse of binlog-style event records.

The reference reads binary binlog events row-at-a-time
(binlog-resovler BinlogFileReader.java:284-343) and materializes typed change
records. Here the wire format is a pipe-delimited log line with a
comma-joined token payload, produced JVM-side (whole-stage codegen) and parsed
back by a **vectorized Arrow-batched mapInPandas** — never per-row Python
(BASELINE.json input_hint mandate).

Wire format (RAW_VERSION v1)::

    v1|<event_seq>|<unix_commit_s>|<unix_create_s>|<op>|<file_id>|<source>|<bucket>|<doc_id>|<sign-or-empty>|<n_tok>|<hex(int32-BE tokens)>

The token payload is hex-packed int32 (8 hex chars per token, the binlog-bytes
analogue): the batch decode is ONE ``bytes.fromhex`` + ``np.frombuffer`` +
``np.split`` per Arrow batch — no per-token Python, unlike a delimited decimal
payload which would need a string→int parse per token.

Malformed lines (truncated/garbled upstream) are not dropped: they surface as
``status='PARSE_ERROR'`` quarantine rows, modeled on the reference's status
codes (binlog-resovler resolver/Status.java:3-15) and exception handler
side-channel (TaskProcessor.java:63-65).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

RAW_VERSION = "v1"
N_FIELDS = 12

PARSED_SCHEMA = StructType(
    [
        StructField("event_seq", LongType()),
        StructField("commit_ts", TimestampType()),
        StructField("create_ts", TimestampType()),
        StructField("op", StringType()),
        StructField("file_id", StringType()),
        StructField("source", StringType()),
        StructField("bucket", IntegerType()),
        StructField("doc_id", StringType()),
        StructField("sign", IntegerType()),
        StructField("n_tok", IntegerType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("status", StringType()),
        StructField("raw", StringType()),
    ]
)


def serialize_expr() -> F.Column:
    """JVM-side raw-line construction (no Python in the loop).

    concat_ws renders a NULL ``sign`` as an empty field, so nullability
    round-trips.
    """
    return F.concat_ws(
        "|",
        F.lit(RAW_VERSION),
        F.col("event_seq").cast("string"),
        F.unix_timestamp("commit_ts").cast("string"),
        F.unix_timestamp("create_ts").cast("string"),
        F.col("op"),
        F.col("file_id"),
        F.col("source"),
        F.col("bucket").cast("string"),
        F.col("doc_id"),
        F.coalesce(F.col("sign").cast("string"), F.lit("")),
        F.col("n_tok").cast("string"),
        # hex-packed int32-BE payload, built entirely in codegen
        F.array_join(
            F.transform("tokens", lambda t: F.lpad(F.hex(t), 8, "0")), ""
        ),
    )


def corrupt_expr(raw: F.Column, doc_num: F.Column, r: F.Column) -> F.Column:
    """Deterministic ~0.5% corruption (FIXTURES.md F1): truncate the line."""
    return F.when(
        (doc_num * 5 + r) % 211 == 7, F.substring(raw, 1, 10)
    ).otherwise(raw)


def _parse_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import numpy as np
    import pandas as pd

    for pdf in batches:
        raw = pdf["raw"].astype(str)
        parts = raw.str.split("|", expand=True)
        # normalize: exactly N_FIELDS all-string columns (split(expand) yields
        # NaN-typed columns when no row has enough fields)
        parts = parts.reindex(columns=range(N_FIELDS))
        had_field = parts.notna()
        parts = parts.where(had_field, "").astype(str)
        ok = (
            (parts[0] == RAW_VERSION)
            & had_field[11]
            & parts[1].str.fullmatch(r"\d+")
            & parts[2].str.fullmatch(r"\d+")
            & parts[3].str.fullmatch(r"\d+")
            & parts[10].str.fullmatch(r"\d+")
            & (parts[9].str.fullmatch(r"-?\d*"))
        )

        out = pd.DataFrame(index=raw.index)
        out["event_seq"] = pd.to_numeric(
            parts[1].where(ok), errors="coerce"
        ).astype("Int64")
        out["commit_ts"] = pd.to_datetime(
            pd.to_numeric(parts[2].where(ok), errors="coerce"), unit="s"
        )
        out["create_ts"] = pd.to_datetime(
            pd.to_numeric(parts[3].where(ok), errors="coerce"), unit="s"
        )
        out["op"] = parts[4].where(ok)
        out["file_id"] = parts[5].where(ok)
        out["source"] = parts[6].where(ok)
        out["bucket"] = pd.to_numeric(parts[7].where(ok), errors="coerce").astype(
            "Int32"
        )
        out["doc_id"] = parts[8].where(ok)
        out["sign"] = pd.to_numeric(
            parts[9].where(ok).replace("", None), errors="coerce"
        ).astype("Int32")
        n_tok = pd.to_numeric(parts[10].where(ok), errors="coerce").astype("Int32")
        out["n_tok"] = n_tok

        # batch-vectorized token decode: payload length must be 8 hex chars
        # per declared token (corrupt otherwise), then ONE fromhex/frombuffer
        # for the whole batch and zero-copy splits per row
        ntok_vals = n_tok.fillna(0).to_numpy(dtype=np.int64)
        payload = parts[11]
        ok &= payload.str.len() == ntok_vals * 8
        ok &= payload.str.fullmatch(r"[0-9a-fA-F]*")
        okarr = ok.to_numpy()
        counts = np.where(okarr, ntok_vals, 0)
        blob = bytes.fromhex("".join(payload.where(ok, "").tolist()))
        vals = np.frombuffer(blob, dtype=">i4").astype(np.int32)
        splits = np.split(vals, np.cumsum(counts)[:-1]) if len(counts) else []
        out["tokens"] = [
            s if isok else None for s, isok in zip(splits, okarr)
        ]
        out["status"] = np.where(okarr, "OK", "PARSE_ERROR")
        # raw is kept only for quarantine forensics; nulling it on OK rows
        # keeps ~2KB/row of wire text out of the Arrow return + any persist
        # of the parsed relation (at 10^12 rows that raw echo would dominate
        # the pipeline's memory traffic)
        out["raw"] = raw.where(~ok)
        yield out


def parse_raw(df: DataFrame) -> DataFrame:
    """raw-line DataFrame (column ``raw``) → typed change records.

    Arrow-batched; batch size governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    return df.select("raw").mapInPandas(_parse_batches, PARSED_SCHEMA)


def split_quarantine(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without raw, quarantine rows keeping raw for forensics)."""
    good = parsed.filter(F.col("status") == "OK").drop("raw", "status")
    bad = parsed.filter(F.col("status") != "OK").select("status", "raw")
    return good, bad
