"""Deterministic scalable corpus generator (bench + unit-test input).

The driver's ``documents`` table is only 500–5000 rows; benchmarking the
parse→route→aggregate path needs millions of events. This generator
synthesizes the same corpus shape (doc_id, tokens:array<int32>, n_tok, source,
op, event_seq, commit_ts, create_ts, file_id, bucket, table_key, sign) from
pure integer arithmetic on ``spark.range`` — fully distributed (one Arrow
batch per range partition, no driver materialization), deterministic
(seed-free arithmetic, FIXTURES.md F5), and embarrassingly parallel, so
generation itself never bottlenecks the measured pipeline.

Skew: ~46% of docs land in bucket 0 (the hot sink), matching corpus.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    import pandas as pd

GEN_SCHEMA = (
    "doc_id string, doc_num bigint, source string, r int, tokens array<int>, "
    "n_tok int, op string, event_seq bigint, commit_ts timestamp, "
    "create_ts timestamp, file_id string, bucket int, table_key string, sign int"
)

N_SOURCES = 20
EPOCH_S = 1704067200  # 2024-01-01 00:00:00 UTC


def _gen_batches(
    batches: Iterator["pd.DataFrame"], max_tok: int = 64
) -> Iterator["pd.DataFrame"]:
    import numpy as np
    import pandas as pd

    for pdf in batches:
        ids = pdf["id"].to_numpy()
        # fan out 1..3 events per doc (r <= id % 3)
        reps = (ids % 3 + 1).astype(np.int64)
        doc = np.repeat(ids, reps)
        r = np.concatenate([np.arange(k) for k in reps]) if len(ids) else np.array([], dtype=np.int64)

        src_num = doc % N_SOURCES
        m = (doc * 31 + r * 17) % 20
        op = np.where(m < 14, "Create", np.where(m < 19, "Update", "Delete"))
        bucket = np.where(doc % 10 < 4, 0, doc % 4).astype(np.int32)
        commit_min = (doc * 7 + r * 13) % 100000
        create_min = (doc * 11) % 80000
        s = (doc * 3 + r) % 97
        sign = np.where(s == 0, 1, np.where(s == 1, 0, -1)).astype(np.int32)

        # token payload: length 1..max_tok zipf-ish, values pure arithmetic.
        # Default 64 keeps unit tests fast; benchmarking the north-star
        # corpus shape (pre-tokenized training sequences, 10^2-10^4
        # tokens/row) passes max_tok=1024+ so payload-proportional costs
        # (hex decode, shuffle bytes, parquet encode) dominate realistically.
        n_tok = (1 + (doc * 2654435761) % max_tok).astype(np.int32)
        offs = (doc * 40503 % 32000).astype(np.int64)
        tokens = [
            ((o + np.arange(n, dtype=np.int64) * 97) % 32000).astype(np.int32)
            for o, n in zip(offs, n_tok)
        ]

        out = pd.DataFrame(
            {
                "doc_id": doc.astype(str),
                "doc_num": doc,
                "source": np.char.add("src", src_num.astype(str)),
                "r": r.astype(np.int32),
                "tokens": tokens,
                "n_tok": n_tok,
                "op": op,
                "event_seq": doc * 4 + r,
                "commit_ts": pd.to_datetime(EPOCH_S + commit_min * 60, unit="s"),
                "create_ts": pd.to_datetime(EPOCH_S + create_min * 60, unit="s"),
                "file_id": np.char.add(
                    np.char.add("src", src_num.astype(str)),
                    np.char.add("-f", ((doc // 20) % 5).astype(str)),
                ),
                "bucket": bucket,
                "table_key": np.char.add(
                    np.char.add("src", src_num.astype(str)),
                    np.char.add("#", bucket.astype(str)),
                ),
                "sign": sign,
            }
        )
        out["sign"] = out["sign"].astype("Int32").replace(-1, pd.NA)
        yield out


def generate_corpus(
    spark: SparkSession,
    n_docs: int,
    partitions: int | None = None,
    max_tok: int = 64,
) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism
    if max_tok == 64:
        gen = _gen_batches
    else:
        def gen(batches):
            return _gen_batches(batches, max_tok=max_tok)
    return spark.range(0, n_docs, 1, parts).mapInPandas(gen, GEN_SCHEMA)


def routing_dim(spark: SparkSession, n_sources: int = N_SOURCES) -> DataFrame:
    """Small routing dimension matching corpus.py's routing CTE."""
    rows = []
    for sn in range(n_sources):
        src = f"src{sn}"
        for b in range(4):
            rows.append(
                (
                    f"{src}#{b}",
                    f"inst{b % 2}",
                    f"db_{src}{b % 2 + 1}",
                    f"db_{src}",
                    f"t{b}",
                    f"db_{src}.t{b}",
                    src == "src15" and b == 3,
                )
            )
    return spark.createDataFrame(
        rows,
        "table_key string, db_instance string, database_sharded string, "
        "database_name string, table_name string, route string, ignored boolean",
    )
