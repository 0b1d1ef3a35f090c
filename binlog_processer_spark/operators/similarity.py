"""Similarity search over an embedding column (array<float>).

Training-data-pipeline operators beyond the reference's scope:

- brute-force cosine top-k (the exactness baseline): broadcast the query
  set, score every (query, candidate) with a JVM-side fold — no Python in
  the scoring loop — then per-query top-k via a rank window.
- LSH-bucketed ANN (the scale path): deterministic sign-bucket on fixed
  coordinate hyperplanes; candidates only within the query's bucket, so the
  scored pair count drops by ~2^planes. Recall is traded for fan-in, as in
  any LSH ANN.
- numpy matrix path (`cosine_topk_np`): mapInPandas + one BLAS matmul per
  Arrow batch per query-block — the throughput path when k and the query set
  are larger; same results as the SQL fold (tested), kept out of the oracle
  contract because float summation order differs in the last ulps.

All cosine outputs are reported in basis points (bigint) so Spark and the
DuckDB oracle compare exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate({a}, cast(0.0 as double),"
    " (acc, v) -> acc + cast(v as double) * cast(v as double)))"
)


def cosine_expr(a: str, b: str) -> F.Column:
    dot = DOT.format(a=a, b=b)
    na, nb = NORM.format(a=a), NORM.format(a=b)
    return F.expr(f"({dot}) / nullif(({na}) * ({nb}), 0.0)")


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine for each query id (excluding self).

    Plan shape: broadcast the tiny query set → one shuffle for the per-query
    rank window. Scoring is whole-stage codegen (fold over zip_with).
    """
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        embeddings.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine_bp",
            F.round(cosine_expr("q_emb", "embedding") * 10000).cast("bigint"),
        )
        .select("query_id", "vec_id", "cosine_bp")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_bp").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_bp", "rank")
    )


def sign_bucket_expr(dims: tuple[int, ...] = (1, 8, 21)) -> F.Column:
    """Deterministic LSH bucket: concatenated signs of fixed coordinates
    (coordinate hyperplanes — the deterministic, oracle-computable stand-in
    for random hyperplane projections)."""
    bits = [
        f"CASE WHEN element_at(embedding, {d}) >= 0 THEN '1' ELSE '0' END"
        for d in dims
    ]
    return F.expr("concat(" + ", ".join(bits) + ")")


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: tuple[int, ...] = (1, 8, 21),
) -> DataFrame:
    """ANN: score only candidates sharing the query's sign bucket."""
    emb = embeddings.withColumn("bucket", sign_bucket_expr(dims))
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        emb.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine_bp",
            F.round(cosine_expr("q_emb", "embedding") * 10000).cast("bigint"),
        )
        .select("query_id", "vec_id", "cosine_bp")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_bp").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_bp", "rank")
    )


def near_dup_pairs(
    embeddings: DataFrame,
    threshold_bp: int = 9000,
    dims: tuple[int, ...] = (1, 8, 21),
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (training-data dedup).

    Candidate generation is the same sign-bucket LSH as `cosine_topk_lsh`,
    but as a bucket-keyed *self-join* (shuffle on the bucket key — at scale
    each bucket is a partition, so the scored pair count is sum(b_i^2)/2
    instead of n^2/2). Pairs with cosine >= threshold_bp/10000 are reported
    once (id_a < id_b). Missed cross-bucket pairs are the standard LSH
    recall trade, as in MinHash-LSH text dedup (operators/dedup.py).
    """
    emb = embeddings.withColumn("bucket", sign_bucket_expr(dims))
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    b = emb.select(F.col("vec_id").alias("id_b"), "embedding", "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_bp",
            F.round(cosine_expr("q_emb", "embedding") * 10000).cast("bigint"),
        )
        .filter(F.col("cosine_bp") >= threshold_bp)
        .select("id_a", "id_b", "cosine_bp")
    )


def cosine_topk_np(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """BLAS path: one normalized matmul per Arrow batch, per-batch partial
    top-k, final exact top-k reduce. Scales to wide candidate sets where the
    per-row SQL fold would be slower."""
    import numpy as np

    q_rows = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.embedding for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c = np.array(list(pdf["embedding"]), dtype=np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = q_mat @ c.T  # (nq, nc)
            for qi, qid in enumerate(q_ids):
                s = sims[qi]
                mask = c_ids != qid
                idx = np.argsort(-s[mask])[:k]
                sel_ids = c_ids[mask][idx]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "vec_id": sel_ids,
                        "cosine_bp": np.round(s[mask][idx] * 10000).astype(
                            np.int64
                        ),
                    }
                )

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        score, "query_id bigint, vec_id bigint, cosine_bp bigint"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_bp").desc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_bp", "rank")
    )
