"""Similarity search over an embedding column (array<float>).

Training-data-pipeline operators beyond the reference's scope:

- brute-force cosine top-k (the exactness baseline): broadcast the query
  set, score every (query, candidate) with a JVM-side fold — no Python in
  the scoring loop — then per-query top-k via a rank window.
- LSH-bucketed ANN (the scale path): banded sign-LSH over deterministic
  Rademacher (±1) hyperplanes; candidates share ≥1 full band of r sign bits
  (recall 1−(1−p^r)^b), and the band width scales with corpus size
  (``planes_for``) so the bucket self-join stays ~linear at any n.
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

from ._cache import pin

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


DEFAULT_PLANES = 32
DEFAULT_BANDS = 4


def embedding_qa(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-column hygiene report — the gate an ANN/semantic-dedup
    stage runs BEFORE building any index, since one NaN or zero vector
    silently poisons every cosine it touches: per-vector dimension, NaN
    and exact-zero element counts, L2 norm in fixed-point basis points
    (NULL when NaN-poisoned), and the final usability verdict.

    Pure codegen (higher-order array folds, one projection, no UDF, no
    shuffle) — a map-only pass that pipelines into the index build at any
    scale. Norm uses the same left-fold + round(·1e4) fixed-point as the
    ANN score gates, so it is engine-reproducible.
    """
    e = f"cast({vec_col} as array<double>)"
    n_nan = F.expr(f"size(filter({e}, x -> isnan(x)))").cast("bigint")
    n_zero = F.expr(f"size(filter({e}, x -> x = 0.0d))").cast("bigint")
    norm = NORM.format(a=e)
    return embeddings.select(
        "vec_id",
        F.expr(f"size({e})").cast("int").alias("dim"),
        n_nan.alias("n_nan"),
        n_zero.alias("n_zero"),
        F.when(
            n_nan > 0, F.lit(None).cast("bigint")
        )
        .otherwise(F.expr(f"cast(round(({norm}) * 10000) as bigint)"))
        .alias("norm_bp"),
        # CASE-guarded: NaN must never reach the bigint cast (engines
        # disagree on casting NaN — Spark saturates, DuckDB errors), and a
        # NULL vector must come out False, not NULL — a three-valued
        # verdict slips through every `filter(~usable)` downstream
        F.when(F.col(vec_col).isNull() | (n_nan > 0), F.lit(False))
        .otherwise(F.expr(f"cast(round(({norm}) * 10000) as bigint) > 0"))
        .alias("usable"),
    )


def rademacher_planes(
    n_planes: int, dim: int, seed: str = "signlsh-v2"
) -> list[list[int]]:
    """Deterministic ±1 (Rademacher) random hyperplanes, seeded by md5 —
    the same constants are inlined into the Spark expression and the DuckDB
    oracle, so both engines compute identical sign signatures. Unlike the
    round-1 fixed-coordinate planes, the plane count is unbounded (not
    capped by the embedding dimension), so the signature width can scale
    with the corpus (``planes_for``)."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"{seed}:{k}:{i}".encode()).digest()[0] % 2
            else -1
            for i in range(dim)
        ]
        for k in range(n_planes)
    ]


def planes_for(n: int, bands: int = DEFAULT_BANDS) -> int:
    """Scale the signature with the corpus: band width r ≈ log2(n) − 2 keeps
    the expected band-bucket size near 2^2 = 4 docs, so the per-band
    self-join stays ~linear (Σ b_i² ≈ n · bucket_size) as n grows — the
    100 TB posture the fixed 8-bucket scheme lacked."""
    import math

    r = max(4, math.ceil(math.log2(max(n, 2))) - 2)
    return bands * r


def sign_signature_expr(
    n_planes: int = DEFAULT_PLANES, dim: int = 64, col: str = "embedding"
) -> F.Column:
    """'0'/'1' signature string: bit k = sign of dot(embedding, plane_k).

    Pure codegen (fold over zip_with with literal ±1 arrays) — shuffle-free,
    no Python in the loop."""
    bits = []
    for plane in rademacher_planes(n_planes, dim):
        arr = ", ".join(f"{c}D" for c in plane)
        bits.append(
            f"CASE WHEN aggregate(zip_with({col}, array({arr}),"
            " (x, h) -> cast(x as double) * h), 0D, (a, v) -> a + v) >= 0"
            " THEN '1' ELSE '0' END"
        )
    return F.expr("concat(" + ", ".join(bits) + ")")


def duck_sign_signature(
    n_planes: int = DEFAULT_PLANES, dim: int = 64, col: str = "embedding"
) -> str:
    """DuckDB twin of ``sign_signature_expr`` (identical plane constants)."""
    bits = []
    for plane in rademacher_planes(n_planes, dim):
        arr = ", ".join(str(float(c)) for c in plane)
        bits.append(
            f"CASE WHEN list_dot_product(cast({col} AS double[]), [{arr}])"
            " >= 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


def _banded(sig_df: DataFrame, n_planes: int, bands: int) -> DataFrame:
    """(vec_id, band_id, band): unpivot the signature into per-band slices.

    persist(): the band relation is tiny (n × bands) but downstream
    self-joins/broadcasts would otherwise duplicate the n_planes-wide dot
    -product expression tree into every branch (driver codegen blowup —
    same fix as dedup.minhash_lsh_pairs)."""
    if bands < 1 or bands > n_planes or n_planes % bands != 0:
        # r = 0 would make every band slice empty → constant band hash →
        # all-pairs degeneration (same guard as dedup.minhash_bands)
        raise ValueError(
            f"bands ({bands}) must divide n_planes ({n_planes})"
            " and be in [1, n_planes]"
        )
    r = n_planes // bands
    # plan-size persist, registered for caller-driven cleanup (_cache.unpin_all)
    return pin(
        sig_df.selectExpr(
            "vec_id",
            "stack({n}, {args}) as (band_id, band)".format(
                n=bands,
                args=", ".join(
                    f"{b}, substring(sig, {b * r + 1}, {r})"
                    for b in range(bands)
                ),
            ),
        )
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = DEFAULT_PLANES,
    bands: int = DEFAULT_BANDS,
    dim: int = 64,
) -> DataFrame:
    """ANN: score only candidates sharing ≥1 signature band with the query
    (banded multi-probe sign-LSH — recall 1−(1−p^r)^b instead of the single
    all-bits bucket's p^planes)."""
    emb = embeddings.select("vec_id", "embedding")
    sig = emb.withColumn("sig", sign_signature_expr(n_planes, dim))
    stacked = _banded(sig, n_planes, bands)
    q_stacked = stacked.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "band_id", "band"
    )
    cand = (
        stacked.join(
            F.broadcast(q_stacked),
            ["band_id", "band"],
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    q_emb = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q_emb), "query_id")
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
    n_planes: int = DEFAULT_PLANES,
    bands: int = DEFAULT_BANDS,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (training-data dedup).

    Banded sign-LSH self-join: docs sharing any full band of
    r = n_planes/bands sign bits become candidates; candidates are scored
    exactly and thresholded. The per-band join key has 2^r values, so the
    scored pair count is bands · Σ b_i² ≈ bands · n²/2^r — with
    ``n_planes = planes_for(n)`` the expected bucket size is constant and
    the join stays ~linear in n (vs the round-1 fixed 8-bucket scheme's
    n²/8). Pairs report once (id_a < id_b); cross-band misses are the
    standard LSH recall trade (1−(1−p^r)^b at similarity p per bit).
    """
    emb = embeddings.select("vec_id", "embedding")
    sig = emb.withColumn("sig", sign_signature_expr(n_planes, dim))
    stacked = _banded(sig, n_planes, bands)
    l, r_ = stacked.alias("l"), stacked.alias("r")
    cand = (
        l.join(
            r_,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("id_a"), F.col("r.vec_id").alias("id_b")
        )
        .distinct()
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cosine_bp",
            F.round(cosine_expr("emb_a", "emb_b") * 10000).cast("bigint"),
        )
        .filter(F.col("cosine_bp") >= threshold_bp)
        .select("id_a", "id_b", "cosine_bp")
    )


def _sim_fp(a: str, b: str) -> F.Column:
    """Cosine similarity in fixed-point (1e-7 resolution, bigint) — ranking
    on the ROUNDED value keeps Spark/DuckDB argmax decisions identical even
    when raw doubles differ in the last ulp."""
    return F.round(cosine_expr(a, b) * 10_000_000).cast("bigint")


def ivf_centroids(embeddings: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic IVF 'training': the n vectors with the smallest
    md5(vec_id) act as centroids — a uniform pseudo-random sample both
    engines compute identically (a k-means refinement would drop in here;
    the partition/probe dataflow is unchanged by centroid quality)."""
    return (
        embeddings.select("vec_id", "embedding")
        .withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
        )
    )


def ivf_assignments(
    embeddings: DataFrame,
    centroids: DataFrame,
    keep_embedding: bool = False,
) -> DataFrame:
    """(vec_id, centroid_id): nearest centroid by cosine.

    The centroid set is tiny and driver-known (``ivf_centroids`` LIMITs to
    n_centroids), so the argmax is inlined as ONE codegen expression over
    literal centroid arrays — the ``sign_signature_expr`` technique — instead
    of the former broadcast ×k explode + per-vector window, which shuffled
    n×k rows WITH their embedding payloads (16× the corpus through an
    Exchange at 10^9 vectors). Zero Exchange in this subplan; arithmetic is
    bit-identical to the former column version (same fold order, same
    1e-7 fixed-point rounding), so argmax decisions — and the DuckDB oracle
    match — are unchanged. Ties break to the lowest centroid_id via the
    (sim, -centroid_id) struct max.

    Plan-size note: the centroid matrix enters the plan as ONE literal
    array-of-arrays walked by ``transform`` over an index ``sequence`` —
    k inlined per-centroid fold trees made the expression tree O(k·d) nodes,
    and every downstream re-optimization (top-k window, AQE stages)
    re-canonicalized it: measured 52 s of driver time to plan a 50-row
    window at k=16, d=64. Constant-size tree ⇒ constant plan cost at any
    k·d. Centroid norms are precomputed driver-side with the same
    sequential double fold as the NORM SQL template (bit-identical IEEE
    op order), so argmax decisions — and the DuckDB oracle match — are
    unchanged."""
    import math

    cents = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["c_emb"]])
        for r in centroids.collect()
    )
    k = len(cents)
    mat = "array(" + ", ".join(
        "array(" + ", ".join(f"{x!r}D" for x in c) + ")" for _, c in cents
    ) + ")"
    ids = "array(" + ", ".join(f"{cid}L" for cid, _ in cents) + ")"
    norms = "array(" + ", ".join(
        f"{math.sqrt(sum(x * x for x in c))!r}D" for _, c in cents
    ) + ")"
    dot = DOT.format(a="embedding", b=f"element_at({mat}, i)")
    pick = F.expr(
        f"-(array_max(transform(sequence(1, {k}), i -> named_struct("
        f"'s', cast(round((({dot}) / nullif(__ne * element_at({norms}, i),"
        " 0.0)) * 10000000) as bigint),"
        f" 'nc', -element_at({ids}, i)))).nc)"
    )
    cols = ["vec_id", "centroid_id"] + (
        ["embedding"] if keep_embedding else []
    )
    return (
        embeddings.select("vec_id", "embedding")
        .withColumn("__ne", F.expr(NORM.format(a="embedding")))
        .withColumn("centroid_id", pick)
        .select(*cols)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF ANN: exact search restricted to the ``n_probe`` closest centroid
    partitions per query — candidates shrink to ~n·n_probe/n_centroids.
    At scale the assignment is computed once and the candidate fetch is a
    join on centroid_id (a balanced, low-cardinality key); only candidates
    are scored exactly. ``refine_iters > 0`` runs that many Lloyd rounds
    (``kmeans_refine``) on the seeded centroids first — better-centered
    partitions raise recall at the same n_probe, at one corpus scan per
    round (the fixed-point mean canon keeps refined variants
    deterministic and oracle-gated)."""
    from ._cache import pin

    emb = embeddings.select("vec_id", "embedding")
    cent = ivf_centroids(emb, n_centroids)
    if refine_iters > 0:
        cent = kmeans_refine(emb, cent, n_iters=refine_iters)
    # pin = the INDEX BUILD: materializing the assignment ends the literal
    # centroid expression's lineage here, so the query side composes against
    # a short InMemoryRelation. Without it, every downstream operator that
    # re-optimizes the plan (the top-k window, AQE stages) re-canonicalizes
    # the k×d-literal tree — measured 52s of driver time for a 50-row window
    # at sf0.1 vs 4s pinned. A production IVF stores the assignment as a
    # table for the same reason: build once, probe many.
    assign = pin(ivf_assignments(emb, cent))
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    wq = Window.partitionBy("query_id").orderBy(
        _sim_fp("q_emb", "c_emb").desc(), F.col("centroid_id")
    )
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q), "query_id")
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


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """(index, centroids): the build half of build-once/probe-many IVF.

    ``index`` is the inverted-list layout — (vec_id, centroid_id,
    embedding), embedding kept IN-ROW so probes never join back to the
    corpus. Persist it partitioned by ``centroid_id`` (jobs/run_index.py
    does) and a probe touches only its ``n_probe`` lists; everything else
    stays on disk. Incremental ingest is ``ivf_assignments(new_batch,
    centroids)`` appended to the same table — the centroids are frozen,
    so old lists never rewrite."""
    emb = embeddings.select("vec_id", "embedding")
    cent = ivf_centroids(emb, n_centroids)
    if refine_iters > 0:
        cent = kmeans_refine(emb, cent, n_iters=refine_iters)
    return ivf_assignments(emb, cent, keep_embedding=True), cent


def ivf_probe(
    index: DataFrame,
    centroids: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k by cosine against a PERSISTED IVF index — the probe half.

    Same scoring math as ``ivf_topk`` (same 1e-7 fixed-point centroid
    ranking, same basis-point rounding, same tie order), so probing a
    materialized index returns bit-identical rows to computing the index
    inline — pinned by tests and by the shared DuckDB oracle. The
    embedding rides in the index row, so the only joins are two
    broadcasts (queries × centroids, probes × lists); candidate volume
    is ~n·n_probe/n_centroids of the corpus, and a centroid-partitioned
    index prunes every unprobed list at the file level."""
    q = index.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        _sim_fp("q_emb", "c_emb").desc(), F.col("centroid_id")
    )
    probes = (
        q.join(F.broadcast(centroids.select("centroid_id", "c_emb")))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "q_emb", "centroid_id")
    )
    scored = (
        F.broadcast(probes)
        .join(index, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine_bp",
            F.round(cosine_expr("q_emb", "embedding") * 10000).cast(
                "bigint"
            ),
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


def quantize_expr(col: str = "embedding") -> F.Column:
    """Symmetric int8 quantization of a float vector as ONE codegen
    expression: per-vector scale ``max|x|/127``, elements
    ``round(x/scale)`` in [-127, 127] (zero vectors quantize to zeros).

    The point at corpus scale is the SCAN: an int8 embedding column is
    4x fewer bytes than float32 off parquet and through every shuffle —
    quantize once at ingest, run candidate generation on the int8 column,
    and re-score survivors against the float column if exactness matters.
    """
    s = f"(aggregate({col}, 0D, (m, x) -> greatest(m, abs(cast(x as double)))) / 127.0D)"
    # tinyint, not int: elements are in [-127, 127] by construction, and a
    # 4-byte element type would silently forfeit the whole 4x-bytes claim
    return F.expr(
        f"CASE WHEN {s} = 0.0D THEN transform({col}, x -> cast(0 as tinyint))"
        f" ELSE transform({col},"
        f" x -> cast(round(cast(x as double) / {s}) as tinyint)) END"
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """(vec_id, q) with ``q`` the int8-range quantized vector."""
    return embeddings.select(
        "vec_id", quantize_expr("embedding").alias("q")
    )


def cosine_topk_int8(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Brute-force top-k over the QUANTIZED vectors — same plan shape as
    ``cosine_topk`` (broadcast queries, codegen fold, one rank-window
    shuffle), but the scan and the fold move int8-range ints.

    Exactness note: the integer dot and squared norms are exact in
    doubles (|q|<=127, d<=2^20 keeps every partial sum under 2^53), so
    unlike the float paths the quantized score has NO fold-order
    sensitivity — Spark and any oracle agree bit-for-bit by
    construction; the only approximation is quantization itself.
    """
    qd = quantize_embeddings(embeddings)
    q = qd.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("q_q")
    )
    scored = (
        qd.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine_bp",
            F.round(cosine_expr("q_q", "q") * 10000).cast("bigint"),
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


def _round_half_away(x: float) -> int:
    """Round-half-away-from-zero — the rounding canon Spark round() and
    DuckDB round() share; Python's built-in round() is half-to-even and
    would diverge from both on exact .5 boundaries. Implemented via an
    exact fractional comparison rather than ``floor(x + 0.5)``, whose
    addition can round up across the boundary (e.g. the largest double
    below 0.5) and disagree with both engines."""
    import math

    a = math.floor(abs(x))
    r = a + 1 if abs(x) - a >= 0.5 else a
    return int(r) if x >= 0 else -int(r)


MEAN_FP_SCALE = 10_000_000  # 1e-7 centroid-component grain


def kmeans_refine(
    embeddings: DataFrame, centroids: DataFrame, n_iters: int = 3
) -> DataFrame:
    """Distributed spherical-k-means (Lloyd) refinement of an IVF
    centroid set — the refinement step ``ivf_centroids`` reserves a slot
    for.

    Each round: (1) nearest-centroid assignment by cosine via the
    zero-Exchange literal-matrix argmax (``ivf_assignments``, embedding
    kept in-row); (2) per-cluster FIXED-POINT mean: each component is
    rounded to the 1e-7 grain and summed as a bigint — integer sums are
    associative/commutative, so the aggregate is EXACTLY the same on any
    partitioning, any cluster size, any engine (the float-``avg``
    predecessor depended on partial-combine order); d sum columns ride
    ONE hash groupBy with map-side combine, so the shuffle carries
    k × tasks partial rows, never vectors; (3) the k×d result (tiny by
    construction) collects to the driver, the mean lands back on the
    1e-7 grain (``_round_half_away(sum/cnt)``), and re-enters the next
    round as a fresh literal matrix — the collect truncates lineage
    every round, the same posture as connected_components'
    localCheckpoint. Empty clusters keep their previous centroid
    (standard Lloyd). Cost per round: one corpus scan plus one bounded
    aggregate; ``n_iters`` is fixed — the production knob, since each
    extra round is a full scan.

    The fixed-point canon makes refined centroids a pure function of
    the corpus, so queries built on the refinement carry full DuckDB
    value-hash oracles (the chained per-round CTE replay in
    ``__spark_entry__``); the numpy-tolerance and quality gates in
    tests/test_kmeans.py still pin the semantics.
    """
    spark = centroids.sparkSession
    old = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["c_emb"]])
        for r in centroids.collect()
    )
    if not old:
        raise ValueError("kmeans_refine: empty centroid set")
    d = len(old[0][1])
    cents = centroids
    for _ in range(n_iters):
        asg = ivf_assignments(embeddings, cents, keep_embedding=True)
        sums = asg.groupBy("centroid_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            *[
                F.sum(
                    F.round(
                        F.col("embedding")[i].cast("double") * MEAN_FP_SCALE
                    ).cast("bigint")
                ).alias(f"s{i}")
                for i in range(d)
            ],
        )
        new = {
            int(r["centroid_id"]): [
                _round_half_away(r[f"s{i}"] / r["cnt"]) / MEAN_FP_SCALE
                for i in range(d)
            ]
            for r in sums.collect()
        }
        old = [(cid, new.get(cid, emb)) for cid, emb in old]
        cents = spark.createDataFrame(
            old, schema="centroid_id bigint, c_emb array<double>"
        )
    return cents


def kmeans_quality(
    embeddings: DataFrame, centroids: DataFrame
) -> DataFrame:
    """One-row clustering-quality report: mean cosine similarity (in
    basis points) of every vector to its assigned centroid, plus the
    live-cluster count — one assignment scan, one global aggregate.

    The mean rides the fixed-point canon: per-vector similarity rounds
    to the 1e-7 grain (bigint) BEFORE the sum, so the aggregate is
    order-independent and the published mean_sim_bp is a pure function
    of the corpus — oracle-gated, like ``kmeans_refine``."""
    asg = ivf_assignments(embeddings, centroids, keep_embedding=True)
    cmap = {
        int(r["centroid_id"]): [float(x) for x in r["c_emb"]]
        for r in centroids.collect()
    }
    c_emb = F.element_at(
        F.expr(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{x!r}D" for x in emb) + ")"
                for _, emb in sorted(cmap.items())
            )
            + ")"
        ),
        F.expr(
            "array_position(array("
            + ", ".join(f"{cid}L" for cid in sorted(cmap))
            + "), centroid_id)"
        ).cast("int"),
    )
    return (
        asg.withColumn("__c", c_emb)
        .select(
            F.round(cosine_expr("embedding", "__c") * MEAN_FP_SCALE)
            .cast("bigint")
            .alias("sim_fp"),
            "centroid_id",
        )
        .agg(
            F.sum("sim_fp").cast("bigint").alias("__ssim"),
            F.count_distinct("centroid_id").alias("live_clusters"),
            F.count(F.lit(1)).cast("bigint").alias("vectors"),
        )
        .select(
            F.round(
                (F.col("__ssim").cast("double") / F.col("vectors")) / 1000.0
            )
            .cast("bigint")
            .alias("mean_sim_bp"),
            "live_clusters",
            "vectors",
        )
    )


def centroids_for(n: int, target_cluster: int = 1024) -> int:
    """Centroid count for ``semdedup_pairs`` at corpus size ``n``: keep
    the expected cluster size near ``target_cluster`` so the within-
    cluster self-join stays ~n·target pairs (linear in n), the same
    budget rule ``planes_for`` applies to the LSH path."""
    return max(4, n // target_cluster)


def semdedup_pairs(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold_bp: int = 9000,
) -> DataFrame:
    """SemDeDup-style cluster-scoped embedding near-duplicate pairs
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): cluster the embeddings, then score
    pairs ONLY within a cluster — near-duplicates land in the same
    cluster because they are near the same centroid.

    Complements ``near_dup_pairs`` (banded sign-LSH): LSH misses are
    probabilistic per band, SemDeDup misses are exactly the pairs split
    across a cluster boundary — the published trade, chosen when the
    corpus is already being clustered for curation anyway.

    Plan: nearest-centroid assignment is the zero-shuffle codegen argmax
    (``ivf_assignments``, embedding kept in-row so no re-join); the ONE
    shuffle is the self-join's hash partition on ``centroid_id``. Size
    ``n_centroids`` with ``centroids_for(n)`` — expected cluster size
    n/k, so candidate pairs ~ n·(n/k): constant k is quadratic, k ∝ n is
    linear. Low-cardinality-key skew at small k disappears under the
    same rule (k ∝ n ⇒ keys ≫ cores).
    """
    from ._cache import pin

    emb = embeddings.select("vec_id", "embedding")
    cent = ivf_centroids(emb, n_centroids)
    # pin: the assignment feeds BOTH sides of the self-join — without it
    # the k×d centroid-literal tree is inlined twice and re-canonicalized
    # by every downstream optimization pass (the ivf_topk 52s-planning
    # case); pinned, the join composes against a short InMemoryRelation
    tagged = pin(ivf_assignments(emb, cent, keep_embedding=True))
    l = tagged.select(
        F.col("vec_id").alias("id_a"),
        F.col("centroid_id").alias("cid"),
        F.col("embedding").alias("emb_a"),
    )
    r = tagged.select(
        F.col("vec_id").alias("id_b"),
        F.col("centroid_id").alias("cid"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        l.join(r, ["cid"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_bp",
            F.round(cosine_expr("emb_a", "emb_b") * 10000).cast("bigint"),
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
    out_schema = "query_id bigint, vec_id bigint, cosine_bp bigint"
    if not q_rows:
        # np.linalg.norm(axis=1) on the empty 1-D array raises; the SQL
        # paths return an empty frame for a no-match query set — match them
        empty = embeddings.sparkSession.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(1).cast("int")).limit(0)

    def _safe_norms(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        # zero-norm vectors: dividing yields NaN scores whose int64 cast is
        # garbage (INT64_MIN); leave them as zero vectors → cosine 0
        n[n == 0.0] = 1.0
        return n

    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.embedding for r in q_rows], dtype=np.float64)
    q_mat /= _safe_norms(q_mat)

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c = np.array(list(pdf["embedding"]), dtype=np.float64)
            c /= _safe_norms(c)
            sims = q_mat @ c.T  # (nq, nc)
            for qi, qid in enumerate(q_ids):
                s = sims[qi]
                mask = c_ids != qid
                # the partial top-k must select under EXACTLY the final
                # window's total order — (cosine_bp DESC, vec_id ASC), on
                # the ROUNDED score — so batch-partial + global reduce
                # equals the global top-k. Sorting by the raw float here
                # is wrong: two candidates that round to the same bp can
                # straddle the batch's k-cut in raw-score order, dropping
                # the one the final/oracle ordering ranks first (caught by
                # the sf0.1 oracle sweep: one rank flip in 100).
                bp = np.round(s[mask] * 10000).astype(np.int64)
                idx = np.lexsort((c_ids[mask], -bp))[:k]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "vec_id": c_ids[mask][idx],
                        "cosine_bp": bp[idx],
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


def topk_recall(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Recall@k of an approximate ANN ranking against the exact one:
    per query, the fraction (basis points) of the exact top-k the
    approximate method recovered. The acceptance gate every ANN
    deployment needs before swapping the brute-force path out — run it
    on a sampled query set whenever planes/centroids/probe parameters
    change.

    Inputs are the (query_id, vec_id, rank) outputs of ``cosine_topk``
    (exact arm) and any approximate arm (``cosine_topk_lsh`` /
    ``ivf_topk`` / ``cosine_topk_int8``). Both are top-k results —
    n_queries × k rows, orders of magnitude below the corpus — so the
    hit join is a join of two SMALL relations; nothing here rescans
    embeddings. The denominator is the per-query EXACT result size
    (≤ k: a small corpus or an id-excluding query yields fewer), so a
    method that returns everything available still scores 10000, and
    queries the approximate arm missed entirely score 0 (left join,
    not inner).
    """
    e = exact.filter(F.col("rank") <= k).select("query_id", "vec_id")
    a = approx.filter(F.col("rank") <= k).select("query_id", "vec_id")
    hits = (
        a.join(e, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        e.groupBy("query_id")
        .agg(F.count("*").alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.floor(
                F.coalesce(F.col("hits"), F.lit(0))
                * 10000
                / F.col("n_exact")
            )
            .cast("bigint")
            .alias("recall_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product quantization for
# nearest neighbor search")
# ---------------------------------------------------------------------------


def pq_codebooks(
    embeddings: DataFrame, m: int = 4, ks: int = 8
) -> tuple[list[list[list[float]]], int]:
    """Deterministic PQ 'training': split the (L2-normalized) vector into
    ``m`` subspaces; subspace ``j``'s codebook is the j-th slice of the
    ``ks`` seed vectors with the smallest md5(vec_id) — the same uniform
    pseudo-random seeding as ``ivf_centroids``, so the DuckDB oracle
    rebuilds every codeword (code = md5-order rank). A per-subspace
    ``kmeans_refine`` would drop in here; the encode/ADC dataflow is
    unchanged by codeword quality (refined variants would be rows-only,
    like ``ann_ivf_refined``).

    Returns ``(books, dsub)`` with ``books[j][code]`` the dsub-dim
    codeword. Normalization uses the same sequential double fold as the
    NORM SQL template, so codewords are IEEE-identical across engines up
    to the fixed-point rounding the distances apply anyway.
    """
    import math

    rows = (
        embeddings.select("vec_id", "embedding")
        .withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(ks)
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks: empty embeddings")
    d = len(rows[0]["embedding"])
    if d % m != 0:
        raise ValueError(f"pq_codebooks: m={m} must divide dim {d}")
    dsub = d // m
    units = []
    for r in rows:
        x = [float(v) for v in r["embedding"]]
        n = math.sqrt(sum(v * v for v in x))
        units.append([v / n for v in x])
    books = [
        [u[j * dsub:(j + 1) * dsub] for u in units] for j in range(m)
    ]
    return books, dsub


def _pq_unit(col: str = "embedding") -> F.Column:
    """L2-normalized copy of the vector (element-wise divide — no fold,
    so it is IEEE-identical in any engine)."""
    return F.expr(
        f"transform({col}, x -> cast(x as double) / {NORM.format(a=col)})"
    )


def _pq_d2_fp(u: str, book: list[list[float]], off: int, dsub: int) -> str:
    """SQL fragment: for each code c, the fixed-point (1e7-rounded)
    squared L2 distance of ``u``'s subspace slice to codeword c —
    returned as an array indexed by c+1. Squared-diff fold matches the
    oracle's algebraic form within far less than the rounding grain."""
    mat = "array(" + ", ".join(
        "array(" + ", ".join(f"{x!r}D" for x in cw) + ")" for cw in book
    ) + ")"
    diff = (
        f"(element_at({u}, {off} + i) - element_at(cw, i))"
    )
    d2 = (
        f"aggregate(sequence(1, {dsub}), cast(0.0 as double),"
        f" (acc, i) -> acc + {diff} * {diff})"
    )
    return (
        f"transform({mat}, cw -> cast(round(({d2}) * 10000000) as bigint))"
    )


def pq_encode(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    dsub: int,
) -> DataFrame:
    """(vec_id, codes): each vector compressed to ``m`` codebook indices
    — nearest codeword per subspace by squared L2 on the normalized
    vector, ties to the lowest code. One codegen projection, ZERO
    Exchange (the codebooks ride as literal arrays, the
    ``ivf_assignments`` technique); at 10^12 vectors the encode is a
    map-only scan and the output is m small ints per vector — the 16-64x
    compression that makes the ADC scan affordable.
    """
    ks = len(books[0])
    code_exprs = []
    for j, book in enumerate(books):
        d2s = _pq_d2_fp("__u", book, j * dsub, dsub)
        # argmin via struct max over (-d2, -code): max(-d2) = min d2,
        # then max(-code) = lowest code on ties
        code_exprs.append(
            f"-(array_max(transform(sequence(1, {ks}), c -> named_struct("
            f"'s', -element_at(__d2_{j}, c), 'nc', -(c - 1)))).nc)"
        )
    out = embeddings.select("vec_id", "embedding").withColumn(
        "__u", _pq_unit("embedding")
    )
    for j, book in enumerate(books):
        out = out.withColumn(
            f"__d2_{j}", F.expr(_pq_d2_fp("__u", book, j * dsub, dsub))
        )
    return out.select(
        "vec_id",
        F.expr(
            "array(" + ", ".join(code_exprs) + ")"
        ).alias("codes"),
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 4,
    ks: int = 8,
) -> DataFrame:
    """PQ ANN by asymmetric distance computation (ADC): rank corpus
    vectors by the sum over subspaces of the (fixed-point) squared L2
    distance between the QUERY's subspace slice and the corpus vector's
    CODEWORD. On unit vectors L2² is monotone with cosine, so this
    approximates the cosine ranking through an m·ks-entry lookup table
    per query — the corpus is touched only through its codes.

    Output: (query_id, vec_id, adc_fp, rank) with ``adc_fp`` the integer
    ADC distance (sum of 1e7-rounded per-subspace entries — integer, so
    cross-engine exact) ranked ascending, ties to the lowest vec_id.

    Scale posture: the scored relation is codes (m ints/vector) x
    queries — the ADC scan PQ exists for; the per-query LUT rides as
    driver-built rows (queries x m x ks bigints). At 10^9+ vectors
    compose with IVF (encode residuals per inverted list) — the
    dataflow here is the ADC half of that standard IVFADC pipeline.
    """
    import math

    books, dsub = pq_codebooks(embeddings, m=m, ks=ks)
    codes = pq_encode(embeddings, books, dsub)
    q = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    spark = embeddings.sparkSession
    lut_rows = []
    for r in q:
        x = [float(v) for v in r["embedding"]]
        n = math.sqrt(sum(v * v for v in x))
        u = [v / n for v in x]
        # _round_half_away, NOT Python round(): the driver LUT must
        # share the half-away-from-zero canon of pq_encode's Spark
        # round() and the oracle's DuckDB round() — Python's built-in
        # is half-to-even and would diverge on exact .5 boundaries
        lut = [
            [
                _round_half_away(
                    sum(
                        (u[j * dsub + i] - cw[i]) ** 2
                        for i in range(dsub)
                    )
                    * 10000000
                )
                for cw in books[j]
            ]
            for j in range(m)
        ]
        lut_rows.append((int(r["vec_id"]), lut))
    luts = spark.createDataFrame(
        lut_rows, schema="query_id bigint, lut array<array<bigint>>"
    )
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(
                f"aggregate(sequence(1, {m}), cast(0 as bigint),"
                " (acc, j) -> acc + element_at(element_at(lut, j),"
                " element_at(codes, j) + 1))"
            ).alias("adc_fp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_fp").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_fp", "rank")
    )


# ---------------------------------------------------------------------------
# IVFADC (Jégou et al. 2011 §IV): coarse IVF quantizer + PQ on the
# RESIDUALS, probed by per-list ADC — the standard 10^9-vector ANN
# composition SURVEY's scale plan names. The two halves above (ivf_*,
# pq_*) are composed, not duplicated.
# ---------------------------------------------------------------------------


def _unit(x: list[float]) -> list[float]:
    """Driver-side L2 normalize with the same sequential fold as the
    NORM SQL template (bit-identical IEEE op order)."""
    import math

    n = math.sqrt(sum(v * v for v in x))
    return [v / n for v in x]


def ivfadc_encode(
    embeddings: DataFrame,
    centroids: DataFrame,
    books: list[list[list[float]]],
    dsub: int,
) -> DataFrame:
    """(vec_id, centroid_id, codes): assign each vector to its coarse
    centroid (cosine argmax, the ivf canon) and PQ-encode the RESIDUAL
    ``u − c_u`` (normalized vector minus normalized centroid) against
    per-subspace residual codebooks.

    ONE zero-Exchange codegen projection: the assignment argmax, the
    centroid-unit lookup, the element-wise residual, and the m argmin
    folds all ride literal arrays (the ivf_assignments / pq_encode
    technique) — at 10^12 vectors this is a map-only scan emitting
    centroid_id + m small ints per vector.
    """
    asg = ivf_assignments(embeddings, centroids, keep_embedding=True)
    cmap = {
        int(r["centroid_id"]): _unit([float(x) for x in r["c_emb"]])
        for r in centroids.collect()
    }
    cu = F.element_at(
        F.expr(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{x!r}D" for x in emb) + ")"
                for _, emb in sorted(cmap.items())
            )
            + ")"
        ),
        F.expr(
            "array_position(array("
            + ", ".join(f"{cid}L" for cid in sorted(cmap))
            + "), centroid_id)"
        ).cast("int"),
    )
    ks = len(books[0])
    m = len(books)
    # ONE constant-size expression, the ivf_assignments plan-size lesson
    # taken further: all m codebooks enter as a single 3-level literal
    # walked by NESTED transforms (j -> c -> i), so the generated code
    # is O(1) in m·ks·dsub. The first cut unrolled m=32 per-subspace
    # columns (each with its own 16x2 literal matrix) and spent 17 s of
    # the 22 s query in whole-stage-codegen COMPILATION of the unrolled
    # function — the arithmetic itself is milliseconds. Fold order per
    # subspace is the same sequential (acc + d*d) as _pq_d2_fp, so
    # distances are bit-identical to the unrolled form and the oracle.
    books_lit = "array(" + ", ".join(
        "array(" + ", ".join(
            "array(" + ", ".join(f"{x!r}D" for x in cw) + ")"
            for cw in book
        ) + ")"
        for book in books
    ) + ")"
    diff = (
        f"(element_at(__r, (j - 1) * {dsub} + i)"
        f" - element_at(element_at(element_at({books_lit}, j), c), i))"
    )
    d2 = (
        f"aggregate(sequence(1, {dsub}), cast(0.0 as double),"
        f" (acc, i) -> acc + {diff} * {diff})"
    )
    codes = (
        f"transform(sequence(1, {m}), j ->"
        f" -(array_max(transform(sequence(1, {ks}), c -> named_struct("
        f"'s', -cast(round(({d2}) * 10000000) as bigint),"
        " 'nc', -(c - 1)))).nc))"
    )
    return (
        asg.withColumn("__u", _pq_unit("embedding"))
        .withColumn("__cu", cu)
        .withColumn("__r", F.expr("zip_with(__u, __cu, (x, y) -> x - y)"))
        .select(
            "vec_id",
            "centroid_id",
            F.expr(codes).alias("codes"),
        )
    )


def ivfadc_books(
    embeddings: DataFrame,
    centroids: DataFrame,
    m: int = 4,
    ks: int = 8,
    n_skip: int = 0,
) -> tuple[list[list[list[float]]], int]:
    """Deterministic residual codebooks: ks seed vectors in md5(vec_id)
    order (the pq_codebooks seeding), each taken as its RESIDUAL against
    its own assigned centroid — so codewords live in the residual space
    the encoder quantizes. ``n_skip`` skips the first md5-order rows:
    the COARSE centroids are drawn from the same order, and a seed that
    is itself a centroid has a ~zero residual — ks such seeds would
    collapse the codebook into ks copies of the origin and ADC could not
    rank anything (callers pass n_skip=n_centroids). The seed assignment
    is read back from the Spark assignment itself (a ks-row bounded
    collect), so the books inherit the exact argmax canon."""
    import math

    seeds = (
        embeddings.select("vec_id", "embedding")
        .withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(int(n_skip) + ks)
        .offset(int(n_skip))
    )
    asg = ivf_assignments(seeds, centroids, keep_embedding=True)
    cmap = {
        int(r["centroid_id"]): _unit([float(x) for x in r["c_emb"]])
        for r in centroids.collect()
    }
    rows = sorted(
        asg.collect(),
        key=lambda r: (
            __import__("hashlib").md5(str(int(r["vec_id"])).encode())
            .hexdigest(),
            int(r["vec_id"]),
        ),
    )
    if not rows:
        raise ValueError("ivfadc_books: empty embeddings")
    d = len(rows[0]["embedding"])
    if d % m != 0:
        raise ValueError(f"ivfadc_books: m={m} must divide dim {d}")
    dsub = d // m
    residuals = []
    for r in rows:
        u = _unit([float(v) for v in r["embedding"]])
        c = cmap[int(r["centroid_id"])]
        residuals.append([a - b for a, b in zip(u, c)])
    books = [
        [r[j * dsub:(j + 1) * dsub] for r in residuals] for j in range(m)
    ]
    return books, dsub


def ivfadc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ks: int = 8,
    refine_iters: int = 0,
) -> DataFrame:
    """IVFADC ANN: probe the ``n_probe`` closest inverted lists per
    query and rank their members by asymmetric distance — the sum over
    subspaces of the fixed-point squared L2 between the QUERY's residual
    slice (``u_q − c_u`` per probed list) and the member's residual
    CODEWORD. Candidates shrink to ~n·n_probe/n_centroids AND each is
    touched only through its m codes — the composition that serves
    10^9+ vectors (Jégou et al. 2011, the IVFADC system).

    Output: (query_id, vec_id, adc_fp, rank), adc_fp integer (sum of
    1e7-rounded per-subspace entries), rank ascending, ties to the
    lowest vec_id. Everything is fixed-point / driver-literal
    deterministic, so the query carries a full DuckDB value-hash oracle.

    Scale posture: encode is one zero-Exchange map (persist it
    centroid-partitioned for build-once/probe-many, like ivf_index);
    per-query work is n_probe LUTs of m×ks bigints (driver-built,
    broadcast) + an integer fold over the probed lists' codes. The
    candidate fetch is ONE broadcast join on centroid_id.
    """
    from ._cache import pin

    emb = embeddings.select("vec_id", "embedding")
    cent = ivf_centroids(emb, n_centroids)
    if refine_iters > 0:
        cent = kmeans_refine(emb, cent, n_iters=refine_iters)
    books, dsub = ivfadc_books(emb, cent, m=m, ks=ks, n_skip=n_centroids)
    codes = pin(ivfadc_encode(emb, cent, books, dsub))

    # probes: same fixed-point centroid ranking as ivf_topk
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    wq = Window.partitionBy("query_id").orderBy(
        _sim_fp("q_emb", "c_emb").desc(), F.col("centroid_id")
    )
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    # per-(query, probed list) ADC lookup tables, driver-built: the
    # query's residual against that list's centroid vs every codeword
    cmap = {
        int(r["centroid_id"]): _unit([float(x) for x in r["c_emb"]])
        for r in cent.collect()
    }
    qmap = {
        int(r["query_id"]): _unit([float(x) for x in r["q_emb"]])
        for r in q.collect()
    }
    lut_rows = []
    for r in probes.collect():
        qid, cid = int(r["query_id"]), int(r["centroid_id"])
        rq = [a - b for a, b in zip(qmap[qid], cmap[cid])]
        lut = [
            [
                _round_half_away(
                    sum(
                        (rq[j * dsub + i] - cw[i]) ** 2
                        for i in range(dsub)
                    )
                    * 10000000
                )
                for cw in books[j]
            ]
            for j in range(m)
        ]
        lut_rows.append((qid, cid, lut))
    luts = embeddings.sparkSession.createDataFrame(
        lut_rows,
        schema="query_id bigint, centroid_id bigint,"
        " lut array<array<bigint>>",
    )
    scored = (
        codes.join(F.broadcast(luts), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(
                f"aggregate(sequence(1, {m}), cast(0 as bigint),"
                " (acc, j) -> acc + element_at(element_at(lut, j),"
                " element_at(codes, j) + 1))"
            ).alias("adc_fp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_fp").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_fp", "rank")
    )
