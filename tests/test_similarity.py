"""Similarity search: SQL-fold exactness, numpy-path agreement, LSH recall."""

import math

from binlog_processer_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    cosine_topk_np,
)

VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),       # close to 0
    (2, [0.0, 1.0, 0.0]),       # orthogonal to 0
    (3, [-1.0, 0.0, 0.0]),      # opposite of 0
    (4, [0.8, 0.2, 0.1]),       # close-ish to 0
]
SCHEMA = "vec_id bigint, embedding array<float>"


def _emb(spark):
    return spark.createDataFrame(VECS, SCHEMA)


def _expected_order(qid=0):
    import numpy as np

    q = np.array(VECS[qid][1])
    sims = []
    for vid, v in VECS:
        if vid == qid:
            continue
        v = np.array(v)
        sims.append((vid, float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))))
    return sorted(sims, key=lambda t: (-round(t[1] * 10000), t[0]))


def test_bruteforce_topk_exact(spark):
    got = sorted(
        (r.rank, r.vec_id, r.cosine_bp)
        for r in cosine_topk(_emb(spark), [0], k=4).collect()
    )
    exp = _expected_order()
    assert [v for _, v, _ in got] == [v for v, _ in exp]
    for (_, _, bp), (_, sim) in zip(got, exp):
        assert abs(bp - round(sim * 10000)) <= 1


def test_numpy_path_matches_sql_fold(spark):
    a = {(r.query_id, r.rank): r.vec_id
         for r in cosine_topk(_emb(spark), [0, 2], k=3).collect()}
    b = {(r.query_id, r.rank): r.vec_id
         for r in cosine_topk_np(_emb(spark), [0, 2], k=3).collect()}
    assert a == b


def test_lsh_restricts_to_bucket(spark):
    # vec 3 = −vec 0: every plane dot flips sign, so no signature band is
    # shared and 3 is never a candidate; vec 1 (0.9, 0.1, 0) has the same
    # sign as vec 0 under every ±1 plane (|0.9·h0| > |0.1·h1|) → candidate
    got = cosine_topk_lsh(_emb(spark), [0], k=4, dim=3).collect()
    ids = {r.vec_id for r in got}
    assert 3 not in ids             # opposite-sign signature excluded
    assert 1 in ids


def test_near_dup_pairs_finds_planted_clones(spark):
    from pyspark.sql import functions as F

    from binlog_processer_spark.operators.similarity import near_dup_pairs

    base = _emb(spark).select(
        "vec_id", F.expr("cast(embedding as array<double>)").alias("embedding")
    )
    clones = base.select(
        (F.col("vec_id") + 100).alias("vec_id"),
        F.expr("transform(embedding, x -> x + 0.001D)").alias("embedding"),
    )
    got = near_dup_pairs(
        base.unionByName(clones), threshold_bp=9990, dim=3
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    # every planted clone pairs with its original (identical signatures: the
    # 0.001 shift cannot flip any plane dot in VECS, whose dots are >=0.5)
    assert {(v, v + 100) for v, _ in VECS} <= pairs
    # and nothing else is a near-dup at 0.999 except clone-of-neighbour pairs
    for r in got:
        assert r.cosine_bp >= 9990


def test_near_dup_respects_bucket_blocking(spark):
    from binlog_processer_spark.operators.similarity import near_dup_pairs

    # vec 0 and its exact opposite (vec 3) disagree on every sign bit and
    # share no band: never reported even at threshold 0
    got = near_dup_pairs(_emb(spark), threshold_bp=0, dim=3).collect()
    assert all({r.id_a, r.id_b} != {0, 3} for r in got)


def test_bucket_count_scales_with_corpus(spark):
    """planes_for grows the signature with n, so the number of occupied
    band-buckets grows and expected bucket size stays bounded — the property
    that keeps the candidate self-join ~linear at 100 TB."""
    from pyspark.sql import functions as F

    from binlog_processer_spark.operators.similarity import (
        DEFAULT_BANDS,
        _banded,
        planes_for,
        sign_signature_expr,
    )

    assert planes_for(1_000) < planes_for(1_000_000) < planes_for(10**12)

    def occupied_buckets(n):
        # deterministic pseudo-random 8-dim embeddings from pure SQL
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 8), i ->"
                " cast(pmod(hash(id, i), 2001) - 1000 as float) / 1000.0F)"
            ).alias("embedding"),
        )
        np = planes_for(n)
        sig = emb.withColumn("sig", sign_signature_expr(np, dim=8))
        return (
            _banded(sig, np, DEFAULT_BANDS)
            .select("band_id", "band")
            .distinct()
            .count()
        )

    small, large = occupied_buckets(200), occupied_buckets(3200)
    assert large > small
    # expected docs per (band_id, band) bucket stays bounded
    assert 3200 * DEFAULT_BANDS / large < 32


def test_ivf_topk_on_clustered_data(spark):
    """IVF with enough probes finds exact neighbors inside tight clusters;
    every vector gets exactly one centroid assignment."""
    from pyspark.sql import functions as F

    from binlog_processer_spark.operators.similarity import (
        ivf_assignments,
        ivf_centroids,
        ivf_topk,
    )

    # 3 tight clusters of 10 around orthogonal axes (+ tiny deterministic jitter)
    rows = []
    for c, axis in enumerate([(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]):
        for i in range(10):
            eps = (i + 1) / 1000.0
            rows.append(
                (c * 10 + i, [axis[0] + eps, axis[1] + eps / 2, axis[2]])
            )
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    cent = ivf_centroids(emb, 6)
    assign = ivf_assignments(emb, cent)
    assert assign.count() == 30                       # one row per vector
    assert assign.select("vec_id").distinct().count() == 30

    got = ivf_topk(emb, query_ids=[0, 10, 20], k=3, n_centroids=6, n_probe=3)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    # nearest neighbors of a cluster member are cluster-mates
    for qid in (0, 10, 20):
        cluster = set(range((qid // 10) * 10, (qid // 10) * 10 + 10))
        assert set(by_q[qid]) <= cluster - {qid}


def test_numpy_path_tiebreak_by_vec_id(spark):
    # four identical candidates (equal cosine to the query) spread across
    # partitions: each batch's partial top-k sees a different subset, and the
    # global reduce must keep the LOWEST vec_ids (score DESC, vec_id ASC) —
    # the rank-set contract the ann_blas_topk oracle checks
    rows = [(0, [1.0, 0.0, 0.0])] + [(i, [0.5, 0.5, 0.0]) for i in (7, 3, 9, 5)]
    emb = spark.createDataFrame(rows, SCHEMA).repartition(4, "vec_id")
    got = sorted(
        (r.rank, r.vec_id) for r in cosine_topk_np(emb, [0], k=2).collect()
    )
    assert got == [(1, 3), (2, 5)]


def test_semdedup_pairs_cluster_scoped(spark):
    from binlog_processer_spark.operators.similarity import semdedup_pairs

    # 3 tight orthogonal clusters; the only >=0.9-cosine pairs are
    # within-cluster, so cluster scoping loses nothing here
    rows = []
    for c, axis in enumerate([(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]):
        for i in range(4):
            eps = (i + 1) / 1000.0
            rows.append(
                (c * 10 + i, [axis[0] + eps, axis[1] + eps / 2, axis[2]])
            )
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = semdedup_pairs(emb, n_centroids=3, threshold_bp=9000).collect()
    assert len(got) > 0
    for r in got:
        assert r.id_a // 10 == r.id_b // 10          # same cluster only
        assert r.id_a < r.id_b
        assert r.cosine_bp >= 9000


def test_semdedup_assignment_subplan_zero_exchange(spark):
    from binlog_processer_spark.operators.similarity import (
        ivf_assignments,
        ivf_centroids,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    plan = (
        ivf_assignments(emb, ivf_centroids(emb, 2), keep_embedding=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_quantize_expr_range_and_zero_guard(spark):
    from binlog_processer_spark.operators.similarity import quantize_embeddings

    emb = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25]), (1, [0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = {r.vec_id: r.q for r in quantize_embeddings(emb).collect()}
    assert got[0] == [64, -127, 32]       # max|x|=1.0 -> scale 1/127
    assert got[1] == [0, 0, 0]            # zero vector stays zeros
    assert all(-127 <= v <= 127 for v in got[0])


def test_int8_topk_recall_vs_exact(spark):
    from binlog_processer_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_int8,
    )

    emb = _emb(spark)
    exact = {r.vec_id for r in cosine_topk(emb, [0], k=5).collect()}
    quant = {r.vec_id for r in cosine_topk_int8(emb, [0], k=5).collect()}
    # int8 keeps ~2 decimal digits of each coordinate: top-5 overlap
    # should be near-total on any non-adversarial set
    assert len(exact & quant) >= 4, (exact, quant)


def test_embedding_qa_verdicts(spark):
    from binlog_processer_spark.operators.similarity import embedding_qa

    d = spark.createDataFrame(
        [
            (1, [0.6, 0.8, 0.0]),
            (2, [0.0, 0.0, 0.0]),
            (3, [float("nan"), 1.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in embedding_qa(d).collect()}
    assert out[1].usable and out[1].norm_bp == 10000 and out[1].n_zero == 1
    assert out[1].dim == 3
    assert not out[2].usable and out[2].norm_bp == 0
    assert not out[3].usable and out[3].norm_bp is None
    assert out[3].n_nan == 1
    plan = embedding_qa(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_embedding_qa_null_vector_is_unusable(spark):
    from binlog_processer_spark.operators.similarity import embedding_qa

    d = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in embedding_qa(d).collect()}
    assert out[2].usable is False  # False, not NULL: ~usable must catch it
    assert out[1].usable is True


def test_blas_topk_partial_cut_uses_rounded_order(spark):
    from binlog_processer_spark.operators.similarity import cosine_topk_np

    # candidates 2 and 3 round to the SAME basis-point score (9999) but
    # 3 has the higher raw float; under the final (bp DESC, vec_id ASC)
    # order the k=1 winner is vec_id 2 — a partial top-k that cuts by raw
    # score would drop it inside the batch and emit 3
    d = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [1.0, 0.011]), (3, [1.0, 0.0109])],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    out = cosine_topk_np(d, query_ids=[0], k=1).collect()
    assert [(r.query_id, r.vec_id, r.rank) for r in out] == [(0, 2, 1)]


def test_topk_recall_denominator_and_missing_queries(spark):
    from binlog_processer_spark.operators.similarity import topk_recall

    schema = "query_id bigint, vec_id bigint, rank int"
    exact = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3),      # full top-3
            (2, 20, 1), (2, 21, 2),                  # short corpus: only 2
            (3, 30, 1), (3, 31, 2), (3, 32, 3),
        ],
        schema,
    )
    approx = spark.createDataFrame(
        [
            (1, 10, 1), (1, 12, 2), (1, 99, 3),      # 2 of 3 hit
            (2, 20, 1), (2, 21, 2),                  # all available hit
            # query 3 entirely missed by the approximate arm
        ],
        schema,
    )
    got = {
        r.query_id: r.recall_bp
        for r in topk_recall(exact, approx, k=3).collect()
    }
    assert got == {1: 6666, 2: 10000, 3: 0}
    # rank filter: rows beyond k on either side must not count
    approx_deep = approx.union(
        spark.createDataFrame([(3, 30, 4)], schema)  # hit, but past k
    )
    got = {
        r.query_id: r.recall_bp
        for r in topk_recall(exact, approx_deep, k=3).collect()
    }
    assert got[3] == 0


def test_pq_encode_matches_numpy_reference(spark):
    """Codes re-derived in numpy (normalize → slice → argmin of 1e7-
    rounded squared L2, ties to lowest code) must match exactly."""
    import numpy as np

    from binlog_processer_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books, dsub = pq_codebooks(emb, m=4, ks=8)
    got = {
        int(r["vec_id"]): list(r["codes"])
        for r in pq_encode(emb, books, dsub).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    B = [np.array(b) for b in books]  # m x ks x dsub
    for r in rows[:200]:
        x = np.array([float(v) for v in r["embedding"]])
        u = x / np.sqrt(float(sum(v * v for v in x.tolist())))
        want = []
        from binlog_processer_spark.operators.similarity import (
            _round_half_away,
        )

        for j in range(4):
            s = u[j * dsub:(j + 1) * dsub]
            # half-away-from-zero, matching the Spark/DuckDB canon
            # (np.round is half-to-even and can skew on .5 boundaries)
            d2 = np.array([
                _round_half_away(float(v))
                for v in ((B[j] - s) ** 2).sum(axis=1) * 1e7
            ], dtype=np.int64)
            want.append(int(np.argmin(d2)))  # argmin ties -> lowest idx
        assert got[int(r["vec_id"])] == want, r["vec_id"]


def test_pq_recall_beats_random(spark):
    """ADC ranking must be far better than chance: random recall@5 over
    ~500 candidates is ~1% (=100bp in expectation x 5/500); require a
    mean an order of magnitude above that."""
    from pyspark.sql import functions as F

    from binlog_processer_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
        topk_recall,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(10))
    rec = topk_recall(
        cosine_topk(emb, qids, k=5),
        pq_topk(emb, qids, k=5, m=4, ks=8),
        k=5,
    )
    mean_bp = rec.agg(F.avg("recall_bp")).collect()[0][0]
    assert mean_bp >= 1000, mean_bp  # >= 10% mean recall@5


def test_pq_encode_zero_exchange(spark):
    """The encode is a map-only projection: codebooks ride as literals,
    so compressing 10^12 vectors shuffles nothing."""
    from binlog_processer_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books, dsub = pq_codebooks(emb, m=4, ks=8)
    plan = (
        pq_encode(emb, books, dsub)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_ivfadc_encode_zero_exchange(spark):
    """IVFADC encode = coarse assignment + residual + m argmin folds in
    ONE map-only projection (centroids and residual codebooks ride as
    literals) — compressing 10^12 vectors shuffles nothing."""
    from binlog_processer_spark.operators.similarity import (
        ivf_centroids,
        ivfadc_books,
        ivfadc_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = ivf_centroids(emb, 16)
    books, dsub = ivfadc_books(emb, cent, m=32, ks=16, n_skip=16)
    plan = (
        ivfadc_encode(emb, cent, books, dsub)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_ivfadc_recall_beats_random(spark):
    """Residual-ADC over 4 probed lists must be far better than chance
    (random recall@5 over ~500 candidates is ~1%)."""
    from pyspark.sql import functions as F

    from binlog_processer_spark.operators.similarity import (
        cosine_topk,
        ivfadc_topk,
        topk_recall,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(10))
    rec = topk_recall(
        cosine_topk(emb, qids, k=5),
        ivfadc_topk(emb, qids, k=5, n_centroids=16, n_probe=4, m=32, ks=16),
        k=5,
    )
    mean_bp = rec.agg(F.avg("recall_bp")).collect()[0][0]
    assert mean_bp >= 1000, mean_bp  # >= 10% mean recall@5


def test_ivfadc_candidates_respect_probed_lists(spark):
    """Every returned neighbor must live in one of its query's n_probe
    probed inverted lists — the IVF candidate restriction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from binlog_processer_spark.operators.similarity import (
        _sim_fp,
        ivf_assignments,
        ivf_centroids,
        ivfadc_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(10))
    out = ivfadc_topk(emb, qids, k=5, n_centroids=16, n_probe=4).collect()
    cent = ivf_centroids(emb, 16)
    asg = {
        int(r["vec_id"]): int(r["centroid_id"])
        for r in ivf_assignments(emb, cent).collect()
    }
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        _sim_fp("q_emb", "c_emb").desc(), F.col("centroid_id")
    )
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= 4)
        .select("query_id", "centroid_id")
        .collect()
    )
    probed = {}
    for r in probes:
        probed.setdefault(int(r["query_id"]), set()).add(
            int(r["centroid_id"])
        )
    assert out, "ivfadc returned no rows"
    for r in out:
        assert asg[int(r["vec_id"])] in probed[int(r["query_id"])]
