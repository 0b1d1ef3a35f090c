"""Mergeable distinct sketches (operators/sketch.py): KMV + HLL.

The estimators' exactness vs the DuckDB oracle is pinned by the
sketch_distinct_* contract queries; these tests pin the properties the
oracle can't see — partition invariance (the zero-shuffle candidate
pass is exact), mergeability of the HLL register state, the exhaustive
small-cardinality path, and a numpy re-derivation of both estimates.
"""

import hashlib

import numpy as np
import pytest

from binlog_processer_spark.operators.sketch import (
    HASH_SPACE,
    hll_distinct,
    hll_registers,
    kmv_distinct,
)


def _h32(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def _df(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, "source string, tokens array<int>"
    ).repartition(parts)


def _rows(n_docs=400, vocab=3000, seed=11):
    rng = np.random.default_rng(seed)
    return [
        (
            f"s{i % 2}",
            rng.integers(0, vocab * (i % 2 + 1), size=25).tolist(),
        )
        for i in range(n_docs)
    ]


def test_kmv_partition_invariant(spark):
    """The per-partition bottom-k candidate pass is an exact pruning:
    the published sketch is identical at any parallelism."""
    rows = _rows()
    a = kmv_distinct(_df(spark, rows, parts=2), k=64).collect()
    b = kmv_distinct(_df(spark, rows, parts=8), k=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_matches_numpy_reference(spark):
    rows = _rows()
    got = {r.source: r for r in kmv_distinct(_df(spark, rows), k=64).collect()}
    by_src: dict[str, set[int]] = {}
    for s, toks in rows:
        by_src.setdefault(s, set()).update(toks)
    for s, toks in by_src.items():
        hs = sorted({_h32(t) for t in toks})[:64]
        h_k = hs[-1]
        est = (64 - 1) * HASH_SPACE // h_k if len(hs) == 64 else len(hs)
        r = got[s]
        assert (r.k_used, r.h_k) == (len(hs), h_k)
        assert r.est_distinct == est
        assert r.exact_distinct == len(toks)


def test_kmv_exhaustive_when_k_exceeds_cardinality(spark):
    df = _df(spark, [("a", [1, 2, 3]), ("a", [2, 3, 4])])
    r = kmv_distinct(df, k=64).collect()[0]
    # fewer than k distinct hashes -> the sketch IS the exact answer
    assert r.k_used == 4
    assert r.est_distinct == 4 == r.exact_distinct
    assert r.err_ppm == 0


def test_kmv_rejects_degenerate_k(spark):
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(_df(spark, [("a", [1])]), k=1)


def test_hll_registers_merge_by_max(spark):
    """Register state is mergeable: fold(groupBy.max) over two halves
    == registers of the union — the property that makes the sketch a
    shard-then-combine object at 10^12 rows."""
    rows = _rows()
    half1, half2 = rows[::2], rows[1::2]
    import pyspark.sql.functions as F

    merged = (
        hll_registers(_df(spark, half1), b=8)
        .unionByName(hll_registers(_df(spark, half2), b=8))
        .groupBy("source", "bucket")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    whole = hll_registers(_df(spark, rows), b=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_matches_numpy_reference(spark):
    rows = _rows()
    b, m, w = 10, 1024, 22
    got = {r.source: r for r in hll_distinct(_df(spark, rows), b=b).collect()}
    by_src: dict[str, set[int]] = {}
    for s, toks in rows:
        by_src.setdefault(s, set()).update(toks)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numer = ((alpha * m) * m) * float(1 << 33)
    for s, toks in by_src.items():
        regs = [0] * m
        for t in toks:
            h = _h32(t)
            bucket, rest = h >> w, h & ((1 << w) - 1)
            rho = (w + 1) if rest == 0 else (w + 1 - rest.bit_length())
            regs[bucket] = max(regs[bucket], rho)
        sum_scaled = sum(1 << (33 - r) for r in regs)
        zero = sum(1 for r in regs if r == 0)
        raw = numer / sum_scaled
        est = (
            m * np.log(m / zero)
            if (raw <= 2.5 * m and zero > 0)
            else raw
        )
        r = got[s]
        assert r.zero_registers == zero
        assert r.sum_scaled == sum_scaled
        assert r.est_distinct == int(np.floor(est))


def test_hll_error_within_expected_band(spark):
    # standard error ~ 1.04/sqrt(m) = 3.25% at b=10; allow 4 sigma
    rows = _rows(n_docs=800, vocab=20_000)
    for r in hll_distinct(_df(spark, rows), b=10).collect():
        assert r.err_ppm < 130_000


def test_hll_rejects_bad_precision(spark):
    with pytest.raises(ValueError, match="b must be"):
        hll_registers(_df(spark, [("a", [1])]), b=2)


def test_cms_never_underestimates_and_merges(spark):
    from binlog_processer_spark.operators.sketch import (
        cms_counters,
        cms_estimate_report,
    )
    import pyspark.sql.functions as F

    rows = _rows(n_docs=200, vocab=500)
    df = _df(spark, rows)
    rep = cms_estimate_report(df, depth=4, width=256, top_k=10).collect()
    assert len(rep) == 10
    exact = {}
    for _, toks in rows:
        for t in toks:
            exact[t] = exact.get(t, 0) + 1
    for r in rep:
        assert r.exact_cnt == exact[r.token]
        assert r.est_cnt >= r.exact_cnt  # CMS one-sided error
        assert r.overcount_ppm >= 0
    # mergeability: counters(half1) + counters(half2) == counters(whole)
    half1, half2 = rows[::2], rows[1::2]
    merged = (
        cms_counters(_df(spark, half1), depth=2, width=128)
        .unionByName(cms_counters(_df(spark, half2), depth=2, width=128))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    whole = cms_counters(df, depth=2, width=128)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_rejects_degenerate_shape(spark):
    from binlog_processer_spark.operators.sketch import cms_counters

    with pytest.raises(ValueError, match="depth"):
        cms_counters(_df(spark, [("a", [1])]), depth=0, width=8)


def test_kmv_overlap_estimates_jaccard(spark):
    from binlog_processer_spark.operators.sketch import kmv_source_overlap

    rng = np.random.default_rng(5)
    rows = []
    for i in range(300):
        rows.append(("A", rng.choice(3000, 30).tolist()))
        rows.append(
            ("B", (rng.choice(3000, 30) + (0 if i % 2 else 1500)).tolist())
        )
        rows.append(("C", (rng.choice(3000, 30) + 9000).tolist()))
    out = {
        (r.source_a, r.source_b): r
        for r in kmv_source_overlap(_df(spark, rows), k=128).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    # python-set exact jaccard agrees with the published exact column
    sets: dict[str, set[int]] = {}
    for s, toks in rows:
        sets.setdefault(s, set()).update(toks)
    for (a, b), r in out.items():
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        assert r.exact_jaccard_ppm == inter * 1_000_000 // uni
    # disjoint pairs: the estimator must report 0, not vanish
    assert out[("A", "C")].est_jaccard_ppm == 0
    assert out[("B", "C")].est_jaccard_ppm == 0
    # overlapping pair: within ~4 sigma of sqrt(J(1-J)/k)
    r = out[("A", "B")]
    j = r.exact_jaccard_ppm / 1e6
    sigma = (j * (1 - j) / 128) ** 0.5 * 1e6
    assert abs(r.est_jaccard_ppm - r.exact_jaccard_ppm) < 4 * sigma


def test_kmv_overlap_exhaustive_is_exact(spark):
    from binlog_processer_spark.operators.sketch import kmv_source_overlap

    # both vocabularies < k: the sketch IS the set, estimate == exact
    rows = [("a", [1, 2, 3, 4]), ("b", [3, 4, 5, 6])]
    r = kmv_source_overlap(_df(spark, rows), k=64).collect()[0]
    assert r.est_jaccard_ppm == r.exact_jaccard_ppm
    assert r.abs_err_ppm == 0
