"""Property-based invariants of the shard-export and packing operators,
checked against pure-Python references on ARBITRARY corpora.

Same pattern as the other property suites: each hypothesis example
generates a whole corpus and the test runs few examples (one Spark job
per case)."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_IDS = st.lists(
    st.integers(min_value=0, max_value=10_000),
    min_size=1,
    max_size=40,
    unique=True,
)


def _md5_prefix(doc_id) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ids=_IDS, n_shards=st.integers(min_value=1, max_value=9))
def test_shard_assign_matches_reference(spark, ids, n_shards):
    from binlog_processer_spark.operators.mix import shard_assign

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.shard_id, r.pos)
        for r in shard_assign(df, n_shards=n_shards).collect()
    }
    # reference: shard by md5 prefix mod n, pos by md5-hex order per shard
    by_shard = {}
    for i in ids:
        by_shard.setdefault(_md5_prefix(i) % n_shards, []).append(i)
    want = {}
    for s, members in by_shard.items():
        members.sort(key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        for pos, i in enumerate(members):
            want[i] = (s, pos)
    assert got == want


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    toks=st.lists(
        st.integers(min_value=1, max_value=50), min_size=1, max_size=30
    ),
    max_tokens=st.integers(min_value=1, max_value=64),
)
def test_pack_and_boundaries_invariants(spark, toks, max_tokens):
    from binlog_processer_spark.operators.mix import (
        pack_sequences,
        sequence_boundaries,
    )

    df = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate(toks)],
        "doc_id long, source string, n_tok long",
    )
    packed = pack_sequences(df, max_tokens, shards=1).collect()
    # every doc placed exactly once; offsets are the doc_id-order prefix sums
    assert sorted(r.doc_id for r in packed) == list(range(len(toks)))
    run = 0
    by_id = {r.doc_id: r for r in packed}
    for i, n in enumerate(toks):
        assert by_id[i].offset == run
        assert by_id[i].seq == run // max_tokens
        run += n
    b = sequence_boundaries(
        pack_sequences(df, max_tokens, shards=1), max_tokens
    ).collect()
    # boundaries partition the docs: per-seq doc counts sum to the corpus
    assert sum(r.n_docs for r in b) == len(toks)
    for r in b:
        # in-sequence offsets are sorted, start in [0, max_tokens), and the
        # first doc of every sequence starts exactly at its window edge
        # only when it wasn't an overrun tail
        assert r.boundaries == sorted(r.boundaries)
        assert all(0 <= x < max_tokens for x in r.boundaries)
        assert r.n_docs == len(r.boundaries)
        assert r.fill_bp >= 0


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=1000),
        min_size=1,
        max_size=4,
    ),
    tgt_keys=st.sets(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3),
)
def test_rebalance_hits_targets_exactly_over_present_sources(
    spark, counts, tgt_keys
):
    from binlog_processer_spark.operators.mix import rebalance_report

    targets = {k: 1.0 / len(tgt_keys) for k in sorted(tgt_keys)}
    df = spark.createDataFrame(
        [(s, n) for s, n in counts.items()], "source string, n_tok long"
    ).withColumn("doc_id", F.monotonically_increasing_id())
    out = {r.source: r for r in rebalance_report(df, targets).collect()}
    present = {k for k in tgt_keys if k in counts}
    # every targeted source appears; untargeted get rate 0
    assert set(out) == set(counts) | set(targets)
    for s, r in out.items():
        if s not in targets:
            assert r.rate_bp == 0 and r.kept_tokens == 0
        elif s not in counts:
            assert r.tokens == 0 and r.rate_bp == 0
    if present:
        # the binding present source keeps rate 1 (up to bp flooring)
        c = min(counts[s] / targets[s] for s in present)
        for s in present:
            want = min(1.0, c * targets[s] / counts[s])
            assert abs(out[s].rate_bp - int(want * 10000)) <= 1
            # kept tokens realize rate * tokens (floored, ±1 float fuzz)
            assert abs(out[s].kept_tokens - int(want * counts[s])) <= 1
