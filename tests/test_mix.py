"""Training-mix operators: deterministic stratified sampling, sequence
packing, contamination screening — semantics plus the plan shapes that
make them scale (filter-only sampling, broadcast contamination join)."""

from pyspark.sql import functions as F

from binlog_processer_spark.operators.mix import (
    contamination,
    pack_sequences,
    rate_threshold,
    stratified_sample,
)


def _docs(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
        (F.col("id") % 50 + 1).alias("n_tok"),
    )


def test_sample_rates_and_determinism(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, {"s0": 1.0, "s1": 0.5, "s2": 0.0}, default_rate=0.1
    )
    by_src = {
        r.source: r.cnt
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_src["s0"] == 250          # rate 1.0 keeps everything
    assert 85 <= by_src.get("s1", 0) <= 165   # ~125 of 250
    assert "s2" not in by_src           # rate 0.0 drops all
    assert 10 <= by_src.get("s3", 0) <= 45    # default 0.1 -> ~25
    # exact reproducibility: same rows on a rerun, any partitioning
    again = stratified_sample(
        d.repartition(7), {"s0": 1.0, "s1": 0.5, "s2": 0.0}, default_rate=0.1
    )
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in out.collect()
    )


def test_sample_is_a_pure_filter_no_shuffle(spark):
    plan = stratified_sample(
        _docs(spark), {"s0": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rate_threshold_bounds(spark):
    assert rate_threshold(0.0) == "00000000"
    # keep-all sentinel: above every hex digit, so a strict `<` keeps even
    # a doc whose md5 prefix is exactly ffffffff
    assert rate_threshold(1.0) == "g"
    # just-below-1 rates stay hex (strictly below the sentinel)
    assert rate_threshold(1 - 2**-33) == "ffffffff"
    import pytest

    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_pack_sequences_budget_and_overflow(spark):
    out = pack_sequences(
        _docs(spark), max_tokens=500, shards=2
    ).collect()
    max_tok = 50
    streams = {}
    for r in sorted(out, key=lambda r: (r.source, r.shard, r.doc_id)):
        streams.setdefault((r.source, r.shard), []).append(r)
    assert len(streams) == 8  # 4 strata x 2 shards, all parallel
    for rows in streams.values():
        run = 0
        for r in rows:
            assert r.offset == run       # contiguous, gap-free layout
            assert r.seq == r.offset // 500
            run += r.n_tok
        # greedy packing: a sequence overruns by at most one doc's tail
        totals = {}
        for r in rows:
            totals[r.seq] = totals.get(r.seq, 0) + r.n_tok
        full = [s for s in totals if s < max(totals)]
        assert all(totals[s] < 500 + max_tok for s in full)


def test_contamination_flags_shared_ngrams_only(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),      # shares 'quick brown fox'
         (2, "totally disjoint words here now")],
        "doc_id long, text string",
    )
    hold = spark.createDataFrame(
        [(9, "a quick brown fox sleeps")], "doc_id long, text string"
    )
    got = {r.doc_id: r.shared_shingles for r in contamination(train, hold).collect()}
    assert got == {1: 1}


def test_contamination_broadcasts_the_holdout(spark):
    d = _docs(spark).withColumn("text", F.lit("w x y z"))
    plan = contamination(
        d.filter("doc_id % 10 != 0"), d.filter("doc_id % 10 = 0")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quality_token_budget(spark):
    from binlog_processer_spark.operators.mix import quality_token_budget

    docs = spark.createDataFrame(
        [
            # 10+ words, stopword 'the', mean wlen in band -> qbp 10000
            (1, "a", "the quick brown fox jumps over the lazy dog today"),
            (2, "a", ""),                       # qbp 0
            (3, "b", "one two three"),          # no stopword, <10 words
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r.source, r.quality_bin): (r.n_docs, r.tok_budget)
        for r in quality_token_budget(docs, bin_bp=2500).collect()
    }
    assert got[("a", 4)] == (1, 10)   # doc 1: 10 bpe tokens, bin 10000/2500
    assert got[("a", 0)] == (1, 0)    # empty doc
    assert ("b", 0) in got or ("b", 1) in got


def test_quality_token_budget_single_scan_single_shuffle(spark):
    from binlog_processer_spark.operators.mix import quality_token_budget

    docs = spark.createDataFrame(
        [(1, "a", "x y z")], "doc_id long, source string, text string"
    )
    plan = (
        quality_token_budget(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash aggregate pair around one exchange; no join, no second scan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_holdout_carve_exact_k_and_deterministic(spark):
    from binlog_processer_spark.operators.mix import holdout_carve

    d = _docs(spark, 400)  # 4 sources x 100 docs
    a = holdout_carve(d, k=7)
    by_src = {
        r.source: r.cnt
        for r in a.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_src == {"s0": 7, "s1": 7, "s2": 7, "s3": 7}
    # deterministic: same ids on a re-run and under different partitioning
    ids_a = sorted((r.source, r.doc_id) for r in a.collect())
    ids_b = sorted(
        (r.source, r.doc_id)
        for r in holdout_carve(d.repartition(7), k=7).collect()
    )
    assert ids_a == ids_b


def test_holdout_carve_small_stratum_keeps_all(spark):
    from binlog_processer_spark.operators.mix import holdout_carve

    d = _docs(spark, 10)  # sources have 2-3 docs each
    got = holdout_carve(d, k=5)
    assert got.count() == 10  # every doc held out: k exceeds every stratum


def test_holdout_carve_fallback_exactness(spark):
    from binlog_processer_spark.operators.mix import holdout_carve

    # oversample=1 makes undershoot likely: the fallback must still
    # return exactly k per stratum
    d = _docs(spark, 200)
    by_src = {
        r.source: r.cnt
        for r in holdout_carve(d, k=10, oversample=1)
        .groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert all(v == 10 for v in by_src.values()), by_src


def test_holdout_carve_null_stratum(spark):
    from binlog_processer_spark.operators.mix import holdout_carve

    d = _docs(spark, 60).withColumn(
        "source",
        F.when(F.col("doc_id") % 3 == 0, None).otherwise(F.col("source")),
    )
    got = holdout_carve(d, k=4)
    by_src = {
        r.source: r.cnt
        for r in got.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_src.get(None) == 4, by_src  # the NULL stratum carves too
    assert all(v == 4 for v in by_src.values()), by_src


def test_shard_assign_deterministic_and_dense(spark):
    from binlog_processer_spark.operators.mix import shard_assign

    d = _docs(spark, 400)
    out = shard_assign(d, n_shards=8).collect()
    assert len(out) == 400
    by_shard = {}
    for r in out:
        assert 0 <= r.shard_id < 8
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    # positions are dense 0..n-1 within every shard
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # assignment is ingest-order/partitioning independent
    again = {
        (r.doc_id): (r.shard_id, r.pos)
        for r in shard_assign(d.repartition(13), n_shards=8).collect()
    }
    assert again == {r.doc_id: (r.shard_id, r.pos) for r in out}


def test_shard_assign_single_exchange(spark):
    from binlog_processer_spark.operators.mix import shard_assign

    plan = (
        shard_assign(_docs(spark, 50), n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly the one shuffle the export write needs: partition by shard
    assert plan.count("Exchange") == 1, plan


def test_shard_manifest_checksums_catch_membership_drift(spark):
    from binlog_processer_spark.operators.mix import (
        shard_assign,
        shard_manifest,
    )

    d = _docs(spark, 300).withColumn("n_chars", F.col("n_tok") * 4)
    m = {r.shard_id: r for r in shard_manifest(d, n_shards=8).collect()}
    counts = (
        shard_assign(d, n_shards=8).groupBy("shard_id").count().collect()
    )
    assert {r.shard_id: r["count"] for r in counts} == {
        s: r.n_docs for s, r in m.items()
    }
    # dropping one doc shifts exactly that shard's checksum and count
    m2 = {
        r.shard_id: r
        for r in shard_manifest(
            d.filter(F.col("doc_id") != 7), n_shards=8
        ).collect()
    }
    changed = [
        s
        for s in m
        if (m[s].n_docs, m[s].id_checksum)
        != (m2.get(s) and (m2[s].n_docs, m2[s].id_checksum))
    ]
    assert len(changed) == 1, changed


def test_sequence_boundaries_mask_offsets(spark):
    from binlog_processer_spark.operators.mix import (
        pack_sequences,
        sequence_boundaries,
    )

    d = spark.createDataFrame(
        [(i, "s0", t) for i, t in enumerate([100, 50, 80, 40, 60])],
        "doc_id long, source string, n_tok long",
    )
    packed = pack_sequences(d, max_tokens=128, shards=1)
    b = {
        (r.source, r.shard, r.seq): r
        for r in sequence_boundaries(packed, max_tokens=128).collect()
    }
    # layout by doc_id: offsets 0,100,150,230,270 -> seqs 0,0,1,1,2
    s0 = b[("s0", 0, 0)]
    assert s0.n_docs == 2 and s0.boundaries == [0, 100]
    # doc 1 (50 tok at rel 100) overruns the 128 budget: fill > 10000 bp
    assert s0.fill_bp == (150 * 10000) // 128
    s1 = b[("s0", 0, 1)]
    assert s1.boundaries == [22, 102]  # 150-128, 230-128
    s2 = b[("s0", 0, 2)]
    assert s2.n_docs == 1 and s2.boundaries == [14]
    # one hash aggregate, no global sort in the boundary pass
    plan = (
        sequence_boundaries(packed, max_tokens=128)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Sort [" not in plan.split("Window")[0], plan


def test_rebalance_exact_target_shares(spark):
    from binlog_processer_spark.operators.mix import rebalance_report

    d = spark.createDataFrame(
        [("s0", 600), ("s1", 300), ("s2", 100), ("s3", 50)],
        "source string, n_tok long",
    ).withColumn("doc_id", F.monotonically_increasing_id())
    out = {
        r.source: r
        for r in rebalance_report(
            d, targets={"s0": 0.5, "s1": 0.3, "s2": 0.2}
        ).collect()
    }
    # binding source keeps everything; others downsample to exact shares.
    # ratios tokens/target: s0 1200, s1 1000, s2 500 -> c = 500
    assert out["s2"].rate_bp == 10000 and out["s2"].kept_tokens == 100
    assert out["s0"].kept_tokens == 250  # 500 * 0.5
    assert out["s1"].kept_tokens == 150  # 500 * 0.3
    kept = {s: r.kept_tokens for s, r in out.items()}
    total_kept = sum(kept.values())
    assert kept["s0"] / total_kept == 0.5
    # untargeted source is excluded
    assert out["s3"].rate_bp == 0 and out["s3"].kept_tokens == 0
    assert out["s3"].target_share_bp == 0
    import pytest

    with pytest.raises(ValueError):
        rebalance_report(d, targets={})


def test_shard_assign_incremental_appends_after_tail(spark):
    from binlog_processer_spark.operators.mix import (
        shard_assign,
        shard_assign_incremental,
        shard_manifest,
    )

    d = _docs(spark, 300).withColumn("n_chars", F.col("n_tok"))
    exported = d.filter(F.col("doc_id") < 200)
    batch = d.filter(F.col("doc_id") >= 200)
    man = shard_manifest(exported, n_shards=8)
    inc = shard_assign_incremental(batch, man, n_shards=8).collect()
    base = {r.shard_id: r.n_docs for r in man.collect()}
    full = {
        r.doc_id: r.shard_id for r in shard_assign(d, n_shards=8).collect()
    }
    by_shard = {}
    for r in inc:
        # shard choice identical to a from-scratch assignment
        assert full[r.doc_id] == r.shard_id
        # every new position lands strictly after the exported tail
        assert r.pos >= base.get(r.shard_id, 0)
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    # and positions are dense from the tail onward
    for s, poss in by_shard.items():
        b = base.get(s, 0)
        assert sorted(poss) == list(range(b, b + len(poss)))


def test_materialize_packed_token_order_and_single_shuffle(spark):
    from binlog_processer_spark.operators.mix import materialize_packed

    d = spark.createDataFrame(
        [
            (f"d{i}", "s0", list(range(i * 10, i * 10 + 4)), 4)
            for i in range(6)
        ],
        "doc_id string, source string, tokens array<int>, n_tok long",
    )
    out = {
        (r.source, r.shard, r.seq): r
        for r in materialize_packed(d, max_tokens=8, shards=1).collect()
    }
    # doc order is doc_id-lexicographic: d0,d1,..,d5 -> 2 docs per 8-token seq
    s0 = out[("s0", 0, 0)]
    assert s0.tokens == [0, 1, 2, 3, 10, 11, 12, 13]
    assert s0.n_docs == 2 and s0.n_tok == 8
    assert out[("s0", 0, 2)].tokens == [40, 41, 42, 43, 50, 51, 52, 53]
    # token payload crosses exactly ONE Exchange: the groupBy reuses the
    # placement window's (stratum, shard) hash partitioning
    plan = (
        materialize_packed(d, max_tokens=8, shards=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_rebalance_absent_targeted_source_is_visible(spark):
    from binlog_processer_spark.operators.mix import rebalance_report

    d = spark.createDataFrame(
        [("s0", 600)], "source string, n_tok long"
    ).withColumn("doc_id", F.monotonically_increasing_id())
    out = {
        r.source: r
        for r in rebalance_report(d, targets={"s0": 0.5, "sX": 0.5}).collect()
    }
    # the absent targeted source appears with zero tokens and rate 0 —
    # the unachievable target is reported, never silently renormalized
    assert out["sX"].tokens == 0 and out["sX"].rate_bp == 0
    assert out["sX"].target_share_bp == 5000 and out["sX"].kept_tokens == 0
    assert out["s0"].rate_bp == 10000  # s0 is trivially binding


def test_materialized_tokens_align_with_boundaries(spark):
    """The trainer-facing invariant across the two pack artifacts: cutting
    each materialized sequence at its boundary offsets reconstructs the
    member documents' token arrays exactly."""
    from binlog_processer_spark.operators.mix import (
        materialize_packed,
        pack_sequences,
        sequence_boundaries,
    )

    docs = {
        f"d{i}": list(range(i * 100, i * 100 + 3 + (i % 4)))
        for i in range(12)
    }
    d = spark.createDataFrame(
        [(k, "s0", v, len(v)) for k, v in docs.items()],
        "doc_id string, source string, tokens array<int>, n_tok long",
    )
    mat = {
        (r.source, r.shard, r.seq): r.tokens
        for r in materialize_packed(d, max_tokens=10, shards=2).collect()
    }
    bnd = {
        (r.source, r.shard, r.seq): r.boundaries
        for r in sequence_boundaries(
            pack_sequences(d, 10, shards=2), 10
        ).collect()
    }
    assert set(mat) == set(bnd)
    all_cut = []
    for key, toks in mat.items():
        # boundaries are in-WINDOW offsets; the materialized array's
        # origin is the first member's offset (an overrun tail from the
        # previous sequence may own the window's first tokens), so cuts
        # are boundary deltas from the first boundary
        b0 = int(bnd[key][0])
        cuts = [int(b) - b0 for b in bnd[key]] + [len(toks)]
        all_cut += [
            toks[cuts[i]:cuts[i + 1]] for i in range(len(cuts) - 1)
        ]
    # every input document appears exactly once across all cuts
    want = sorted(map(tuple, docs.values()))
    assert sorted(map(tuple, all_cut)) == want


def test_epoch_order_permutes_per_epoch_and_keeps_shards(spark):
    from binlog_processer_spark.operators.mix import epoch_order, shard_assign

    docs = spark.createDataFrame(
        [(str(i),) for i in range(200)], "doc_id string"
    )
    e3a = epoch_order(docs, epoch=3, n_shards=16).collect()
    e3b = epoch_order(docs, epoch=3, n_shards=16).collect()
    e4 = epoch_order(docs, epoch=4, n_shards=16).collect()
    # reproducible within an epoch
    assert sorted(map(tuple, e3a)) == sorted(map(tuple, e3b))
    # order keys are a fresh permutation across epochs: relative order of
    # at least one same-shard pair flips (md5 draws are independent)
    k3 = {r.doc_id: (r.shard_id, r.order_key) for r in e3a}
    k4 = {r.doc_id: (r.shard_id, r.order_key) for r in e4}
    # shard home never moves epoch-over-epoch, and matches shard_assign
    assert {d: s for d, (s, _) in k3.items()} == {d: s for d, (s, _) in k4.items()}
    sa = {r.doc_id: r.shard_id for r in shard_assign(docs, n_shards=16).collect()}
    assert {d: s for d, (s, _) in k3.items()} == sa
    flips = 0
    by_shard: dict = {}
    for d, (s, _) in k3.items():
        by_shard.setdefault(s, []).append(d)
    for s, members in by_shard.items():
        for a, b in zip(members, members[1:]):
            if (k3[a][1] < k3[b][1]) != (k4[a][1] < k4[b][1]):
                flips += 1
    assert flips > 0
    # keys are unique (a bijective sort key within each shard)
    assert len({v for _, v in k3.items()}) == len(k3)


def test_epoch_order_is_pure_projection(spark):
    import pytest

    from binlog_processer_spark.operators.mix import epoch_order

    docs = spark.createDataFrame([(str(i),) for i in range(50)], "doc_id string")
    plan = (
        epoch_order(docs, epoch=1)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    with pytest.raises(ValueError):
        epoch_order(docs, epoch=-1)


def test_temperature_targets_flattens_toward_uniform(spark):
    import math

    from binlog_processer_spark.operators.mix import temperature_targets

    d = _docs(spark)  # 4 sources, known token sums
    tok = {
        r.source: r.t
        for r in d.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    out = {r.source: r.asDict() for r in temperature_targets(d, 2.0).collect()}
    assert set(out) == set(tok)
    total = sum(tok.values())
    # oracle recomputation of the closed form in python floats
    sc = {s: math.pow(t / total, 0.5) for s, t in tok.items()}
    z = sum(sc.values())
    tgt = {s: v / z for s, v in sc.items()}
    c = min(tok[s] / tgt[s] for s in tok)
    for s in tok:
        r = out[s]
        assert r["tokens"] == tok[s]
        rate = min(1.0, c * tgt[s] / tok[s])
        assert abs(r["target_share_bp"] - math.floor(tgt[s] * 10000)) <= 1
        assert abs(r["rate_bp"] - math.floor(rate * 10000)) <= 1
        assert abs(r["kept_tokens"] - math.floor(rate * tok[s])) <= 1
    # the binding (smallest-share) source keeps (essentially) everything
    smallest = min(tok, key=tok.get)
    assert out[smallest]["rate_bp"] >= 9999
    # temperature flattening: kept shares sit strictly between the natural
    # share and uniform for the dominant source
    kept_total = sum(out[s]["kept_tokens"] for s in tok)
    biggest = max(tok, key=tok.get)
    nat = tok[biggest] / total
    kept_share = out[biggest]["kept_tokens"] / kept_total
    assert 1 / len(tok) < kept_share < nat


def test_temperature_one_keeps_everything(spark):
    from binlog_processer_spark.operators.mix import temperature_targets

    out = temperature_targets(_docs(spark), 1.0).collect()
    for r in out:
        # T=1 → targets equal current shares → every source binds: rate 1
        # (9999 admissible: float (a/b)*b/a may land one ulp under 1.0)
        assert r.rate_bp >= 9999
        assert r.kept_tokens >= r.tokens - 1


def test_temperature_targets_rejects_bad_temperature(spark):
    import pytest as _pytest

    from binlog_processer_spark.operators.mix import temperature_targets

    with _pytest.raises(ValueError):
        temperature_targets(_docs(spark), 0.0)


def test_weighted_sample_matches_python_oracle_exactly(spark):
    import hashlib
    import math

    from binlog_processer_spark.operators.mix import weighted_sample

    d = _docs(spark, 500)
    got = sorted(r.doc_id for r in weighted_sample(d, 50).collect())
    # independent recomputation: same md5-prefix u, same ES key, top-50
    rows = d.collect()
    keyed = []
    for r in rows:
        v = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        u = (v + 0.5) / 16**8
        keyed.append((math.log(u) / r.n_tok, r.doc_id))
    want = sorted(i for _, i in sorted(keyed, reverse=True)[:50])
    assert got == want
    # deterministic under repartitioning
    again = sorted(
        r.doc_id for r in weighted_sample(d.repartition(13), 50).collect()
    )
    assert again == got


def test_weighted_sample_favors_heavy_rows_and_drops_nonpositive(spark):
    from binlog_processer_spark.operators.mix import weighted_sample

    d = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, F.lit(100)).otherwise(F.lit(1))
        .cast("bigint")
        .alias("n_tok"),
    )
    out = weighted_sample(d, 100).collect()
    heavy = sum(1 for r in out if r.doc_id < 200)
    assert len(out) == 100
    assert heavy >= 85  # w=100 vs w=1: heavy class dominates the draw
    # zero/negative weights are never drawn
    z = d.withColumn(
        "n_tok", F.when(F.col("doc_id") < 390, F.lit(0)).otherwise(F.lit(5))
    )
    kept = {r.doc_id for r in weighted_sample(z, 10).collect()}
    assert kept == set(range(390, 400))


def test_weighted_sample_plan_is_top_n_not_full_sort(spark):
    from binlog_processer_spark.operators.mix import weighted_sample

    plan = weighted_sample(_docs(spark), 25)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
