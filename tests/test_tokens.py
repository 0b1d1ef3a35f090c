"""Token heavy hitters (MG candidates + exact verify), df, vocab stats."""

from pyspark.sql import functions as F

from binlog_processer_spark.operators.tokens import (
    heavy_hitters,
    token_doc_frequency,
    token_frequencies,
    vocab_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, tokens array<int>")


def test_token_frequencies_threshold(spark):
    # 10 occurrences total; token 1 has 5 (500000 ppm), token 2 has 4,
    # token 3 has 1 (100000 ppm — exactly at a 100000 ppm bar)
    df = _df(spark, [("a", [1, 1, 1, 2, 2]), ("a", [1, 1, 2, 2, 3])])
    got = {r.token: r.cnt for r in token_frequencies(df, 400_000).collect()}
    assert got == {1: 5, 2: 4}
    # integer-arithmetic >= keeps the exactly-at-threshold token
    got = {r.token: r.cnt for r in token_frequencies(df, 100_000).collect()}
    assert got == {1: 5, 2: 4, 3: 1}


def test_heavy_hitters_equals_exact(spark):
    # zipf-ish skew across many rows and partitions; the MG-pruned path
    # must return exactly what the exact explode+aggregate returns
    rows = [
        ("s%d" % (i % 3), [i % 7, i % 23, i % 101, 5, 5 if i % 2 else 9])
        for i in range(500)
    ]
    df = _df(spark, rows).repartition(8)
    for ppm in (2000, 20_000, 200_000):
        exact = {
            (r.token, r.cnt) for r in token_frequencies(df, ppm).collect()
        }
        sketched = {
            (r.token, r.cnt) for r in heavy_hitters(df, ppm).collect()
        }
        assert sketched == exact, f"mismatch at {ppm} ppm"


def test_heavy_hitters_tiny_capacity_still_exact(spark):
    # high support bar -> capacity 2/phi is small (4): forces real MG
    # compress steps; the superset guarantee keeps the answer exact
    rows = [("a", [1] * 60 + list(range(100, 140)))] * 5
    df = _df(spark, rows).repartition(4)
    exact = {(r.token, r.cnt) for r in token_frequencies(df, 500_000).collect()}
    got = {(r.token, r.cnt) for r in heavy_hitters(df, 500_000).collect()}
    assert got == exact == {(1, 300)}


def test_doc_frequency_counts_rows_not_occurrences(spark):
    df = _df(spark, [("a", [7, 7, 7, 8]), ("a", [7]), ("a", [9])])
    got = {r.token: r.df_cnt for r in token_doc_frequency(df, 0).collect()}
    assert got == {7: 2, 8: 1, 9: 1}
    # 2/3 rows contain 7 -> 666666 ppm; bar at 500000 keeps only it
    got = {r.token: r.df_cnt for r in token_doc_frequency(df, 500_000).collect()}
    assert got == {7: 2}


def test_vocab_stats(spark):
    df = _df(spark, [("a", [1, 1, 2]), ("a", [2, 3]), ("b", [5])])
    got = {r.source: (r.n_rows, r.total_tok, r.distinct_tok)
           for r in vocab_stats(df).collect()}
    assert got == {"a": (2, 5, 3), "b": (1, 1, 1)}


def test_heavy_hitters_plan_broadcasts_candidates(spark):
    df = _df(spark, [("a", [1, 2, 3])])
    plan = heavy_hitters(df, 10_000)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_doc_idf_score(spark):
    import math

    # 4 rows: token 1 in all (idf=0), token 9 in one (idf=ln 4); the
    # duplicated doc (CDC copies) must score once
    rows = [("a", "d1", [1, 9, 9]), ("a", "d1", [1, 9, 9]),
            ("a", "d2", [1]), ("a", "d3", [1]), ("b", "d4", [1])]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, tokens array<int>"
    )
    from binlog_processer_spark.operators.tokens import doc_idf_score

    got = {(r.source, r.doc_id): r.idf_mc for r in doc_idf_score(df).collect()}
    ln = lambda x: round(math.log(x) * 1000)
    # N=5 rows; df: token1=5, token9=2
    assert got == {
        ("a", "d1"): ln(5 / 5) + ln(5 / 2),
        ("a", "d2"): ln(5 / 5),
        ("a", "d3"): ln(5 / 5),
        ("b", "d4"): ln(5 / 5),
    }


def _tdf(spark, rows):
    return spark.createDataFrame(
        rows, "source string, doc_id string, event_seq long, tokens array<int>"
    )


def test_repetition_stats(spark):
    from binlog_processer_spark.operators.tokens import repetition_stats

    df = _tdf(spark, [
        ("a", "d1", 1, [1, 2, 3, 1, 2, 3, 9]),  # 5 grams, 4 distinct
        ("a", "d2", 2, [1, 2, 3, 4]),           # 2 grams, 2 distinct
        ("a", "d3", 3, [7, 8]),                 # shorter than n: 0 grams
        ("a", "d4", 4, []),                     # empty
    ])
    got = {r.doc_id: (r.n_grams, r.n_distinct, r.dup_ppm)
           for r in repetition_stats(df, n=3).collect()}
    assert got == {"d1": (5, 4, 200000), "d2": (2, 2, 0),
                   "d3": (0, 0, 0), "d4": (0, 0, 0)}


def test_duplicated_spans_counts_and_stride(spark):
    from binlog_processer_spark.operators.tokens import duplicated_spans

    df = _tdf(spark, [
        ("a", "d1", 1, [1, 2, 3, 1, 2, 3]),  # gram 1-2-3 twice in d1
        ("a", "d2", 2, [1, 2, 3, 4]),        # and once in d2
        ("a", "d3", 3, [9, 9, 9]),           # unique to d3 -> filtered
    ])
    rows = duplicated_spans(df, n=3, min_docs=2).collect()
    assert len(rows) == 1 and (rows[0].n_docs, rows[0].n_occ) == (2, 3)
    # stride=2 samples positions 1,3,...: d1 keeps the position-1 copy,
    # d2 keeps its only copy -> still detected, occ drops to 2
    rows = duplicated_spans(df, n=3, min_docs=2, stride=2).collect()
    assert len(rows) == 1 and (rows[0].n_docs, rows[0].n_occ) == (2, 2)


def test_span_coverage_union_of_overlaps(spark):
    from binlog_processer_spark.operators.tokens import span_coverage

    df = _tdf(spark, [
        # d1: flagged starts 1, 2, 4 (1-2-3 twice, 2-3-1 once) -> the
        # overlapping intervals [1,3],[2,4],[4,6] union to 6, not 3+3+3
        ("a", "d1", 1, [1, 2, 3, 1, 2, 3]),
        ("a", "d2", 2, [9, 1, 2, 3, 1]),   # shares 1-2-3 (pos 2), 2-3-1 (pos 3)
        ("a", "d3", 3, [7, 7, 7, 7]),      # nothing shared
        ("a", "d4", 4, [5]),               # shorter than n
    ])
    got = {r.doc_id: (r.n_tok, r.covered_tok, r.coverage_ppm)
           for r in span_coverage(df, n=3, min_docs=2).collect()}
    # d1 flagged starts: 1 (1-2-3), 2 (2-3-1), 4 (1-2-3) ->
    # min(3,2-1)+min(3,4-2)+3 = 1+2+3 = 6 of 6
    assert got["d1"] == (6, 6, 1000000)
    # d2 flagged starts: 2, 3 -> 1+3 = 4 of 5
    assert got["d2"] == (5, 4, 800000)
    assert got["d3"] == (4, 0, 0)
    assert got["d4"] == (1, 0, 0)


def test_span_coverage_accepts_precomputed_flagged(spark):
    from binlog_processer_spark.operators.tokens import (
        duplicated_spans,
        span_coverage,
    )

    df = _tdf(spark, [
        ("a", "d1", 1, [1, 2, 3, 4]),
        ("a", "d2", 2, [1, 2, 3, 9]),
    ])
    flagged = duplicated_spans(df, n=3, min_docs=2).select("gram_md5")
    got = {r.doc_id: r.covered_tok
           for r in span_coverage(df, n=3, flagged=flagged).collect()}
    assert got == {"d1": 3, "d2": 3}


def test_repetition_stats_is_pure_projection(spark):
    # the whole statistic must evaluate per-row: no Exchange anywhere
    from binlog_processer_spark.operators.tokens import repetition_stats

    df = _tdf(spark, [("a", "d1", 1, [1, 2, 3])])
    plan = (repetition_stats(df, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_duplicated_spans_two_level_agg_no_expand(spark):
    # count_distinct would plan an Expand (x2 the exploded stream); the
    # explicit (gram, doc) -> gram two-level aggregate must not
    from binlog_processer_spark.operators.tokens import duplicated_spans

    df = _tdf(spark, [("a", "d1", 1, [1, 2, 3])])
    plan = (duplicated_spans(df, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Expand" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_doc_unigram_logprob(spark):
    from math import log

    from binlog_processer_spark.operators.tokens import doc_unigram_logprob

    # corpus: token 1 appears 6x, token 2 2x -> p(1)=0.75, p(2)=0.25
    df = spark.createDataFrame(
        [
            ("a", "d1", 1, [1, 1, 1, 1], 4),
            ("a", "d2", 2, [1, 1, 2, 2], 4),
        ],
        "source string, doc_id string, event_seq long,"
        " tokens array<int>, n_tok int",
    )
    got = {r.doc_id: r.surprisal_mn
           for r in doc_unigram_logprob(df).collect()}
    assert got["d1"] == round(-log(0.75) * 1000)
    assert got["d2"] == round((-log(0.75) - log(0.25)) / 2 * 1000)


def _seq_df(spark, rows):
    return spark.createDataFrame(
        rows, "source string, doc_id string, event_seq long, tokens array<int>"
    )


def test_bm25_topk_exact_scores_and_cut(spark):
    import math

    import pytest

    from binlog_processer_spark.operators.tokens import bm25_topk

    # 4 sequences; query {1 (in 3 docs), 9 (in 1 doc)} — the rare term
    # must dominate, tf must saturate, non-matching docs must not appear
    rows = [
        ("a", "d1", 1, [1, 9, 2]),        # both terms, short
        ("a", "d2", 2, [1, 1, 1, 2, 2]),  # common term thrice, longer
        ("a", "d3", 3, [1, 2]),           # common term once
        ("a", "d4", 4, [5, 6]),           # no query terms
    ]
    got = bm25_topk(_seq_df(spark, rows), [1, 9], k=10).collect()
    assert [r.doc_id for r in got][:1] == ["d1"]  # rare-term doc wins
    assert {r.doc_id for r in got} == {"d1", "d2", "d3"}

    # exact milli score of d1: N=4, avgdl=12/4=3, dl=3
    def term(tf, df, dl, n=4, total=12, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * (dl * n) / total)))

    d1 = round((term(1, 3, 3) + term(1, 1, 3)) * 1000)
    assert got[0].score_m == d1
    # rows beyond k are cut deterministically
    assert len(bm25_topk(_seq_df(spark, rows), [1, 9], k=2).collect()) == 2
    with pytest.raises(ValueError):
        bm25_topk(_seq_df(spark, rows), [])


def test_bm25_plan_topk_not_full_sort(spark):
    """Global top-k must be TakeOrderedAndProject (per-partition heaps),
    never a full sort shuffle, and all joins must be broadcast — at
    10^12 sequences a sort-merge join or global Sort here is the
    scale-killer."""
    from binlog_processer_spark.operators._cache import unpin_all
    from binlog_processer_spark.operators.tokens import bm25_topk

    rows = [
        ("s", "d%d" % i, i, [i % 5, 1 + i % 3, 9])
        for i in range(200)
    ]
    df = _seq_df(spark, rows).repartition(8)
    plan = bm25_topk(df, [1, 9], k=5)._jdf.queryExecution().executedPlan().toString()
    unpin_all()
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_doc_bigram_logprob_exact_conditionals(spark):
    import math

    from binlog_processer_spark.operators._cache import unpin_all
    from binlog_processer_spark.operators.tokens import doc_bigram_logprob

    rows = [
        ("a", "d1", 1, [1, 2, 3]),
        ("a", "d2", 2, [1, 2]),
        ("a", "d3", 3, [1, 3]),
        ("a", "d4", 4, [7]),       # no bigram -> absent from output
    ]
    got = {
        r.doc_id: r.surprisal2_mn
        for r in doc_bigram_logprob(_seq_df(spark, rows)).collect()
    }
    unpin_all()
    # corpus bigrams: 1-2 x2, 2-3 x1, 1-3 x1; prefix counts: 1->3, 2->1
    # d1: mean(-ln(2/3), -ln(1/1)); d2: -ln(2/3); d3: -ln(1/3)
    assert got == {
        "d1": round(((-math.log(2 / 3)) + 0.0) / 2 * 1000),
        "d2": round(-math.log(2 / 3) * 1000),
        "d3": round(-math.log(1 / 3) * 1000),
    }
    assert "d4" not in got


def test_bm25_invariances(spark):
    """Score is invariant to token order within a document, and a
    byte-identical duplicate document scores identically (corpus stats
    shift together)."""
    from binlog_processer_spark.operators._cache import unpin_all
    from binlog_processer_spark.operators.tokens import bm25_topk

    base = [
        ("a", "d1", 1, [5, 1, 9, 1, 3]),
        ("a", "d2", 2, [2, 2, 1, 4, 6, 8]),
        ("a", "d3", 3, [9, 9, 7]),
    ]
    shuffled = [
        ("a", "d1", 1, [1, 9, 5, 3, 1]),
        ("a", "d2", 2, [1, 8, 6, 4, 2, 2]),
        ("a", "d3", 3, [7, 9, 9]),
    ]
    s1 = {
        (r.doc_id): r.score_m
        for r in bm25_topk(_seq_df(spark, base), [1, 9], k=10).collect()
    }
    unpin_all()
    s2 = {
        (r.doc_id): r.score_m
        for r in bm25_topk(_seq_df(spark, shuffled), [1, 9], k=10).collect()
    }
    unpin_all()
    assert s1 == s2 and s1  # order within a doc never matters

    dup = base + [("b", "d1", 9, [5, 1, 9, 1, 3])]
    s3 = bm25_topk(_seq_df(spark, dup), [1, 9], k=10).collect()
    unpin_all()
    by_key = {(r.source, r.doc_id): r.score_m for r in s3}
    assert by_key[("a", "d1")] == by_key[("b", "d1")]


def test_vocab_stats_approx_within_tolerance(spark):
    """The HLL++ path (unbounded-vocab plan) must land within its
    configured 1% rsd band of the exact count — wide margin: 5%."""
    from binlog_processer_spark.operators.tokens import vocab_stats

    rows = [
        ("s%d" % (i % 2), [(i * 31 + j) % 5000 for j in range(20)])
        for i in range(400)
    ]
    df = _df(spark, rows).repartition(8)
    exact = {r.source: r.distinct_tok for r in vocab_stats(df).collect()}
    approx = {
        r.source: r.distinct_tok
        for r in vocab_stats(df, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for s, ex in exact.items():
        assert abs(approx[s] - ex) <= max(1, ex * 0.05), (s, ex, approx[s])


def test_merge_pair_counts_bpe_step(spark):
    from binlog_processer_spark.operators.tokens import merge_pair_counts

    df = _df(
        spark,
        [
            ("a", [1, 2, 3, 1, 2]),   # pairs: (1,2)x2, (2,3), (3,1)
            ("b", [1, 2]),            # (1,2)
            ("c", [7]),               # no pair (single token)
            ("d", []),                # no pair (empty)
        ],
    )
    got = [(r.p1, r.p2, r.cnt) for r in merge_pair_counts(df).collect()]
    # argmax pair first — the next BPE merge — then the deterministic
    # (cnt desc, p1, p2) total order
    assert got == [(1, 2, 3), (2, 3, 1), (3, 1, 1)]
    top1 = merge_pair_counts(df, top_k=1).collect()
    assert [(r.p1, r.p2, r.cnt) for r in top1] == [(1, 2, 3)]
    # top-k is per-partition heaps, never a global sort
    plan = merge_pair_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_ngram_diversity_exact_small(spark):
    from binlog_processer_spark.operators.tokens import ngram_diversity

    # row 1: tokens [1,1,2] -> unigrams {1,1,2}, bigrams {1-1, 1-2},
    # trigrams {1-1-2}; row 2: [1,2] -> unigrams {1,2}, bigram {1-2};
    # row 3 (source b): [5] -> one unigram, no bi/trigrams
    df = _df(spark, [("a", [1, 1, 2]), ("a", [1, 2]), ("b", [5])])
    got = {
        (r.source, r.n): (r.total_grams, r.distinct_grams, r.diversity_ppm)
        for r in ngram_diversity(df).collect()
    }
    assert got[("a", 1)] == (5, 2, 400_000)
    assert got[("a", 2)] == (3, 2, 666_666)
    assert got[("a", 3)] == (1, 1, 1_000_000)
    assert got[("b", 1)] == (1, 1, 1_000_000)
    # sources with zero grams at an order produce no row (nothing to
    # divide) — b has no bigrams/trigrams
    assert ("b", 2) not in got and ("b", 3) not in got


def test_ngram_diversity_approx_within_tolerance(spark):
    from binlog_processer_spark.operators.tokens import ngram_diversity

    rows = [
        ("s%d" % (i % 2), [(i * j) % 97 for j in range(1, 30)])
        for i in range(300)
    ]
    df = _df(spark, rows).repartition(8)
    exact = {
        (r.source, r.n): r.distinct_grams
        for r in ngram_diversity(df, ns=(1, 2)).collect()
    }
    approx = {
        (r.source, r.n): r.distinct_grams
        for r in ngram_diversity(df, ns=(1, 2), approx=True).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(2, 0.05 * ex), (k, ex, approx[k])
    # totals identical regardless of the distinct estimator
    te = {
        (r.source, r.n): r.total_grams
        for r in ngram_diversity(df, ns=(1, 2)).collect()
    }
    ta = {
        (r.source, r.n): r.total_grams
        for r in ngram_diversity(df, ns=(1, 2), approx=True).collect()
    }
    assert te == ta


def test_ngram_diversity_rejects_bad_orders(spark):
    import pytest as _pytest

    from binlog_processer_spark.operators.tokens import ngram_diversity

    df = _df(spark, [("a", [1, 2])])
    with _pytest.raises(ValueError):
        ngram_diversity(df, ns=())
    with _pytest.raises(ValueError):
        ngram_diversity(df, ns=(0,))


def test_pmi_topk_matches_reference(spark):
    from collections import Counter
    import math

    from binlog_processer_spark.operators.tokens import pmi_topk

    rows = [
        ("a", [1, 2, 1, 2, 3]),
        ("a", [1, 2, 3, 3, 1, 2]),
        ("b", [3, 1, 2, 1, 2, 3]),
    ]
    uni: Counter = Counter()
    bi: Counter = Counter()
    for _, toks in rows:
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    t1, t2 = sum(uni.values()), sum(bi.values())
    got = pmi_topk(_df(spark, rows), k=5, min_count=2).collect()
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    for r in got:
        want = round(
            math.log(
                bi[(r.x, r.y)] / t2 * t1 / uni[r.x] * t1 / uni[r.y]
            )
            * 1000
        )
        assert (r.pair_cnt, r.x_cnt, r.y_cnt) == (
            bi[(r.x, r.y)], uni[r.x], uni[r.y]
        )
        assert r.pmi_mn == want
    # (1,2) is the dominant collocation — 6 of 13 bigrams
    assert (got[0].x, got[0].y) == (1, 2)


def test_pmi_topk_plan_is_takeordered(spark):
    from binlog_processer_spark.operators.tokens import pmi_topk

    df = _df(spark, [("a", [1, 2, 1, 2])])
    plan = pmi_topk(df, k=3, min_count=1)._jdf.queryExecution().executedPlan().toString()
    # distributed top-k, never a single-partition global sort of the
    # bigram table
    assert "TakeOrderedAndProject" in plan
