"""Property-based invariants of the substring-dedup operators, checked
against a pure-Python reference on ARBITRARY token corpora.

One Spark job per hypothesis case would be minutes-slow, so each example
generates a whole corpus (list of documents) and the test runs few
examples (the parse property suite's pattern).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


_CORPUS = st.lists(
    st.lists(st.integers(min_value=-5, max_value=5), max_size=12),
    min_size=1,
    max_size=8,
)


def _df(spark, corpus):
    return spark.createDataFrame(
        [("s", f"d{i}", i, toks) for i, toks in enumerate(corpus)],
        "source string, doc_id string, event_seq long, tokens array<int>",
    )


def _grams(toks, n):
    return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS, n=st.integers(min_value=2, max_value=4))
def test_repetition_matches_python_reference(spark, corpus, n):
    from binlog_processer_spark.operators.tokens import repetition_stats

    got = {
        r.doc_id: (r.n_grams, r.n_distinct, r.dup_ppm)
        for r in repetition_stats(_df(spark, corpus), n=n).collect()
    }
    for i, toks in enumerate(corpus):
        g = _grams(toks, n)
        ng, nd = len(g), len(set(g))
        ppm = 0 if ng == 0 else round((ng - nd) * 1_000_000 / ng)
        assert got[f"d{i}"] == (ng, nd, ppm)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS, n=st.integers(min_value=2, max_value=4))
def test_span_coverage_matches_interval_union(spark, corpus, n):
    from binlog_processer_spark.operators.tokens import span_coverage

    # python reference: flagged grams = in >=2 docs; coverage = union of
    # [i, i+n-1] over flagged start positions
    docs_of = {}
    for i, toks in enumerate(corpus):
        for g in set(_grams(toks, n)):
            docs_of.setdefault(g, set()).add(i)
    flagged = {g for g, ds in docs_of.items() if len(ds) >= 2}

    got = {
        r.doc_id: (r.n_tok, r.covered_tok)
        for r in span_coverage(_df(spark, corpus), n=n, min_docs=2).collect()
    }
    for i, toks in enumerate(corpus):
        covered = set()
        for p, g in enumerate(_grams(toks, n)):
            if g in flagged:
                covered.update(range(p, p + n))
        assert got[f"d{i}"] == (len(toks), len(covered))
        # structural invariant: coverage never exceeds the document
        assert got[f"d{i}"][1] <= len(toks)
