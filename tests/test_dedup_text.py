"""Dedup + text-analysis operators on handcrafted docs."""

from pyspark.sql import functions as F

from binlog_processer_spark.functions.text import (
    fingerprints,
    quality_scores,
    token_count_cols,
)
from binlog_processer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_block_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "s"),
    (2, "the quick brown fox jumps over the lazy dog", "en", "s"),   # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat", "en", "s"),   # near dup
    (4, "completely different words entirely unrelated content here", "en", "s"),
    (5, "", "en", "s"),
    (6, None, "en", "s"),
]
SCHEMA = "doc_id bigint, text string, lang string, source string"


def _docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_exact_dedup(spark):
    groups = exact_dedup(_docs(spark)).collect()
    # docs 1+2 identical; 5 and 6 both normalize to '' → also a group
    by_rep = {g.rep_doc_id: g.dup_cnt for g in groups}
    assert by_rep[1] == 2
    assert by_rep[5] == 2


def test_minhash_finds_near_dups(spark):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert (1, 2) in pairs          # identical docs always collide
    assert (3, 4) not in pairs      # unrelated docs don't
    assert (1, 4) not in pairs


def test_simhash_near_dups(spark):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in
             simhash_block_pairs(_docs(spark)).collect()}
    assert pairs[(1, 2)] == 0       # identical → distance 0
    assert (1, 4) not in pairs or pairs[(1, 4)] > 0


def test_ngram_jaccard(spark):
    pairs = {(r.doc_a, r.doc_b): r.jaccard_bp for r in
             ngram_jaccard_pairs(_docs(spark), min_jaccard_bp=1).collect()}
    assert pairs[(1, 2)] == 10000   # identical shingle sets
    assert 0 < pairs[(1, 3)] < 10000
    assert (1, 4) not in pairs      # no shared shingles at all


def test_token_counts_and_quality(spark):
    tc = {r.doc_id: r for r in token_count_cols(_docs(spark)).collect()}
    assert tc[1].ws_tokens == 9
    assert tc[5].ws_tokens == 0 and tc[6].ws_tokens == 0
    qs = {r.doc_id: r for r in quality_scores(_docs(spark)).collect()}
    assert qs[1].stopword_bp > 0        # 'the' twice
    assert qs[4].stopword_bp == 0
    assert qs[5].quality_bp == 0


def test_fingerprints_stability(spark):
    fp = {r.doc_id: r for r in fingerprints(_docs(spark)).collect()}
    assert fp[1].content_fp == fp[2].content_fp
    assert fp[1].content_fp != fp[3].content_fp
    assert fp[1].shingle_fp == fp[2].shingle_fp
    assert fp[5].shingle_fp == fp[6].shingle_fp  # both empty → md5('')


def test_ngram_jaccard_stop_shingle_cap(spark):
    """An injected stop-shingle shared by every doc must not explode the
    candidate join: with max_df below the corpus size, pairs connected ONLY
    through the stop-shingle disappear, while genuinely similar pairs
    (sharing non-hot shingles) survive with full-denominator jaccard."""
    stop = "lorem ipsum dolor"
    rows = [
        # 40 docs sharing ONLY the stop-shingle + a unique tail
        *[(i, f"lorem ipsum dolor unique{i} tail{i}", "en", "s") for i in range(40)],
        # one genuine near-dup pair with private overlap
        (100, "alpha beta gamma delta epsilon", "en", "s"),
        (101, "alpha beta gamma delta zeta", "en", "s"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)

    uncapped = ngram_jaccard_pairs(docs, min_jaccard_bp=1, max_df=None)
    capped = ngram_jaccard_pairs(docs, min_jaccard_bp=1, max_df=10)
    n_un, n_cap = uncapped.count(), capped.count()
    # stop-shingle alone fans out C(40,2) = 780 pairs uncapped
    assert n_un >= 780
    # capped: the hot shingle is excluded from candidate generation
    assert n_cap < 40
    genuine = {(r.doc_a, r.doc_b): r.jaccard_bp for r in capped.collect()}
    assert (100, 101) in genuine
    # denominator uses FULL shingle sets: 2 common of 3+3 shingles → 5000 bp
    assert genuine[(100, 101)] == 5000


def test_connected_components_transitive_clusters(spark):
    from binlog_processer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3 (1~3 NOT paired: the transitivity case), pair 7-9,
        # and a 4-node star 10-{11,12,13}
        [(1, 2), (2, 3), (7, 9), (10, 11), (10, 12), (10, 13)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r.doc_id: r.component_id
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7,
                   10: 10, 11: 10, 12: 10, 13: 10}


def test_connected_components_long_chain_converges(spark):
    from binlog_processer_spark.operators.dedup import connected_components

    # a 12-node path needs ~diameter rounds of plain min-propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "doc_a bigint, doc_b bigint"
    )
    got = {r.doc_id: r.component_id
           for r in connected_components(pairs).collect()}
    assert set(got.values()) == {100} and len(got) == 12


def test_alternating_components_matches_min_label(spark):
    from binlog_processer_spark.operators.dedup import (
        alternating_components,
        connected_components,
    )

    import random

    rng = random.Random(7)
    # random sparse graph: chains, stars, isolated pairs, dense blob
    edges = [(i, i + 1) for i in range(1, 6)]
    edges += [(20, v) for v in (21, 22, 23)]
    edges += [(30, 31), (40, 41)]
    edges += [(rng.randint(50, 60), rng.randint(50, 60)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    want = {r.doc_id: r.component_id
            for r in connected_components(pairs).collect()}
    got = {r.doc_id: r.component_id
           for r in alternating_components(pairs).collect()}
    assert got == want


def test_alternating_components_beats_diameter(spark):
    from binlog_processer_spark.operators.dedup import (
        alternating_components,
    )

    # a 64-node path has diameter 63: min-label propagation needs ~63
    # rounds; the alternating algorithm must finish in O(log^2 n) — give
    # it 12 and it converges with the single component labeled by the min
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200, 263)], "doc_a bigint, doc_b bigint"
    )
    got = {r.doc_id: r.component_id
           for r in alternating_components(pairs, max_iter=12).collect()}
    assert set(got.values()) == {200} and len(got) == 64


def test_alternating_components_string_ids(spark):
    from binlog_processer_spark.operators.dedup import (
        alternating_components,
    )

    # doc ids are strings in the corpus: min must be lexicographic,
    # matching the pair generators and the DuckDB oracle
    pairs = spark.createDataFrame(
        [("d09", "d10"), ("d10", "d2")], "doc_a string, doc_b string"
    )
    got = {r.doc_id: r.component_id
           for r in alternating_components(pairs).collect()}
    assert got == {"d09": "d09", "d10": "d09", "d2": "d09"}


def test_keep_representatives(spark):
    from binlog_processer_spark.operators.dedup import keep_representatives

    docs = spark.createDataFrame(
        [(i, "s") for i in range(1, 7)], "doc_id bigint, source string"
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)],
        "doc_id bigint, component_id bigint",
    )
    kept = sorted(r.doc_id for r in keep_representatives(docs, comp).collect())
    # reps 1 and 5 survive; 4 was never paired; 2, 3, 6 drop
    assert kept == [1, 4, 5]


def test_incremental_minhash_equals_full_restricted(spark):
    from binlog_processer_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_bands,
        minhash_lsh_pairs,
    )

    docs_df = _docs(spark)
    old = docs_df.filter(F.col("doc_id") % 2 != 0)
    new = docs_df.filter(F.col("doc_id") % 2 == 0)
    index = minhash_bands(old, k=8, bands=4)
    inc = {
        (r.doc_a, r.doc_b)
        for r in incremental_minhash_pairs(new, index, k=8, bands=4).collect()
    }
    full = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs_df, k=8, bands=4).collect()
    }
    touching_new = {p for p in full if p[0] % 2 == 0 or p[1] % 2 == 0}
    assert inc == touching_new
    # docs 1,2,3 all pair under full LSH; only pairs touching doc 2 remain
    assert (1, 2) in inc and (2, 3) in inc and (1, 3) not in inc


def test_filter_funnel_counts_and_single_pass(spark):
    from pyspark.sql import functions as F

    from binlog_processer_spark.functions.text import (
        apply_filter_funnel,
        filter_funnel,
    )

    docs = spark.createDataFrame(
        [
            # passes everything: en, 20 words incl stopwords, diverse
            (1, " ".join(f"the w{i}" for i in range(10)), "en", "s"),
            # wrong language — must ONLY fail stage 0
            (2, " ".join(f"the w{i}" for i in range(10)), "zh", "s"),
            # too short (3 words)
            (3, "the quick fox", "en", "s"),
            # no stopwords at all
            (4, " ".join(f"w{i}" for i in range(20)), "en", "s"),
            # one word repeated: fails distinct_ratio (and stopword)
            (5, " ".join(["the"] * 20 + ["x"] * 10), "en", "s"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    rep = {
        r.stage: (r.fail_marginal, r.survivors)
        for r in filter_funnel(docs).collect()
    }
    assert rep["lang_allowed"] == (1, 4)      # doc2 out
    assert rep["min_words"] == (1, 3)         # doc3 out
    assert rep["max_words"] == (0, 3)
    assert rep["stopword_floor"] == (1, 2)    # doc4 out
    # doc5: 2 distinct of 30 words -> fails marginal AND cumulative
    assert rep["distinct_ratio"][0] >= 1
    assert rep["distinct_ratio"][1] == 1      # only doc1 survives
    kept = [r.doc_id for r in apply_filter_funnel(docs).collect()]
    assert kept == [1]

    # single-pass: the report plan contains exactly one scan and no
    # Exchange beyond the single-row final aggregate's
    plan = filter_funnel(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1


def test_source_overlap_matrix(spark):
    from binlog_processer_spark.operators.dedup import source_overlap_matrix

    docs = spark.createDataFrame(
        [(1, "a", "crawl1"), (2, "b", "crawl2"), (3, "c", "crawl2"),
         (4, "d", "books"), (9, "e", "crawl1")],
        "doc_id bigint, text string, source string",
    )
    pairs = spark.createDataFrame(
        # crawl1~crawl2 twice (1-2, 9-3), within-crawl2 once (2-3),
        # books~crawl1 once (4-9); pair order must not matter
        [(1, 2), (9, 3), (2, 3), (9, 4)],
        "doc_a bigint, doc_b bigint",
    )
    got = {(r.source_a, r.source_b): r.n_pairs
           for r in source_overlap_matrix(docs, pairs).collect()}
    assert got == {("crawl1", "crawl2"): 2, ("crawl2", "crawl2"): 1,
                   ("books", "crawl1"): 1}


def test_pii_scrub_counts_and_redaction(spark):
    from binlog_processer_spark.functions.text import pii_scrub

    d = spark.createDataFrame(
        [
            (1, "mail a.b@x.co from 10.1.2.3 call +1-555-0192 end"),
            (2, "no pii here at all"),
            (3, None),
            # an email whose domain looks dotted-numeric must NOT also
            # count as an IP: email redacts first, sequentially
            (4, "x@sub.domain.org and 192.168.0.1 and 12-3456-789"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in pii_scrub(d).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 1, 1)
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 0, 0)
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 0)
    assert out[3].clean_len == 0
    assert (out[4].n_email, out[4].n_ipv4, out[4].n_phone) == (1, 1, 1)
    # fingerprint is of the REDACTED text: identical docs with different
    # PII payloads converge to the same fp
    d2 = spark.createDataFrame(
        [
            (1, "reach me at alice@example.com today"),
            (2, "reach me at bob.smith@other.net today"),
        ],
        "doc_id int, text string",
    )
    fps = {r.doc_id: r.clean_fp for r in pii_scrub(d2).collect()}
    assert fps[1] == fps[2]


def test_pii_scrub_is_map_only(spark):
    from binlog_processer_spark.functions.text import pii_scrub

    d = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a@b.co").alias("text")
    )
    plan = pii_scrub(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_containment_catches_quote_inclusion(spark):
    from binlog_processer_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    long_words = " ".join(f"w{i}" for i in range(60))
    snippet = " ".join(f"w{i}" for i in range(10, 18))  # verbatim slice
    d = spark.createDataFrame(
        [(1, long_words), (2, snippet), (3, "totally different words here")],
        "doc_id long, text string",
    )
    pairs = containment_pairs(d, n=3, min_containment_bp=9000).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    r = pairs[0]
    # every snippet shingle is in the parent: containment of the short
    # side is exactly 1.0; the long side's is small
    assert r.cont_b_bp == 10000 and r.cont_a_bp < 2000
    # jaccard at the same bar misses it — the case this operator exists for
    assert (
        ngram_jaccard_pairs(d, n=3, min_jaccard_bp=9000).count() == 0
    )


def test_encoding_qa_flags_mojibake(spark):
    from binlog_processer_spark.functions.text import encoding_qa

    d = spark.createDataFrame(
        [
            (1, "clean ascii text"),
            (2, "bad � decode � here"),
            (3, "ctrl\x01char\x1f"),
            (4, "tabs\tand\nnewlines are fine"),
            (5, "café du 世界"),
            (6, None),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in encoding_qa(d).collect()}
    assert out[1].ok and out[1].n_repl == 0 and out[1].ascii_bp == 10000
    assert out[2].n_repl == 2 and not out[2].ok
    assert out[3].n_ctrl == 2 and not out[3].ok
    assert out[4].ok  # \t \n are not control noise
    assert out[5].n_repl == 0 and out[5].ascii_bp < 10000
    assert out[6].n_chars == 0 and out[6].ascii_bp == 10000 and out[6].ok
    plan = encoding_qa(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_drop_contained_keeps_container(spark):
    from binlog_processer_spark.operators.dedup import (
        containment_pairs,
        drop_contained,
    )

    long_words = " ".join(f"w{i}" for i in range(60))
    snippet = " ".join(f"w{i}" for i in range(10, 18))
    d = spark.createDataFrame(
        [(1, long_words), (2, snippet), (3, "totally different words here")],
        "doc_id long, text string",
    )
    pairs = containment_pairs(d, n=3, min_containment_bp=9000)
    kept = sorted(r.doc_id for r in drop_contained(d, pairs).collect())
    assert kept == [1, 3]  # the quote goes, the container and bystander stay
    # mutual containment (identical docs) drops the higher id
    d2 = spark.createDataFrame(
        [(7, long_words), (9, long_words)], "doc_id long, text string"
    )
    p2 = containment_pairs(d2, n=3, min_containment_bp=9000)
    assert sorted(
        r.doc_id for r in drop_contained(d2, p2).collect()
    ) == [7]


def test_pairs_from_band_index_equals_full_lsh(spark):
    """Deriving candidates from a persisted band relation is
    bit-identical to the inline LSH join — the build-once/derive-many
    equivalence dedup_source_matrix relies on."""
    from binlog_processer_spark.operators.dedup import (
        minhash_bands,
        minhash_lsh_pairs,
        pairs_from_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, k=8, bands=4).collect()
    }
    bands = minhash_bands(docs, k=8, bands=4)
    # round-trip through parquet like a real index table
    import tempfile

    path = tempfile.mkdtemp(prefix="blp_bandix_") + "/b"
    bands.write.parquet(path)
    derived = {
        (r["doc_a"], r["doc_b"])
        for r in pairs_from_band_index(
            spark.read.parquet(path)
        ).collect()
    }
    assert derived == full and full
