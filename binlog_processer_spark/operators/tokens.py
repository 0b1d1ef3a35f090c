"""Token-level corpus statistics: heavy hitters, document frequency,
vocabulary stats.

A training pipeline over pre-tokenized sequences needs token-level QA:
which token ids dominate the mix (tokenizer pathologies, boilerplate
contamination), how many documents each token touches (IDF inputs, stop
token lists), and how large each source's effective vocabulary is. The
reference's counters are row-level (BinlogCount.java analogue); these
operators drop one level down, to the elements of the ``tokens`` array.

Scale posture. The naive plan for every one of these is
``explode(tokens)`` → shuffle n_tok x rows — at 10^12 sequences x ~2k
tokens that is 10^15 shuffle rows. Three different mitigations are used,
matched to what each statistic allows:

- ``token_frequencies`` (exact): explode + hash aggregate. Map-side
  partial aggregation collapses each task's output to its DISTINCT token
  count, so with a bounded vocabulary (token ids are ``% 32000`` here,
  ~10^5 for real BPE vocabs) the shuffle is tasks x vocab, not
  tasks x tokens — the explode never crosses the wire. This is the right
  exact plan whenever the vocabulary is bounded.
- ``heavy_hitters`` (exact answer, sketch-pruned plan): when the id
  space is NOT bounded (n-gram ids, hash-composed features), the partial
  aggregate is as large as the data. A per-partition Misra-Gries summary
  (capacity 2/phi, provable superset of every token with relative
  support >= phi) runs inside ``mapInArrow`` — zero shuffle — and only
  the candidate set (numPartitions x capacity rows, broadcast back) is
  exactly counted in a second pass. The output EQUALS the exact answer;
  the sketch only prunes the plan.
- ``token_doc_frequency``: per-row ``array_distinct`` BEFORE the
  explode caps each row's contribution at its distinct-token count —
  the standard df/IDF shrink.

All thresholds are integer-arithmetic (``cnt * 1_000_000 >= ppm *
total``) so Spark and the DuckDB oracle agree bit-for-bit with no
float-ceil ambiguity.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _total_tokens(kept: DataFrame) -> DataFrame:
    """1-row total element count. Prefers the ``n_tok`` column (the input
    contract carries it, and n_tok == size(tokens) by construction): the
    total pass is then a column-pruned int-column sum — the parquet scan
    never touches the token arrays, so at 10^12 rows this extra pass
    reads ~1% of the bytes the candidate/count passes read."""
    col = (
        F.col("n_tok")
        if "n_tok" in kept.columns
        else F.size("tokens")
    )
    return kept.agg(F.sum(col).cast("bigint").alias("total_tok"))


def token_frequencies(
    kept: DataFrame, min_support_ppm: int = 2000
) -> DataFrame:
    """Exact token counts at relative support >= ``min_support_ppm``
    (parts-per-million of all token occurrences).

    Plan: explode → hash aggregate (map-side combine bounds the shuffle
    at tasks x vocab) → broadcast the 1-row total → integer-arithmetic
    support filter.
    """
    counts = (
        kept.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(_total_tokens(kept)))
        .filter(
            F.col("cnt") * F.lit(1_000_000)
            >= F.lit(int(min_support_ppm)) * F.col("total_tok")
        )
        .select("token", "cnt")
    )


def _mg_candidates(capacity: int):
    """mapInArrow partition function: batched Misra-Gries over the
    flattened token stream of one partition.

    Invariant (standard MG analysis): each compress step subtracts
    ``cut`` from >= capacity+1 distinct items at once, so total
    decrements D <= n_p / (capacity+1); an item with partition count
    > n_p/(capacity+1) cannot reach zero and is always emitted.
    """
    import numpy as np

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        counts: dict[int, int] = {}
        for batch in batches:
            flat = batch.column(0).flatten().to_numpy(zero_copy_only=False)
            if len(flat) == 0:
                continue
            uniq, cnt = np.unique(flat, return_counts=True)
            for t, c in zip(uniq.tolist(), cnt.tolist()):
                counts[t] = counts.get(t, 0) + c
            if len(counts) > capacity:
                vals = np.fromiter(counts.values(), dtype=np.int64)
                # subtracting the (size-capacity)-th smallest counter and
                # dropping <=0 leaves <= capacity survivors in one pass
                cut = int(np.partition(vals, len(vals) - capacity - 1)[
                    len(vals) - capacity - 1
                ])
                counts = {t: c - cut for t, c in counts.items() if c > cut}
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(counts.keys()), type=pa.int32())], ["token"]
        )

    return fn


def heavy_hitters(
    kept: DataFrame, min_support_ppm: int = 2000
) -> DataFrame:
    """Exact heavy hitters (support >= min_support_ppm of all token
    occurrences) via a zero-shuffle Misra-Gries candidate pass + an
    exact count restricted to candidates.

    Correctness does not depend on the sketch's estimates: with capacity
    2/phi the per-partition summary provably retains every token whose
    partition count >= phi x n_p, and a token with global support >= phi
    must reach that bar in at least one partition (weighted averaging),
    so the candidate union is a superset of the answer. Phase 2 counts
    candidates exactly and applies the same integer threshold — output
    == ``token_frequencies`` on every input.

    At scale: phase 1 moves numPartitions x capacity candidate ids;
    phase 2's hash aggregate is pre-filtered by a broadcast semi-join,
    so its map-side output is tasks x |candidates| — nothing anywhere
    is proportional to the token stream.
    """
    if not 1 <= int(min_support_ppm) <= 1_000_000:
        # 0 divides by zero; > 10^6 silently gives capacity 0 (empty
        # output). For an unpruned table use token_frequencies(ppm=0).
        raise ValueError(
            f"min_support_ppm {min_support_ppm} outside [1, 1000000]"
        )
    phi_inv = 1_000_000 // int(min_support_ppm)
    capacity = 2 * phi_inv
    cand = (
        kept.select("tokens")
        .mapInArrow(
            _mg_candidates(capacity), schema="token int"
        )
        .distinct()
    )
    exact = (
        kept.select(F.explode("tokens").alias("token"))
        .join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(_total_tokens(kept)))
        .filter(
            F.col("cnt") * F.lit(1_000_000)
            >= F.lit(int(min_support_ppm)) * F.col("total_tok")
        )
        .select("token", "cnt")
    )


def token_doc_frequency(
    kept: DataFrame, min_df_ppm: int = 100_000
) -> DataFrame:
    """Document frequency: how many rows contain each token at least
    once, at relative df >= ``min_df_ppm`` of all rows (the IDF/stop
    token input).

    ``array_distinct`` runs per-row BEFORE the explode, so each row
    contributes at most its distinct-token count — with repeated tokens
    (natural text) this shrinks the exploded stream well below
    sum(n_tok), and map-side combine bounds the shuffle at tasks x vocab
    as in ``token_frequencies``.
    """
    n_rows = kept.agg(F.count("*").cast("bigint").alias("n_rows"))
    df_counts = (
        kept.select(
            F.explode(F.array_distinct("tokens")).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("df_cnt"))
    )
    return (
        df_counts.crossJoin(F.broadcast(n_rows))
        .filter(
            F.col("df_cnt") * F.lit(1_000_000)
            >= F.lit(int(min_df_ppm)) * F.col("n_rows")
        )
        .select("token", "df_cnt")
    )


def doc_idf_score(
    kept: DataFrame,
    df_table: DataFrame | None = None,
    n_rows: DataFrame | None = None,
) -> DataFrame:
    """Per-document rare-token density: sum of IDF = ln(N / df) over the
    document's DISTINCT tokens, published in milli-nats (bigint). High
    scores flag documents dominated by rare tokens (misparsed payloads,
    unusual boilerplate) — the token-level complement of the text quality
    scores in functions/text.py.

    IDF is inherently two-pass (the weights are a corpus statistic);
    callers that already materialized ``token_doc_frequency`` and the row
    count pass them in — the same precomputed-input pattern as
    ``reconcile``/``repair`` accept ``fs`` — otherwise both are derived
    here. The df table is vocabulary-bounded, so the join side is
    broadcast; the per-doc aggregate shuffles (source, doc_id, token)
    triples AFTER per-row array_distinct + global distinct dedup.
    """
    if df_table is None:
        df_table = token_doc_frequency(kept, min_df_ppm=0)
    if n_rows is None:
        n_rows = kept.agg(F.count("*").cast("bigint").alias("n_rows"))
    triples = (
        kept.select(
            "source",
            "doc_id",
            F.explode(F.array_distinct("tokens")).alias("token"),
        )
        # a document routed several times (CDC copies) must score once
        .distinct()
    )
    return (
        triples.join(F.broadcast(df_table), "token")
        .crossJoin(F.broadcast(n_rows))
        .groupBy("source", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.log(
                        F.col("n_rows").cast("double") / F.col("df_cnt")
                    )
                )
                * 1000
            )
            .cast("bigint")
            .alias("idf_mc")
        )
    )


def doc_unigram_logprob(
    kept: DataFrame,
    freqs: DataFrame | None = None,
    total: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram surprisal: mean over token OCCURRENCES
    of −ln p(token), p estimated from the corpus itself, published in
    milli-nats (bigint). The CCNet-style model-based quality signal
    (Wenzek et al. 2020 rank documents by LM perplexity; a unigram LM is
    its zero-context form and needs no model artifact): low = repetitive
    boilerplate, high = noise/misparse — the mix keeps the middle band.

    Two-pass by nature (the LM is a corpus statistic). Pass precomputed
    ``token_frequencies(kept, min_support_ppm=0)`` + total to reuse
    them — the same precomputed-input pattern as ``doc_idf_score``.
    Unlike IDF this weighs every occurrence (surprisal is a property of
    the stream, not the vocabulary): explode → broadcast-join the
    vocabulary-bounded freq table → per-doc mean. Tokens below the freq
    table's support floor (when a caller passes a pruned table) are
    scored at the floor of the table — join inner, so they drop out of
    the mean; pass an unpruned table for exactness.
    """
    if freqs is None:
        freqs = token_frequencies(kept, min_support_ppm=0)
    if total is None:
        total = _total_tokens(kept)
    occ = kept.select(
        "source", "doc_id", "event_seq", F.explode("tokens").alias("token")
    )
    return (
        occ.join(F.broadcast(freqs), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("source", "doc_id", "event_seq")
        .agg(
            F.round(
                F.avg(
                    -F.log(
                        F.col("cnt").cast("double") / F.col("total_tok")
                    )
                )
                * 1000
            )
            .cast("bigint")
            .alias("surprisal_mn")
        )
    )


def _gram_strings(n: int, stride: int = 1) -> F.Column:
    """Array of the row's token ``n``-grams, each rendered as the
    ``'-'``-joined decimal token string (identical text in Spark and
    DuckDB, so digests agree bit-for-bit across engines).

    ``sequence(1, stop)`` DESCENDS when ``stop < 1`` in Spark, so rows
    shorter than ``n`` tokens are guarded to an empty array explicitly.
    """
    stop = F.size("tokens") - F.lit(n - 1)
    seq = F.sequence(F.lit(1), stop, F.lit(stride))
    grams = F.transform(
        seq,
        lambda i: F.array_join(
            F.slice(F.col("tokens"), i, n).cast("array<string>"), "-"
        ),
    )
    return F.when(stop >= 1, grams).otherwise(
        F.array().cast("array<string>")
    )


def _gram_arrays(n: int) -> F.Column:
    """Array of the row's token ``n``-grams as raw int sub-arrays — for
    count-only consumers (``repetition_stats``): no per-gram string
    build, ~30% cheaper than ``_gram_strings`` at sf0.1. Distinct counts
    agree with the string form because the ``'-'``-join of decimal ints
    is injective (a ``-`` can only follow a separator as a sign), so the
    DuckDB oracle can keep its string-based n_distinct."""
    stop = F.size("tokens") - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), stop),
        lambda i: F.slice(F.col("tokens"), i, n),
    )
    return F.when(stop >= 1, grams).otherwise(
        F.array().cast("array<array<int>>")
    )


def repetition_stats(kept: DataFrame, n: int = 3) -> DataFrame:
    """Per-event duplicate-``n``-gram fraction — the Gopher-style
    within-document repetition filter (Rae et al. 2021 §A1.1 use the
    fraction of duplicated n-grams to drop boilerplate/spam documents).

    Output: one row per routed event ``(source, doc_id, event_seq)`` with
    the gram count, distinct-gram count, and the duplicate fraction in
    ppm (bigint — float columns don't survive the driver's value-hash
    gate). Downstream a training mix consumes this as a filter predicate
    (``dup_ppm < threshold``), never as a collected report.

    Scale posture: the entire statistic is ONE per-row codegen projection
    — the gram array, ``array_distinct``, and the ratio all evaluate
    inside the row, so there is no explode, no shuffle, and no state;
    cost is linear in bytes scanned at any corpus size.
    """
    grams = _gram_arrays(n)
    n_grams = F.size(grams).cast("bigint")
    n_distinct = F.size(F.array_distinct(grams)).cast("bigint")
    return kept.select(
        "source",
        "doc_id",
        "event_seq",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        F.when(n_grams == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.round((n_grams - n_distinct) * 1_000_000 / n_grams).cast(
                "bigint"
            )
        )
        .alias("dup_ppm"),
    )


def duplicated_spans(
    kept: DataFrame, n: int = 8, min_docs: int = 2, stride: int = 1
) -> DataFrame:
    """Cross-document duplicated token spans: every ``n``-gram of the
    token stream that occurs in at least ``min_docs`` distinct documents,
    with its document reach and total occurrence count.

    This is the Spark-native stand-in for suffix-array substring
    deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — their ExactSubstr pass): a rolling window
    of ``n``-token grams is digested per position, and grams shared
    across documents mark the duplicated spans that doc-level MinHash /
    SimHash (operators/dedup.py) cannot see because the containing
    documents differ elsewhere.

    Plan: per-row gram digests (codegen) → explode → TWO-LEVEL exact
    aggregate — ``(gram, doc)`` first, then ``gram``. The explicit
    two-level shape replaces ``count_distinct(doc_id)``, whose
    single-level plan Spark executes via an Expand (×2 the exploded
    stream); here level 1 gets full map-side combine (within-document
    repeats collapse before the wire) and level 2 shuffles only the
    already-bounded ``(gram, doc)`` pairs.

    Scale posture: the exploded stream is ~sum(n_tok)/stride rows of
    (16-byte digest, doc id) — the same asymptotic cost every published
    substring-dedup pipeline pays for its candidate pass. At 10^12
    sequences set ``stride > 1`` (sample every stride-th position): any
    duplicated span of length >= n + stride - 1 still collides on at
    least one sampled gram, so candidates are recalled with a bounded
    factor-stride cost cut, to be confirmed by an exact pass over the
    flagged documents only.
    """
    pairs = (
        kept.select(
            F.col("doc_id"),
            F.explode(_gram_strings(n, stride)).alias("gram"),
        )
        .select(F.md5("gram").alias("gram_md5"), "doc_id")
        .groupBy("gram_md5", "doc_id")
        .agg(F.count("*").alias("occ"))
    )
    return (
        pairs.groupBy("gram_md5")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("occ").cast("bigint").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def span_coverage(
    kept: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    flagged: DataFrame | None = None,
) -> DataFrame:
    """Resolution pass of exact-substring deduplication: for every routed
    event, the number of token positions covered by an ``n``-gram that
    also occurs in at least ``min_docs`` distinct documents, plus that
    count as a ppm fraction of the row's length.

    ``duplicated_spans`` is the candidate pass (WHICH spans are shared);
    this is the decision pass (HOW MUCH of each document those spans
    cover) — Lee et al. 2022 drop or trim documents once duplicated
    coverage crosses a threshold, and a training mix consumes this
    output the same way (``coverage_ppm > threshold`` ⇒ trim/drop).

    Pass a precomputed ``flagged`` frame (one ``gram_md5`` column, e.g.
    ``duplicated_spans(...).select("gram_md5")``) to reuse an existing
    candidate set; by default the candidate set is derived here from the
    same exploded relation (persisted once, never exploded twice).

    Coverage is the measure of the UNION of the flagged intervals
    ``[i, i+n-1]``: per document, flagged start positions are sorted and
    each contributes ``min(n, next_start - start)`` — overlapping spans
    are not double-counted, so ``covered_tok <= n_tok`` always.

    Scale posture: one explode (the candidate-pass cost every substring
    dedup pays), map-side-combined two-level aggregate for the flagged
    set, a semi join on the 16-byte digest, and a per-document window
    over FLAGGED positions only (duplicated text is the minority of a
    real corpus, so the window input is far smaller than the explode).
    The final join back to ``kept`` keys on the event grain — at 10^12
    rows both sides are hash-partitioned on the same key, no broadcast
    needed and none attempted.
    """
    from binlog_processer_spark.operators._cache import pin

    grain = ["source", "doc_id", "event_seq"]
    pos = kept.select(
        *grain, F.posexplode(_gram_strings(n)).alias("j", "gram")
    ).select(
        *grain,
        (F.col("j") + 1).alias("i"),
        F.md5("gram").alias("gram_md5"),
    )
    if flagged is None:
        # pos feeds both the candidate derivation and the hits join —
        # pin it so the explode runs once (unpin_all() releases it)
        pos = pin(pos)
        flagged = (
            pos.groupBy("gram_md5", "doc_id")
            .agg(F.count("*").alias("occ"))
            .groupBy("gram_md5")
            .agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .select("gram_md5")
        )
    else:
        flagged = flagged.select("gram_md5")

    w = Window.partitionBy(*grain).orderBy("i")
    covered = (
        pos.join(flagged, "gram_md5", "left_semi")
        .withColumn(
            "cov",
            F.least(
                F.lit(n),
                F.coalesce(F.lead("i").over(w) - F.col("i"), F.lit(n)),
            ),
        )
        .groupBy(*grain)
        .agg(F.sum("cov").cast("bigint").alias("covered_tok"))
    )
    n_tok = F.size("tokens").cast("bigint")
    return (
        kept.select(*grain, n_tok.alias("n_tok"))
        .join(covered, grain, "left")
        .select(
            *grain,
            "n_tok",
            F.coalesce("covered_tok", F.lit(0)).cast("bigint").alias(
                "covered_tok"
            ),
            F.round(
                F.coalesce("covered_tok", F.lit(0))
                * 1_000_000
                / F.greatest(F.col("n_tok"), F.lit(1))
            )
            .cast("bigint")
            .alias("coverage_ppm"),
        )
    )


def vocab_stats(kept: DataFrame, approx: bool = False) -> DataFrame:
    """Per-source vocabulary report: rows, total token occurrences,
    distinct token ids.

    The distinct count is the one genuinely expensive statistic. Exact
    COUNT DISTINCT shuffles source × vocab after partial aggregation —
    fine for bounded vocabs (the default; the oracle gates it exactly).
    ``approx=True`` swaps in ``approx_count_distinct`` (HyperLogLog++,
    rsd 1%): the shuffle then carries one fixed-size sketch per
    (task, source) instead of the vocabulary — THE plan for unbounded
    id spaces (hash-composed features, n-gram ids), where the exact
    partial aggregate is as large as the data. Sketch estimates are
    engine-specific, so the approx path is gated by a pytest tolerance
    test against the exact path, not by the cross-engine oracle.
    """
    per_row = kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.size("tokens")).cast("bigint").alias("total_tok"),
    )
    distinct_agg = (
        F.approx_count_distinct("token", rsd=0.01)
        if approx
        else F.count_distinct("token")
    )
    per_tok = (
        kept.select("source", F.explode("tokens").alias("token"))
        .groupBy("source")
        .agg(distinct_agg.cast("bigint").alias("distinct_tok"))
    )
    return per_row.join(per_tok, "source").select(
        "source", "n_rows", "total_tok", "distinct_tok"
    )


def bm25_topk(
    kept: DataFrame,
    query_tokens: list[int],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval: top-k sequences for a bag of query token
    ids, scored with the Lucene non-negative idf variant

        score = Σ_t  ln(1 + (N − df + ½)/(df + ½))
                   · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    published in milli-points (bigint). This is token-space retrieval —
    the lexical complement of the embedding-space ANN in
    ``similarity.cosine_topk`` — used for targeted corpus probes
    ("which training sequences mention these ids") and as the sparse arm
    of contamination sweeps.

    Scale plan (the naive plan explodes 10^15 token occurrences):

    - ``arrays_overlap`` against the literal query array prunes
      non-matching sequences BEFORE any explode — the corpus-wide scan
      stays a codegen filter over the array column.
    - the explode that follows is over ``filter(tokens, t -> t IN q)``,
      so only occurrences OF QUERY TOKENS are materialized (bounded by
      the posting lists, not the token stream).
    - df comes from the tf relation itself (one groupBy of a tiny
      relation) and joins back broadcast; N and Σdl are one column-pruned
      1-row aggregate (exact bigints, so dl/avgdl = dl·N/Σdl is a fixed
      double expression both engines evaluate identically — no
      cross-partition float reduction feeds the score).
    - global top-k is ``orderBy(...).limit(k)`` — Catalyst plans
      TakeOrderedAndProject (per-partition heaps + driver merge of k·p
      rows), never a full sort shuffle.

    Ties: scores are rounded to milli then ordered with a full key
    tiebreak, so the cut is engine-deterministic. The per-sequence sum
    over ≤|q| doubles is the only order-sensitive float reduction (same
    accepted tolerance as ``doc_idf_score``).
    """
    from binlog_processer_spark.operators._cache import pin

    qs = sorted({int(t) for t in query_tokens})
    if not qs:
        raise ValueError("query_tokens must be non-empty")
    qlit = F.array(*[F.lit(t) for t in qs])
    # n_tok == size(tokens) by the input contract; preferring the int
    # column keeps the stats pass off the array bytes (see _total_tokens)
    dl_col = F.col("n_tok") if "n_tok" in kept.columns else F.size("tokens")
    stats = kept.agg(
        F.count("*").cast("bigint").alias("n_seq"),
        F.sum(dl_col).cast("bigint").alias("total_tok"),
    )
    cand = kept.filter(F.arrays_overlap(F.col("tokens"), qlit))
    # pin: tf feeds both the df derivation and the score join; uncached,
    # each branch would re-scan + re-explode the corpus (unpin_all releases)
    tf = pin(
        cand.select(
            "source",
            "doc_id",
            "event_seq",
            dl_col.alias("dl"),
            F.explode(
                F.filter("tokens", lambda t: F.array_contains(qlit, t))
            ).alias("token"),
        )
        .groupBy("source", "doc_id", "event_seq", "dl", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    dfs = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df_cnt"))
    # fixed-shape double expression over exact bigint inputs: identical
    # operation order in the DuckDB oracle (__spark_entry__) — keep in sync
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_seq") - F.col("df_cnt") + F.lit(0.5))
        / (F.col("df_cnt") + F.lit(0.5))
    )
    norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b)
            * (F.col("dl") * F.col("n_seq"))
            / F.col("total_tok")
        )
    )
    return (
        tf.join(F.broadcast(dfs), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("source", "doc_id", "event_seq")
        .agg(
            F.round(F.sum(idf * norm) * 1000)
            .cast("bigint")
            .alias("score_m")
        )
        .orderBy(
            F.col("score_m").desc(),
            F.col("source"),
            F.col("doc_id"),
            F.col("event_seq"),
        )
        .limit(int(k))
    )


def doc_bigram_logprob(kept: DataFrame) -> DataFrame:
    """Per-document mean bigram surprisal: mean over bigram OCCURRENCES
    of −ln p(w2 | w1), the conditional estimated from the corpus itself
    as c(w1,w2) / c_prefix(w1), published in milli-nats (bigint). The
    context-aware rung above ``doc_unigram_logprob`` on the CCNet-style
    quality ladder: token-salad noise that fools unigram frequencies
    (plausible tokens, impossible transitions) scores high here.

    The conditional normalizes EXACTLY because the prefix count is
    derived from the bigram table itself (c_prefix(w1) = Σ_w2 c(w1,w2),
    i.e. w1 occurrences in non-final position) — no separate unigram
    pass, no off-by-one against final tokens. Documents shorter than 2
    tokens contribute no bigram and drop out of the output.

    Scale plan: the exploded bigram stream is pinned (it feeds the count
    table and the scoring join; unpin_all releases). The count table is
    bigram-vocabulary-bounded after map-side combine; the prefix rollup
    is unigram-vocabulary-bounded and broadcast back onto it. The final
    scoring join is left UNHINTED — a natural-text bigram vocabulary
    usually still broadcasts, but an unbounded id space must fall back
    to a shuffled hash join, and AQE makes that call from measured
    sizes instead of a wrong hint.
    """
    from binlog_processer_spark.operators._cache import pin

    occ = pin(
        kept.select(
            "source",
            "doc_id",
            "event_seq",
            F.explode(_gram_strings(2)).alias("gram"),
        )
    )
    b = occ.groupBy("gram").agg(F.count("*").cast("bigint").alias("cnt2"))
    pre = (
        b.groupBy(F.substring_index("gram", "-", 1).alias("__w1"))
        .agg(F.sum("cnt2").cast("bigint").alias("cnt1"))
    )
    f = (
        b.join(
            F.broadcast(pre),
            F.substring_index(F.col("gram"), "-", 1) == F.col("__w1"),
        )
        .select("gram", "cnt2", "cnt1")
    )
    return (
        occ.join(f, "gram")
        .groupBy("source", "doc_id", "event_seq")
        .agg(
            F.round(
                F.avg(-F.log(F.col("cnt2") / F.col("cnt1"))) * 1000
            )
            .cast("bigint")
            .alias("surprisal2_mn")
        )
    )


def merge_pair_counts(kept: DataFrame, top_k: int = 100) -> DataFrame:
    """Adjacent-token-pair counts — the BPE trainer's inner step (the
    argmax pair is the next merge rule; Sennrich et al. 2016, public
    subword-nmt/HF-tokenizers algorithm). Useful standalone as a corpus
    bigram-at-token-level report.

    Shape: the pair stream is zip_with over two slices of the SAME array
    (no self-join, no second scan), exploded into Spark's hash aggregate —
    map-side partial combine shrinks each task's output to its DISTINCT
    pairs before the wire, so the shuffle carries at most
    tasks x pair-vocabulary rows, not one row per token position. The
    top-k cut is TakeOrderedAndProject (per-partition heads, never a full
    sort) on the total order (cnt desc, p1, p2) so the cut is
    deterministic under ties.
    """
    pair = F.expr(
        "zip_with(slice(tokens, 1, greatest(size(tokens) - 1, 0)),"
        "         slice(tokens, 2, greatest(size(tokens) - 1, 0)),"
        "         (a, b) -> struct(a AS p1, b AS p2))"
    )
    return (
        kept.select(F.explode(pair).alias("pr"))
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "p1", "p2")
        .limit(top_k)
    )


def ngram_diversity(
    kept: DataFrame, ns: tuple[int, ...] = (1, 2, 3), approx: bool = False
) -> DataFrame:
    """Per-source n-gram diversity: distinct-n / total-n in ppm — the
    corpus-level distinct-1/distinct-2/distinct-3 report (Li et al. 2016's
    generation-diversity metric applied as a data-quality lens: a source
    whose bigram diversity collapses is boilerplate- or template-heavy
    even when every individual document passes the within-document
    repetition gate, because the duplication lives ACROSS documents).
    Complements ``repetition_stats`` (within-doc) and ``vocab_stats``
    (unigrams only).

    Output: one row per (source, n) with total gram occurrences, distinct
    grams, and ``diversity_ppm = floor(distinct * 1e6 / total)`` (bigint,
    hash-stable across engines).

    Scale posture: one explode + ONE hash aggregate per n — total and
    distinct come out of the same scan. Exact ``count_distinct`` shuffles
    source × gram-vocabulary after partial aggregation: fine for unigrams
    (bounded vocab) and acceptable for small-n grams; for large n or
    10^12-row corpora pass ``approx=True`` to swap in HyperLogLog++
    (rsd 1%) — the shuffle then carries one fixed-size sketch per
    (task, source, n) regardless of gram-space size. Sketches are
    engine-specific, so the approx path is gated by a pytest tolerance
    test against the exact path, not by the cross-engine oracle. Grams
    are '-'-joined decimal strings (``_gram_strings``) so Spark and the
    DuckDB oracle agree bit-for-bit.
    """
    if not ns:
        raise ValueError("ns must name at least one gram order")
    parts = []
    for n in ns:
        if n < 1:
            raise ValueError(f"gram order {n} must be >= 1")
        distinct_agg = (
            F.approx_count_distinct("gram", rsd=0.01)
            if approx
            else F.count_distinct("gram")
        )
        parts.append(
            kept.select(
                "source", F.explode(_gram_strings(int(n))).alias("gram")
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("total_grams"),
                distinct_agg.cast("bigint").alias("distinct_grams"),
            )
            .select(
                "source",
                F.lit(int(n)).cast("int").alias("n"),
                "total_grams",
                "distinct_grams",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "source",
        "n",
        "total_grams",
        "distinct_grams",
        F.when(F.col("total_grams") == 0, F.lit(0))
        .otherwise(
            F.floor(
                F.col("distinct_grams") * 1_000_000 / F.col("total_grams")
            )
        )
        .cast("bigint")
        .alias("diversity_ppm"),
    )


def pmi_topk(
    kept: DataFrame, k: int = 50, min_count: int = 10
) -> DataFrame:
    """Top-k token bigrams by pointwise mutual information — the
    classical collocation miner (Church & Hanks 1990), here over token
    ids: which adjacent pairs co-occur far above chance. High-PMI pairs
    are multi-token units (named entities, code idioms, boilerplate
    templates) — input to tokenizer-vocabulary audits and to span-level
    dedup thresholds.

    PMI = ln( p(x,y) / (p(x) p(y)) ) with p(x,y) from the bigram stream
    (total T2) and p(x) from the token stream (total T1), published in
    milli-nats. The ranking key is the ROUNDED integer (ties broken on
    (x, y)), so the cross-engine order is integer-deterministic — the
    float ln only has to agree on the value (identical operand shapes
    both sides), never on an ordering epsilon.

    Scale plan: both count tables are vocabulary-bounded after map-side
    combine; the unigram table broadcasts onto the bigram table twice
    (x and y sides); ``min_count`` prunes the long tail before the
    joins; the final top-k is one TakeOrderedAndProject over the
    bigram vocabulary.
    """
    if k < 1 or min_count < 1:
        raise ValueError("pmi_topk: k and min_count must be >= 1")
    b = (
        kept.select(F.explode(_gram_strings(2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("bigint").alias("pair_cnt"))
    )
    t2 = b.agg(F.sum("pair_cnt").cast("bigint").alias("total_pairs"))
    uni = (
        kept.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    t1 = _total_tokens(kept)
    pairs = (
        b.filter(F.col("pair_cnt") >= min_count)
        .select(
            F.substring_index("gram", "-", 1).cast("int").alias("x"),
            F.substring_index("gram", "-", -1).cast("int").alias("y"),
            "pair_cnt",
        )
        .join(
            F.broadcast(
                uni.select(
                    F.col("token").alias("x"), F.col("cnt").alias("x_cnt")
                )
            ),
            "x",
        )
        .join(
            F.broadcast(
                uni.select(
                    F.col("token").alias("y"), F.col("cnt").alias("y_cnt")
                )
            ),
            "y",
        )
        .crossJoin(F.broadcast(t2))
        .crossJoin(F.broadcast(t1))
    )
    pmi = F.round(
        F.log(
            (F.col("pair_cnt") / F.col("total_pairs"))
            * F.col("total_tok")
            / F.col("x_cnt")
            * F.col("total_tok")
            / F.col("y_cnt")
        )
        * 1000
    ).cast("bigint")
    scored = pairs.select(
        "x", "y", "pair_cnt", "x_cnt", "y_cnt", pmi.alias("pmi_mn")
    )
    # distributed top-k (TakeOrderedAndProject — per-partition heads,
    # driver merge), NOT a global row_number window: the bigram table
    # can be ~10^8 rows at corpus scale and must never single-partition.
    # The rank column is then assigned on the k-row result only.
    topk = scored.orderBy(F.desc("pmi_mn"), "x", "y").limit(k)
    w = Window.orderBy(F.desc("pmi_mn"), "x", "y")
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))
