"""Deduplication operators for large-scale training corpora.

Beyond the reference's scope (it has only `stream().distinct()` on rowkey
lists, HiveCheckBySchduler.java:55) — these are the training-data-pipeline
dedup family the engine adds as first-class operators:

- exact dedup: hash-groupBy on normalized text
- MinHash + LSH: shingle → k min-hashes → banded buckets → candidate pairs
  (the classic Broder scheme; banding makes the pair join linear, never the
  O(n²) cross join)
- SimHash: per-bit majority vote over word hashes → 32-bit signature
- n-gram Jaccard: relational shingle-join jaccard on LSH-restricted candidates

Determinism & oracle parity: every hash is md5 (identical in Spark and
DuckDB); min-over-hash uses *lexicographic string* min so both engines agree
without hex→int conversion.

Scale posture: signatures are per-row expressions (codegen, shuffle-free);
the only shuffles are the band groupBy / shingle join, both on
high-cardinality uniform keys (md5 output ⇒ no skew). At 10^12 rows, band
width r and #bands b tune recall vs join fan-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORDS = "split(trim(coalesce(text, '')), '\\\\s+')"
NORM_TEXT = "array_join(split(trim(coalesce(text, '')), '\\\\s+'), ' ')"


def words_col() -> Column:
    """Whitespace tokenization, empty text → empty array."""
    return F.expr(
        f"CASE WHEN length(trim(coalesce(text, ''))) = 0 "
        f"THEN cast(array() as array<string>) ELSE {WORDS} END"
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups on whitespace-normalized text.

    Returns (text_hash, rep_doc_id, dup_cnt) for groups with >1 member.
    """
    return (
        docs.select("doc_id", F.expr(f"md5({NORM_TEXT})").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count("*").alias("dup_cnt"),
        )
        .filter(F.col("dup_cnt") > 1)
    )


SHINGLES = (
    "transform(sequence(1, greatest(size({w}) - {nm1}, 0)),"
    " i -> array_join(slice({w}, i, {n}), ' '))"
)


def _shingle_expr(n: int = 3) -> str:
    return SHINGLES.format(w=WORDS, n=n, nm1=n - 1)


def minhash_signatures(docs: DataFrame, k: int = 8, n: int = 3) -> DataFrame:
    """k MinHash values per doc: min over md5(shingle + '#' + i) of word
    n-gram shingles (shingling, not bare words — a small vocabulary would
    make every doc contain the globally-minimal word and collapse all
    signatures).

    Lexicographic min over md5 hex == min over a uniform 128-bit permutation,
    so this is a faithful MinHash with k independent 'permutations'.
    Docs with fewer than n words are dropped (no shingles to hash).
    """
    sh = _shingle_expr(n)
    sigs = [
        F.expr(f"array_min(transform({sh}, s -> md5(s || '#{i}')))").alias(
            f"mh{i}"
        )
        for i in range(k)
    ]
    return docs.filter(F.expr(f"size({WORDS}) >= {n}")).select("doc_id", *sigs)


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 8, bands: int = 4
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    k signatures split into `bands` bands of r = k/bands rows; docs sharing
    any full band land in a bucket; bucket join yields pairs (doc_a < doc_b).
    """
    r = k // bands
    sig = minhash_signatures(docs, k)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{i}") for i in range(b * r, (b + 1) * r)]
        band_cols.append(
            F.md5(F.concat_ws("|", *parts)).alias(f"band{b}")
        )
    banded = sig.select("doc_id", *band_cols)
    # unpivot bands → (band_id, band_hash), bucket-join on both
    stacked = banded.selectExpr(
        "doc_id",
        "stack({n}, {args}) as (band_id, band_hash)".format(
            n=bands,
            args=", ".join(f"{b}, band{b}" for b in range(bands)),
        ),
    )
    left = stacked.alias("l")
    right = stacked.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def simhash_signatures(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash: per-bit majority vote over word md5s → bit string.

    Bit j of a word's hash = parity of the (j+1)-th hex char of md5(word) —
    computable identically in Spark and DuckDB without hex→int support.
    Returns (doc_id, simhash) with simhash as a `bits`-char '0'/'1' string.
    """
    bit_exprs = []
    for j in range(bits):
        vote = (
            f"aggregate({WORDS}, 0L, (acc, w) -> acc + "
            f"CASE WHEN ascii(substr(md5(w), {j + 1}, 1)) % 2 = 1 "
            f"THEN 1 ELSE -1 END)"
        )
        bit_exprs.append(f"CASE WHEN ({vote}) > 0 THEN '1' ELSE '0' END")
    return docs.filter(F.expr("length(trim(coalesce(text, ''))) > 0")).select(
        "doc_id", F.expr("concat(" + ", ".join(bit_exprs) + ")").alias("simhash")
    )


def simhash_block_pairs(
    docs: DataFrame, bits: int = 32, blocks: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: block-LSH (pigeonhole — any pair within
    hamming ≤ blocks-1 shares ≥1 exact block) then exact hamming filter.
    """
    w = bits // blocks
    sig = simhash_signatures(docs, bits)
    block_cols = [
        F.substring("simhash", b * w + 1, w).alias(f"blk{b}") for b in range(blocks)
    ]
    blocked = sig.select("doc_id", "simhash", *block_cols)
    stacked = blocked.selectExpr(
        "doc_id",
        "simhash",
        "stack({n}, {args}) as (blk_id, blk)".format(
            n=blocks, args=", ".join(f"{b}, blk{b}" for b in range(blocks))
        ),
    )
    l, r = stacked.alias("l"), stacked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.blk_id") == F.col("r.blk_id"))
            & (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.expr(
        "size(filter(zip_with(split(sh_a, ''), split(sh_b, ''),"
        " (x, y) -> x <> y), d -> d))"
    )
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    expr = (
        f"transform(sequence(1, greatest(size({WORDS}) - {n - 1}, 0)),"
        f" i -> array_join(slice({WORDS}, i, {n}), ' '))"
    )
    return (
        docs.filter(F.expr(f"size({WORDS}) >= {n}"))
        .select("doc_id", F.explode(F.array_distinct(F.expr(expr))).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, min_jaccard_bp: int = 5000,
    max_df: int = 128,
) -> DataFrame:
    """Jaccard over word n-grams, relationally:

    explode distinct shingles → self-join on shingle → common counts →
    jaccard = common / (|A| + |B| - common). Output in basis points (int)
    for exact cross-engine comparison.

    ``max_df`` caps shingle document frequency BEFORE the self-join: one
    stop-shingle shared by k docs contributes k² join rows, so an uncapped
    join is quadratic in the hottest shingle — the 100 TB scale-killer. A
    shingle above the cap is dropped from candidate generation only; the
    jaccard DENOMINATOR still uses full per-doc shingle counts, so surviving
    pairs' scores shift at most by the dropped commons (a standard
    stop-shingle recall trade, like DF-capped stop-words in IR). Pass
    ``max_df=None`` to disable.
    """
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    joinable = sh
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        # hot set is tiny by construction (few shingles exceed the cap) —
        # broadcast anti-join, no extra fact shuffle
        joinable = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = joinable.alias("a"), joinable.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard_bp",
            F.floor(
                F.col("common") * 10000
                / (F.col("na") + F.col("nb") - F.col("common"))
            ).cast("bigint"),
        )
        .filter(F.col("jaccard_bp") >= min_jaccard_bp)
        .select("doc_a", "doc_b", "common", "jaccard_bp")
    )
