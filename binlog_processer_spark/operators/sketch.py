"""Mergeable distinct-count sketches: KMV (k-minimum values) and
HyperLogLog, built from deterministic md5-prefix hashing so the DuckDB
oracle reproduces every register bit-for-bit.

Why these exist. `vocab_stats` counts distinct tokens EXACTLY — the
right call when the id space is vocabulary-bounded. But a training
pipeline also needs cardinalities over UNBOUNDED keys (doc ids,
n-gram ids, url hosts), where exact distinct means shuffling the whole
key set. The classical answer is a constant-size mergeable sketch:

- **KMV** (Bar-Yossef et al. 2002, "Counting distinct elements in a
  data stream"): keep the k smallest hash values; with h uniform on
  [0, 2^32), the k-th smallest order statistic estimates the distinct
  count as ``(k-1) * 2^32 / h_k``. Mergeable by union+re-truncate.
- **HyperLogLog** (Flajolet et al. 2007): m = 2^b registers, each the
  max leading-zero rank of the hashes routed to it; harmonic-mean
  estimate with the standard small-range (linear counting) correction.
  Mergeable by per-register max — exactly a ``groupBy(bucket).max``.

Scale posture. Both sketches are aggregates with tiny, bounded state:

- The KMV candidate pass runs per-partition inside ``mapInArrow``
  (bottom-k per source per partition — an EXACT superset of the global
  bottom-k, since the global k smallest are each in some partition's k
  smallest), so only numPartitions x k candidate rows reach the single
  final-ranking shuffle. Nothing is proportional to the stream.
- HLL is two hash aggregates: distinct (source,bucket,rho-max) with
  map-side combine bounded by m per source per task, then an m-row
  per-source fold. At 10^12 rows the wire carries registers, not keys.

Determinism / oracle parity. The hash is the repo-wide canon (first 8
hex chars of md5 of the decimal string → uint32; see operators/mix.py),
so Spark and DuckDB agree on every hash, every register, and — because
the estimate arithmetic is integer until one final multiply/divide —
on every published estimate. The HLL rank uses an integer bit-length
(``conv(x, 10, 2)`` string length in Spark, ``to_base(x, 2)`` length in
DuckDB; both render 0 as "0") instead of float log2, so there is no
boundary ambiguity.

Reference parity: the reference has no sketches (its counters are exact
AtomicIntegers, WriteResultValue.java:7-36); this module is part of the
training-pipeline surface the build brief mandates beyond SURVEY §2.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

HASH_BITS = 32
HASH_SPACE = 1 << HASH_BITS  # md5-prefix hashes are uniform on [0, 2^32)


def hash32(col: Column) -> Column:
    """Repo-canon uint32 hash: first 8 md5 hex chars of the decimal
    string form, as bigint. DuckDB twin:
    ``cast(('0x' || substr(md5(cast(x AS varchar)), 1, 8)) AS ubigint)``.
    """
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def _bottom_k_candidates(k: int):
    """mapInArrow partition function: per-(source) bottom-k distinct
    hash values within one partition — an exact superset of the global
    per-source bottom-k (every one of the k globally smallest hashes
    lives in some partition, where at most k-1 smaller ones can hide
    it). Only numPartitions x sources x k rows cross the wire."""
    import numpy as np

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        best: dict[str, np.ndarray] = {}
        for batch in batches:
            src = batch.column(0).to_numpy(zero_copy_only=False)
            h = batch.column(1).to_numpy(zero_copy_only=False)
            for s in np.unique(src):
                hs = h[src == s]
                prev = best.get(s)
                if prev is not None:
                    hs = np.concatenate([prev, hs])
                hs = np.unique(hs)  # sorts ascending + dedupes
                best[s] = hs[:k]
        sources, hashes = [], []
        for s, hs in best.items():
            sources.extend([s] * len(hs))
            hashes.extend(hs.tolist())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(sources, type=pa.string()),
                pa.array(hashes, type=pa.int64()),
            ],
            ["source", "h"],
        )

    return fn


def kmv_distinct(
    kept: DataFrame,
    k: int = 256,
    with_exact: bool = True,
) -> DataFrame:
    """Per-source KMV distinct-token estimate, next to the exact count.

    Plan: distinct (source, token) → hash → zero-shuffle per-partition
    bottom-k (`mapInArrow`) → one tiny global ranking over the candidate
    rows. ``with_exact=True`` adds the exact distinct count and an
    ``err_ppm`` column — the self-auditing report form every sketch in
    this repo ships with (recall gates for ANN, agreement columns for
    the classifier). At 10^12 scale run ``with_exact=False``: the whole
    job is then one candidate pass + a k-row-per-source fold.

    Estimator: ``(k-1) * 2^32 / h_k`` with ``h_k`` the k-th smallest
    DISTINCT hash (hash collisions collapse; at 2^32 space and corpus
    vocabularies the bias is < 1e-5). If a source has fewer than k
    distinct hashes the sketch is exhaustive and the estimate is the
    candidate count itself.
    """
    if k < 2:
        raise ValueError(f"kmv_distinct: k must be >= 2, got {k}")
    # NO pre-distinct: duplicates collapse inside the per-partition
    # bottom-k (np.unique), so the plan stays map-only until the
    # numPartitions x k candidate rows — a pre-distinct would pay the
    # full (source, token) shuffle this sketch exists to avoid.
    toks = kept.select(
        "source", F.explode("tokens").alias("token")
    ).select("source", hash32(F.col("token")).alias("h"))
    cand = toks.mapInArrow(
        _bottom_k_candidates(k), schema="source string, h bigint"
    )
    w = Window.partitionBy("source").orderBy("h")
    ranked = (
        cand.distinct()  # candidates from different partitions can repeat
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
    sk = ranked.groupBy("source").agg(
        F.max("rk").cast("int").alias("k_used"),
        F.max("h").cast("bigint").alias("h_k"),
    )
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("bigint")
    ).otherwise(
        F.floor(
            F.lit(k - 1) * F.lit(HASH_SPACE) / F.col("h_k")
        ).cast("bigint")
    )
    sk = sk.select(
        "source", "k_used", "h_k", est.alias("est_distinct")
    )
    if not with_exact:
        return sk.orderBy("source")
    exact = (
        kept.select("source", F.explode("tokens").alias("token"))
        .groupBy("source")
        .agg(F.countDistinct("token").cast("bigint").alias("exact_distinct"))
    )
    return (
        sk.join(exact, "source")
        .select(
            "source",
            "k_used",
            "h_k",
            "est_distinct",
            "exact_distinct",
            F.floor(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                * 1_000_000
                / F.col("exact_distinct")
            )
            .cast("bigint")
            .alias("err_ppm"),
        )
        .orderBy("source")
    )


def _bit_length(col: Column) -> Column:
    """Integer bit length via base-2 string render (conv renders 0 as
    "0", length 1 — callers guard the 0 case explicitly)."""
    return F.length(F.conv(col.cast("string"), 10, 2))


def hll_registers(kept: DataFrame, b: int = 10) -> DataFrame:
    """Materialized HLL registers: one row per (source, bucket) with the
    max rank. This IS the mergeable sketch state — union two corpora by
    ``groupBy(source, bucket).max(rho)`` — and the unit the oracle
    checks register-by-register."""
    if not 4 <= b <= 16:
        raise ValueError(f"hll_registers: b must be in [4, 16], got {b}")
    w = HASH_BITS - b  # bits left after the bucket index
    # no pre-distinct: per-register max is idempotent under duplicate
    # hashes, and the map-side partial max bounds each task's shuffle
    # output at m rows per source — the register fold IS the dedupe
    toks = kept.select(
        "source", F.explode("tokens").alias("token")
    ).select("source", hash32(F.col("token")).alias("h"))
    bucket = F.floor(F.col("h") / F.lit(1 << w)).cast("int")
    rest = (F.col("h") % F.lit(1 << w)).cast("bigint")
    # rank = leading zeros in the w-bit remainder + 1
    #      = w - bit_length(rest) + 1, and w + 1 when rest == 0
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - _bit_length(rest)
    )
    return (
        toks.select("source", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("source", "bucket")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_distinct(
    kept: DataFrame, b: int = 10, with_exact: bool = True
) -> DataFrame:
    """Per-source HyperLogLog distinct-token estimate from
    ``hll_registers``, with the standard small-range correction.

    The harmonic-mean denominator ``sum(2^-rho)`` is kept as the EXACT
    integer ``sum(2^(33-rho))`` (rho <= 33, so every term is a
    non-negative power of two; the sum fits comfortably in int64) —
    published as ``sum_scaled`` so the oracle matches it exactly, with
    the float division deferred to one final expression both engines
    evaluate on identical operands.
    """
    regs = hll_registers(kept, b)
    sk = hll_estimate(regs, b)
    if not with_exact:
        return sk.orderBy("source")
    exact = (
        kept.select("source", F.explode("tokens").alias("token"))
        .groupBy("source")
        .agg(F.countDistinct("token").cast("bigint").alias("exact_distinct"))
    )
    return (
        sk.join(exact, "source")
        .select(
            "source",
            "zero_registers",
            "sum_scaled",
            "est_distinct",
            "exact_distinct",
            F.floor(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                * 1_000_000
                / F.col("exact_distinct")
            )
            .cast("bigint")
            .alias("err_ppm"),
        )
        .orderBy("source")
    )


def hll_estimate(
    regs: DataFrame, b: int, key_cols: tuple = ("source",)
) -> DataFrame:
    """Estimate report from a (*key_cols, bucket, rho) register relation
    — shared verbatim by the batch sketch and the streaming register
    accumulator, so a stream that merged its registers per micro-batch
    publishes the EXACT rows the one-shot batch sketch publishes.
    ``key_cols`` generalizes the grouping (hll_rollup groups by
    (level, key) — keeping them as real columns rather than a delimited
    concat means a key containing the delimiter can never collapse two
    rollup rows)."""
    key_cols = list(key_cols)
    m = 1 << b
    # Flajolet's bias constant for m >= 128 (b=10 -> 0.72125...)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # ONE precomputed double constant (alpha * m^2 * 2^33): both engines
    # then evaluate a single division on identical operands — no
    # multiply-order or decimal-literal ambiguity can creep in
    numer = ((alpha * m) * m) * float(1 << 33)
    agg = regs.groupBy(*key_cols).agg(
        F.count("*").cast("bigint").alias("nonzero"),
        F.sum(
            F.pow(F.lit(2.0), (F.lit(33) - F.col("rho")))
            .cast("bigint")
        )
        .cast("bigint")
        .alias("present_scaled"),
    )
    zero = (F.lit(m) - F.col("nonzero")).cast("bigint")
    # absent registers hold rho=0 -> 2^-0 = 1 -> 2^33 each, still exact
    sum_scaled = (
        F.col("present_scaled") + zero * F.lit(1 << 33)
    ).cast("bigint")
    agg = agg.select(
        *key_cols,
        zero.alias("zero_registers"),
        sum_scaled.alias("sum_scaled"),
    )
    raw = F.lit(numer) / F.col("sum_scaled")
    # linear-counting correction for the small range (raw <= 2.5m and
    # empty registers remain)
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zero_registers") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_registers")),
    ).otherwise(raw)
    return agg.select(
        *key_cols,
        "zero_registers",
        "sum_scaled",
        F.floor(corrected).cast("bigint").alias("est_distinct"),
    )


def cms_counters(
    kept: DataFrame, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch counters (Cormode & Muthukrishnan 2005) over the
    token stream: ``depth`` independent hash rows x ``width`` buckets,
    each counter the exact sum of occurrences hashing there. This is the
    mergeable state — union two corpora by ``groupBy(row, bucket).sum``.

    Row hashes derive from the same md5 canon, salted by the row index
    (``md5("<row>:<token>")``), so the DuckDB oracle rebuilds every
    counter exactly. Map-side combine bounds each task's shuffle output
    at depth x width rows — nothing scales with the stream.
    """
    if depth < 1 or width < 2:
        raise ValueError("cms_counters: depth >= 1 and width >= 2")
    occ = kept.select(F.explode("tokens").alias("token"))
    rows = occ.select(
        "token",
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("row"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("row"), F.col("token").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    ).cast("int")
    return (
        rows.select("row", bucket.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_estimate_report(
    kept: DataFrame,
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
) -> DataFrame:
    """Self-auditing CMS report: for the exact top-k tokens, the sketch
    estimate (min over rows of the hashed counter) next to the exact
    count. CMS never underestimates, so ``err_ppm`` = (est - exact)/
    exact is >= 0 — the oracle checks that inequality for free by
    matching values. Probe cost: top_k x depth rows against a
    depth x width counter table — both tiny, broadcast."""
    counters = cms_counters(kept, depth, width)
    exact = (
        kept.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("exact_cnt"))
    )
    probes = (
        exact.orderBy(F.desc("exact_cnt"), "token")
        .limit(top_k)
        .select(
            "token",
            "exact_cnt",
            F.explode(
                F.array(*[F.lit(i) for i in range(depth)])
            ).alias("row"),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("row"), F.col("token").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    ).cast("int")
    return (
        probes.withColumn("bucket", bucket)
        .join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
        .select(
            "token",
            "exact_cnt",
            "est_cnt",
            F.floor(
                (F.col("est_cnt") - F.col("exact_cnt"))
                * 1_000_000
                / F.col("exact_cnt")
            )
            .cast("bigint")
            .alias("overcount_ppm"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
    )


def kmv_source_overlap(
    kept: DataFrame, k: int = 256, with_exact: bool = True
) -> DataFrame:
    """Pairwise cross-source token-set overlap (Jaccard) estimated from
    the per-source KMV sketches alone — the sketch-world counterpart of
    ``dedup_source_matrix``'s exact overlap join, usable when the
    per-source key sets are far too large to intersect exactly.

    Classic bottom-k set resemblance (Broder 1997 / Beyer et al. 2007):
    for sources a, b let U = the k smallest distinct hashes of
    ``sketch(a) ∪ sketch(b)`` (which equals the k smallest of the UNION
    SET — the merge property); then ``|{h ∈ U : h ∈ a ∧ h ∈ b}| / |U|``
    is an unbiased Jaccard estimate. Everything derives from the two
    k-row sketches — the corpus is touched once to build them.

    Plan: the ranked per-source sketch (zero-shuffle candidate pass, as
    ``kmv_distinct``) self-joins on hash only within source pairs —
    sources² x k rows, driver-scale. ``with_exact`` adds the exact
    pairwise Jaccard (a distinct-token self-join — the expensive thing
    the sketch replaces; keep it for the audit, drop it at scale).
    """
    if k < 2:
        raise ValueError(f"kmv_source_overlap: k must be >= 2, got {k}")
    toks = kept.select(
        "source", F.explode("tokens").alias("token")
    ).select("source", hash32(F.col("token")).alias("h"))
    cand = toks.mapInArrow(
        _bottom_k_candidates(k), schema="source string, h bigint"
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        cand.distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("source", "h")
    )
    # (pair, h, in_a, in_b): a row per (ordered source pair, hash) with
    # flags for which side's sketch holds the hash
    au = sk.select(
        F.col("source").alias("source_a"),
        "h",
        F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"),
    )
    bu = sk.select(
        F.col("source").alias("source_b"),
        "h",
        F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"),
    )
    srcs = sk.select("source").distinct()
    grid = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    tagged = grid.join(au, "source_a").unionByName(
        grid.join(bu, "source_b").select(
            "source_a", "source_b", "h", "in_a", "in_b"
        )
    )
    per_h = tagged.groupBy("source_a", "source_b", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    wu = Window.partitionBy("source_a", "source_b").orderBy("h")
    union_k = per_h.withColumn("rk", F.row_number().over(wu)).filter(
        F.col("rk") <= k
    )
    est = union_k.groupBy("source_a", "source_b").agg(
        F.max("rk").cast("int").alias("k_used"),
        F.sum(
            (F.col("in_a") * F.col("in_b")).cast("bigint")
        ).alias("both"),
    )
    est = est.select(
        "source_a",
        "source_b",
        "k_used",
        F.floor(F.col("both") * 1_000_000 / F.col("k_used"))
        .cast("bigint")
        .alias("est_jaccard_ppm"),
    )
    if not with_exact:
        return est.orderBy("source_a", "source_b")
    d = kept.select(
        "source", F.explode("tokens").alias("token")
    ).distinct()
    sizes = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n")
    )
    inter = (
        d.select(F.col("source").alias("source_a"), "token")
        .join(
            d.select(F.col("source").alias("source_b"), "token"), "token"
        )
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    # disjoint pairs produce no intersection row — rebuild them from the
    # grid so a zero-overlap pair reports exact 0 instead of vanishing
    inter = grid.join(inter, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce(F.col("inter"), F.lit(0)).cast("bigint").alias("inter"),
    )
    exact = (
        inter.join(
            sizes.select(
                F.col("source").alias("source_a"), F.col("n").alias("na")
            ),
            "source_a",
        )
        .join(
            sizes.select(
                F.col("source").alias("source_b"), F.col("n").alias("nb")
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.floor(
                F.col("inter")
                * 1_000_000
                / (F.col("na") + F.col("nb") - F.col("inter"))
            )
            .cast("bigint")
            .alias("exact_jaccard_ppm"),
        )
    )
    return (
        est.join(exact, ["source_a", "source_b"])
        .select(
            "source_a",
            "source_b",
            "k_used",
            "est_jaccard_ppm",
            "exact_jaccard_ppm",
            F.abs(F.col("est_jaccard_ppm") - F.col("exact_jaccard_ppm"))
            .cast("bigint")
            .alias("abs_err_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


def _bottom_k_rows(k: int):
    """mapInArrow partition function: per-source bottom-k ROWS by the
    (h, seq) total order, carrying an int payload column. The uniform
    row-hash order makes the surviving rows a uniform random sample of
    the source's rows, and bottom-k-by-hash merges exactly like KMV:
    union two samples, re-truncate to k. Input batch columns:
    (source, h, seq, val); only numPartitions x sources x k rows reach
    the single final-ranking shuffle."""
    import numpy as np

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        best: dict[str, tuple] = {}
        for batch in batches:
            src = batch.column(0).to_numpy(zero_copy_only=False)
            h = batch.column(1).to_numpy(zero_copy_only=False)
            seq = batch.column(2).to_numpy(zero_copy_only=False)
            val = batch.column(3).to_numpy(zero_copy_only=False)
            for s in np.unique(src):
                m = src == s
                hs, qs, vs = h[m], seq[m], val[m]
                prev = best.get(s)
                if prev is not None:
                    hs = np.concatenate([prev[0], hs])
                    qs = np.concatenate([prev[1], qs])
                    vs = np.concatenate([prev[2], vs])
                order = np.lexsort((qs, hs))[:k]
                best[s] = (hs[order], qs[order], vs[order])
        sources, hashes, seqs, vals = [], [], [], []
        for s, (hs, qs, vs) in best.items():
            sources.extend([s] * len(hs))
            hashes.extend(hs.tolist())
            seqs.extend(qs.tolist())
            vals.extend(vs.tolist())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(sources, type=pa.string()),
                pa.array(hashes, type=pa.int64()),
                pa.array(seqs, type=pa.int64()),
                pa.array(vals, type=pa.int64()),
            ],
            ["source", "h", "seq", "val"],
        )

    return fn


def kmv_row_sample(kept: DataFrame, k: int) -> DataFrame:
    """The quantile sketch's STATE: per-source bottom-k rows by the
    uniform (row hash, event_seq) order, as (source, h, seq, val=n_tok).
    Mergeable by union + re-truncate-to-k — shared verbatim by the batch
    sketch and the streaming accumulator, so a stream that merged its
    per-batch samples publishes the EXACT rows the one-shot batch sample
    holds. Plan: zero-shuffle per-partition bottom-k (mapInArrow) → one
    tiny ranking over numPartitions x k candidates."""
    rows = kept.select(
        "source",
        hash32(F.col("event_seq")).alias("h"),
        F.col("event_seq").alias("seq"),
        F.col("n_tok").cast("bigint").alias("val"),
    )
    cand = rows.mapInArrow(
        _bottom_k_rows(k),
        schema="source string, h bigint, seq bigint, val bigint",
    )
    w = Window.partitionBy("source").orderBy("h", "seq")
    # no distinct() here: each row lives in exactly one partition and
    # event_seq is unique, so candidates cannot repeat across partitions
    # (unlike kmv_distinct, where the same HASH VALUE recurs and the
    # distinct is load-bearing) — the ranking window alone truncates the
    # numPartitions x k candidates to the bottom k
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("source", "h", "seq", "val")
    )


def sample_quantile_report(
    sample: DataFrame, qs: tuple[int, ...] = (50, 95)
) -> DataFrame:
    """Estimate report from a (source, h, seq, val) sample relation:
    lower-nearest-rank order statistic at each q over the k_used sample
    rows. Shared by the batch sketch and the streaming accumulator."""
    wv = Window.partitionBy("source").orderBy("val", "seq")
    ranked = sample.select(
        "source", "val", F.row_number().over(wv).alias("vrk")
    )
    sized = ranked.groupBy("source").agg(
        F.max("vrk").cast("int").alias("k_used")
    )
    est = ranked.join(sized, "source")
    picks = [
        F.max(
            F.when(
                F.col("vrk")
                == F.floor((F.col("k_used") - 1) * q / 100) + 1,
                F.col("val"),
            )
        )
        .cast("bigint")
        .alias(f"q{q}_est")
        for q in qs
    ]
    return est.groupBy("source").agg(
        F.max("k_used").cast("int").alias("k_used"), *picks
    )


def kmv_sample_quantiles(
    kept: DataFrame,
    k: int = 256,
    qs: tuple[int, ...] = (50, 95),
    with_exact: bool = True,
) -> DataFrame:
    """Mergeable quantile sketch: per-source sequence-length (``n_tok``)
    quantiles estimated from a bottom-k-by-row-hash uniform sample, next
    to the exact quantiles and absolute errors.

    Why this shape. ``sink_token_percentiles`` computes EXACT continuous
    percentiles — affordable because ``percentile()`` is a single sort
    per sink. At 10^12 rows the exact sort is the bottleneck, and the
    classical answer is a bounded-state mergeable sample: keep the k
    rows whose uniform row hash is smallest (a KMV over ROW IDENTITY
    rather than values — Bar-Yossef et al. 2002's bottom-k as a uniform
    sampler). Union two corpora's samples and re-truncate to k and you
    have exactly the sample of the union — the same merge law the
    distinct sketches obey, so daily sketches roll up into monthly ones
    without rescanning the corpus.

    Estimator: the sample's order statistic at position
    ``floor((k_used-1) * q / 100) + 1`` in ``n_tok`` order — the same
    lower-nearest-rank rule applied to the full data for the exact
    column, so with k >= n the estimate IS the exact quantile. All
    arithmetic is integer; the DuckDB oracle reproduces every row
    bit-for-bit (hash = repo-canon md5 prefix; total order = (h,
    event_seq), collision-proof because event_seq is unique).

    Plan: zero-shuffle per-partition bottom-k (``mapInArrow``) → one
    tiny ranking over numPartitions x k candidates → per-source sample
    sort (k rows — driver-scale). ``with_exact`` adds the full-data
    order statistic (ONE window sort per source — the thing the sketch
    replaces; keep it for the audit, drop it at 10^12).
    """
    if k < 2:
        raise ValueError(f"kmv_sample_quantiles: k must be >= 2, got {k}")
    if not qs or any(not 0 < q <= 100 for q in qs):
        raise ValueError(f"kmv_sample_quantiles: qs must be in (0, 100], got {qs}")
    sample = kmv_row_sample(kept, k)
    sk = sample_quantile_report(sample, qs)
    if not with_exact:
        return sk.orderBy("source")
    wf = Window.partitionBy("source").orderBy("n_tok", "event_seq")
    full = kept.select(
        "source",
        F.col("n_tok").cast("bigint").alias("val"),
        F.row_number().over(wf).alias("vrk"),
    )
    nrows = full.groupBy("source").agg(
        F.max("vrk").cast("bigint").alias("n_rows")
    )
    fx = full.join(nrows, "source")
    exact_picks = [
        F.max(
            F.when(
                F.col("vrk")
                == F.floor((F.col("n_rows") - 1) * q / 100) + 1,
                F.col("val"),
            )
        )
        .cast("bigint")
        .alias(f"q{q}_exact")
        for q in qs
    ]
    exact = fx.groupBy("source").agg(
        F.max("n_rows").cast("bigint").alias("n_rows"), *exact_picks
    )
    out = sk.join(exact, "source")
    err_cols = [
        F.abs(F.col(f"q{q}_est") - F.col(f"q{q}_exact"))
        .cast("bigint")
        .alias(f"q{q}_abs_err")
        for q in qs
    ]
    return out.select(
        "source",
        "n_rows",
        "k_used",
        *[c for q in qs for c in (F.col(f"q{q}_est"), F.col(f"q{q}_exact"))],
        *err_cols,
    ).orderBy("source")


def hll_rollup(kept: DataFrame, b: int = 10) -> DataFrame:
    """OLAP rollup of distinct-token counts computed ONCE at the finest
    grain and merged upward from the registers alone — the payoff of a
    mergeable sketch: per-table registers fold into per-database and
    global estimates with a register ``max``, never rescanning the
    corpus (contrast exact COUNT(DISTINCT) with ROLLUP, which re-scans
    or re-shuffles the full key set per grouping level).

    Levels published: ``table`` (route = db.table), ``database``
    (database_name), ``global``. Register semantics identical to
    ``hll_registers``/``hll_estimate`` (same hash canon, same
    small-range correction), so the DuckDB oracle rebuilds every level
    register-by-register. At 10^12 rows the corpus is touched once; the
    two upper levels aggregate |tables| x 2^b tiny register rows.
    """
    if not 4 <= b <= 16:
        raise ValueError(f"hll_rollup: b must be in [4, 16], got {b}")
    w = HASH_BITS - b
    toks = kept.select(
        "route", "database_name", F.explode("tokens").alias("token")
    ).select(
        "route",
        "database_name",
        hash32(F.col("token")).alias("h"),
    )
    bucket = F.floor(F.col("h") / F.lit(1 << w)).cast("int")
    rest = (F.col("h") % F.lit(1 << w)).cast("bigint")
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - _bit_length(rest)
    )
    # finest-grain registers: ONE corpus pass, map-side combine bounds
    # each task's shuffle output at m rows per (route)
    table_regs = (
        toks.select(
            "route",
            "database_name",
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("route", "database_name", "bucket")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    from binlog_processer_spark.operators._cache import pin

    # pinned so the three level branches share ONE corpus pass instead
    # of recomputing the token explode per level; _cache.unpin_all()
    # releases it (same contract as the LSH persists)
    table_regs = pin(table_regs)
    # upper levels: register folds over the tiny register relation
    db_regs = table_regs.groupBy("database_name", "bucket").agg(
        F.max("rho").cast("int").alias("rho")
    )
    all_regs = db_regs.groupBy("bucket").agg(
        F.max("rho").cast("int").alias("rho")
    )
    lv_table = table_regs.select(
        F.lit("table").alias("level"),
        F.col("route").alias("key"),
        "bucket",
        "rho",
    )
    lv_db = db_regs.select(
        F.lit("database").alias("level"),
        F.col("database_name").alias("key"),
        "bucket",
        "rho",
    )
    lv_all = all_regs.select(
        F.lit("global").alias("level"),
        F.lit("*").alias("key"),
        "bucket",
        "rho",
    )
    levels = lv_table.unionByName(lv_db).unionByName(lv_all)
    # (level, key) stay real grouping columns through hll_estimate — a
    # route or database name containing any would-be delimiter can never
    # collapse two rollup rows
    out = hll_estimate(levels, b, key_cols=("level", "key"))
    return out.orderBy("level", "key")


def partition_split_points(
    kept: DataFrame,
    n_partitions: int = 8,
    k: int = 256,
    with_exact: bool = True,
) -> DataFrame:
    """Sample-based range-partitioner boundaries over ``n_tok`` — the
    planning use of the bottom-k row sample, and exactly the technique
    Spark's own RangePartitioner applies before a global sort: draw a
    bounded uniform sample, take its order statistics as split points,
    and range-partition the full data against them. Published as
    B−1 split rows so a job can CLUSTER BY length bucket (packing,
    curriculum shards) with balanced partitions and zero full-data sort.

    Split b (1..B−1) = the sample value at lower-nearest-rank position
    ``floor((k_used−1)·b/B)+1`` — the same rule ``kmv_sample_quantiles``
    uses, so with k >= n the estimated splits ARE the exact ones.
    ``with_exact`` joins the exact full-data order statistic and the
    absolute error per split (ONE global sort — the audit the sketch
    exists to avoid at 10^12; drop it at scale). All integer; the
    DuckDB oracle matches bit-for-bit.
    """
    if n_partitions < 2:
        raise ValueError(
            f"partition_split_points: n_partitions must be >= 2, got {n_partitions}"
        )
    if k < n_partitions:
        raise ValueError(
            f"partition_split_points: k={k} must be >= n_partitions={n_partitions}"
        )
    spark = kept.sparkSession
    pooled = kept.select(
        F.lit("*").alias("source"),
        "event_seq",
        "n_tok",
    )
    sample = kmv_row_sample(pooled, k)
    wv = Window.partitionBy("source").orderBy("val", "seq")
    ranked = sample.select(
        "source", "val", F.row_number().over(wv).alias("vrk")
    )
    sized = ranked.groupBy("source").agg(
        F.max("vrk").cast("int").alias("k_used")
    )
    bounds = spark.range(1, n_partitions).select(
        F.col("id").cast("int").alias("split_idx")
    )
    est = (
        ranked.join(sized, "source")
        .crossJoin(F.broadcast(bounds))
        .filter(
            F.col("vrk")
            == F.floor(
                (F.col("k_used") - 1) * F.col("split_idx") / n_partitions
            )
            + 1
        )
        .select(
            "split_idx",
            F.col("val").cast("bigint").alias("est_split"),
            "k_used",
        )
    )
    if not with_exact:
        return est.orderBy("split_idx")
    wf = Window.partitionBy().orderBy("n_tok", "event_seq")
    full = pooled.select(
        F.col("n_tok").cast("bigint").alias("val"),
        F.row_number().over(wf).alias("vrk"),
    )
    nrows = full.agg(F.max("vrk").cast("bigint").alias("n_rows"))
    exact = (
        full.crossJoin(F.broadcast(nrows))
        .crossJoin(F.broadcast(bounds))
        .filter(
            F.col("vrk")
            == F.floor(
                (F.col("n_rows") - 1) * F.col("split_idx") / n_partitions
            )
            + 1
        )
        .select(
            "split_idx",
            F.col("val").alias("exact_split"),
            "n_rows",
        )
    )
    return (
        est.join(exact, "split_idx")
        .select(
            "split_idx",
            "n_rows",
            "k_used",
            "est_split",
            "exact_split",
            F.abs(F.col("est_split") - F.col("exact_split"))
            .cast("bigint")
            .alias("abs_err"),
        )
        .orderBy("split_idx")
    )
