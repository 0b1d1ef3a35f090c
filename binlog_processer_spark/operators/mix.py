"""Training-mix operators: deterministic stratified sampling, token-budget
sequence packing, and train/eval contamination screening.

These are the ops a pretraining-data pipeline runs between "corpus is
clean" (dedup.py, text.py) and "tokens hit the trainer": choose how much
of each source enters the mix, pack documents into fixed token budgets,
and prove the mix does not leak the eval set. All three are pure
DataFrame compositions — codegen filters, one bounded window, and a
broadcast semi-join; no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles


def _hash_frac8(col: Column) -> Column:
    """First 8 hex chars of md5 — compared LEXICOGRAPHICALLY against an
    8-hex-digit threshold. md5 hex digits are uniform, so
    P(prefix < format(rate * 16^8, '08x')) == rate, and plain string
    comparison reproduces bit-for-bit in any engine (no hex→int casts,
    which SQL dialects disagree on)."""
    return F.substring(F.md5(col.cast("string")), 1, 8)


def _md5_prefix_int(col: Column) -> Column:
    """``_hash_frac8`` as a uint32-range bigint — THE determinism-critical
    hash behind packing shards, export shards, and shard manifests. One
    definition on purpose: three hand-kept spellings of this expression
    would eventually fork shard assignment from the manifests."""
    return F.conv(_hash_frac8(col), 16, 10).cast("bigint")


def rate_threshold(rate: float) -> str:
    """Acceptance threshold for a [0,1] sampling rate, compared as a
    string against the 8-hex md5 prefix. rate 1.0 returns ``"g"`` —
    lexicographically above every hex digit — because capping at
    ``ffffffff`` with a strict ``<`` silently dropped the ~1-in-2^32
    docs whose prefix is exactly ``ffffffff`` (hundreds of rows at
    10^12 scale) from a supposed keep-everything stratum."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    if rate >= 1.0:
        return "g"
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """The training-mix sampler: keep each stratum at its own rate
    (upsample-by-keeping wiki, thin the crawl, drop the rest), decided by
    hashed-id threshold instead of an RNG.

    Deterministic and infrastructure-free: the same row is kept on every
    run, any cluster size, any partitioning — rerunning a failed stage
    cannot change the mix (an RNG sampler resampled per task attempt
    would). Plan-wise it is a single codegen filter: no shuffle, no state,
    and Parquet row-group statistics still prune upstream."""
    thr = F.when(F.lit(False), F.lit(""))
    for k, v in sorted(rates.items()):
        thr = thr.when(F.col(strat_col) == k, F.lit(rate_threshold(v)))
    thr = thr.otherwise(F.lit(rate_threshold(default_rate)))
    return df.filter(_hash_frac8(F.col(id_col)) < thr)


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    tok_col: str = "n_tok",
    id_col: str = "doc_id",
    strat_col: str | None = "source",
    shards: int = 1,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget sequences (pretraining
    sequence packing): within each (stratum, shard), documents are laid
    out in deterministic ``id_col`` order and a sequence boundary falls
    every ``max_tokens`` tokens — ``seq = floor(start_offset/max_tokens)``
    where ``start_offset`` is the running token total before the document.
    A document straddling a boundary stays in the sequence where it
    started (standard greedy packing; a sequence can overrun by at most
    one document's tail).

    Scale: packing is inherently sequential PER SEQUENCE STREAM, so one
    window per stratum would serialize 100 TB through a handful of tasks.
    ``shards`` salts each stratum into ``md5(id) % shards`` independent
    packing streams — deterministic, and each stream's window is a
    separate shuffle partition, so parallelism is (strata × shards)
    regardless of corpus size. Output: one row per doc with its
    (stratum, shard, seq, offset) placement."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    shard = (_md5_prefix_int(F.col(id_col)) % shards).alias("shard")
    out = df.select(
        *([strat_col] if strat_col else []),
        F.col(id_col),
        F.col(tok_col).cast("bigint").alias("n_tok"),
        shard,
        # carried payload columns (e.g. the token arrays themselves) ride
        # the SAME shuffle as the placement window — materialization never
        # pays a second join back to the corpus
        *(carry_cols or []),
    )
    keys = ([strat_col] if strat_col else []) + ["shard"]
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # start offset = cumulative tokens BEFORE this doc
    out = out.withColumn(
        "offset", F.sum("n_tok").over(w) - F.col("n_tok")
    )
    return out.withColumn(
        "seq", F.floor(F.col("offset") / max_tokens).cast("bigint")
    )


def rebalance_report(
    df: DataFrame,
    targets: dict[str, float],
    tok_col: str = "n_tok",
    strat_col: str = "source",
) -> DataFrame:
    """Mixing-weight planner: per-source sampling rates that hit a target
    token-share distribution with MAXIMUM data retention (the DoReMi/
    Pile-style 'domain weights → sampling rates' step, in its exact
    closed form). With c = min over targeted sources of tokens_s /
    target_s, rate_s = c·target_s / tokens_s ≤ 1 — the binding source
    keeps everything, every other source downsamples just enough, and
    the sampled mix hits the target shares exactly. Sources absent from
    ``targets`` get rate 0 (excluded from the mix).

    One hash aggregate (bounded: one row per source) + one tiny
    unpartitioned window over that aggregate — nothing row-scale
    shuffles. Shares/rates surface in floored basis points; pair with
    ``stratified_sample`` (same md5 determinism) to apply the rates.

    A targeted source ABSENT from ``df`` still gets an output row
    (tokens 0, rate 0) — the target is then unachievable and the report
    must show the miss, not silently renormalize over the sources that
    happen to exist. Zero-token sources are excluded from the binding
    constant c (c over them would be 0 and zero out the whole mix).
    """
    if not targets or any(v <= 0 for v in targets.values()):
        raise ValueError("targets must be a non-empty {source: share>0} map")
    tot_t = sum(targets.values())
    tgt_rows = df.sparkSession.createDataFrame(
        [(s, v / tot_t) for s, v in sorted(targets.items())],
        f"{strat_col} string, __tgt double",
    )
    tok = (
        df.groupBy(strat_col)
        .agg(F.sum(tok_col).cast("bigint").alias("tokens"))
        .join(tgt_rows, strat_col, "full_outer")
        .select(
            strat_col,
            F.coalesce("tokens", F.lit(0)).cast("bigint").alias("tokens"),
            "__tgt",
        )
    )
    w = Window.partitionBy()  # bounded: n_sources rows
    ratio = F.when(
        F.col("__tgt").isNotNull() & (F.col("tokens") > 0),
        F.col("tokens") / F.col("__tgt"),
    )
    out = (
        # rate as c / (tokens/tgt), NOT c * tgt / tokens: the binding
        # source (argmin of ratio) divides the SAME double by itself, so
        # its rate is exactly 1.0 in IEEE arithmetic — the algebraically
        # equal c*tgt/tokens re-rounds twice and can land at 0.999…,
        # flipping floor(rate*10000) to 9999 (observed as a local[8] vs
        # local[32] mismatch in temperature_targets, which shares this
        # shape). Exactness here is the two-cluster-size invariant.
        tok.withColumn("__q", ratio)
        .withColumn("__c", F.min("__q").over(w))
        .withColumn("__total", F.sum("tokens").over(w))
        .withColumn(
            "__rate",
            F.when(
                F.col("__tgt").isNull() | (F.col("tokens") == 0),
                F.lit(0.0),
            ).otherwise(
                F.least(F.lit(1.0), F.col("__c") / F.col("__q"))
            ),
        )
    )
    return out.select(
        strat_col,
        "tokens",
        F.when(F.col("__total") == 0, F.lit(0))
        .otherwise(F.floor(F.col("tokens") * 10000 / F.col("__total")))
        .cast("bigint")
        .alias("cur_share_bp"),
        F.floor(F.coalesce(F.col("__tgt"), F.lit(0.0)) * 10000)
        .cast("bigint")
        .alias("target_share_bp"),
        F.floor(F.col("__rate") * 10000).cast("bigint").alias("rate_bp"),
        F.floor(F.col("__rate") * F.col("tokens"))
        .cast("bigint")
        .alias("kept_tokens"),
    )


def sequence_boundaries(
    packed: DataFrame,
    max_tokens: int,
    strat_col: str | None = "source",
) -> DataFrame:
    """Per-packed-sequence document boundaries — the artifact the trainer's
    data loader needs next to the tokens: where documents start inside each
    fixed-budget sequence, so attention masks can forbid cross-document
    attention (the "sequence packing with boundary masks" everyone trains
    with). Input is ``pack_sequences`` output; emits one row per
    (stratum, shard, seq) with the IN-SEQUENCE start offsets, doc count,
    and fill (tokens actually used, in basis points of ``max_tokens`` —
    >10000 means the greedy tail overran, also visible to the loader).

    One hash aggregate over the packed relation (keys = sequence identity,
    map-side combinable, output rows = corpus_tokens/max_tokens): the
    boundary arrays are sorted per group, never globally.

    Coordinates: boundaries are WINDOW-relative (offset − seq·budget). A
    first boundary > 0 means the window's head belongs to the previous
    sequence's overrun tail; a loader cutting the MATERIALIZED token
    array (`materialize_packed`, whose origin is the first member doc)
    subtracts the first boundary — tests pin that cutting at the deltas
    reconstructs every member document exactly.
    """
    keys = ([strat_col] if strat_col else []) + ["shard", "seq"]
    rel = F.col("offset") - F.col("seq") * max_tokens
    return (
        packed.select(*keys, rel.alias("__rel"), "n_tok")
        .groupBy(*keys)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sort_array(F.collect_list("__rel")).alias("boundaries"),
            # floor-then-cast: double→bigint casts round in some engines
            # (DuckDB) and truncate in others (Spark) — floor pins it
            F.floor(
                (F.max(F.col("__rel") + F.col("n_tok")) * 10000)
                / max_tokens
            )
            .cast("bigint")
            .alias("fill_bp"),
        )
    )


def materialize_packed(
    df: DataFrame,
    max_tokens: int,
    tokens_col: str = "tokens",
    tok_col: str = "n_tok",
    id_col: str = "doc_id",
    strat_col: str | None = "source",
    shards: int = 1,
) -> DataFrame:
    """Materialize the packed sequences themselves — the trainer's final
    artifact on the tokens axis: per (stratum, shard, seq) the flattened
    token array in document order, with doc count and true token length
    (a sequence may overrun ``max_tokens`` by the greedy tail; trainers
    crop, and ``sequence_boundaries`` carries the mask offsets).

    Cost model at 10^12 tokens: the token payload moves through exactly
    ONE shuffle — it rides the placement window's partitioning via
    ``pack_sequences(carry_cols=...)`` (never a second join back to the
    corpus), then one hash aggregate whose groups are bounded by
    ``max_tokens`` (plus one doc tail), so no group outgrows memory
    regardless of corpus size. Flattening is sort_array over in-group
    (offset, tokens) structs — per group, never global.
    """
    packed = pack_sequences(
        df,
        max_tokens,
        tok_col=tok_col,
        id_col=id_col,
        strat_col=strat_col,
        shards=shards,
        carry_cols=[tokens_col],
    )
    keys = ([strat_col] if strat_col else []) + ["shard", "seq"]
    s = F.struct(
        F.col("offset").alias("o"), F.col(tokens_col).alias("t")
    )
    return (
        packed.select(*keys, s.alias("__s"), "n_tok")
        .groupBy(*keys)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tok"),
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list("__s")), lambda x: x["t"]
                )
            ).alias("tokens"),
        )
    )


def contamination(
    train: DataFrame,
    holdout: DataFrame,
    n: int = 3,
) -> DataFrame:
    """Train/eval leakage screen: for every training document sharing at
    least one word ``n``-gram with the holdout set, the count of distinct
    shared shingles (the triage score for exclusion).

    Plan: holdout shingles are DISTINCT-reduced then broadcast (eval sets
    are thousands of docs against billions — the asymmetry IS the
    algorithm), so the train side is one scan + codegen shingle explode +
    broadcast semi-join; no fact shuffle. For a holdout too large to
    broadcast, the same expression degrades to a shuffle join untouched."""
    train_sh = shingles(train, n)
    hold_sh = F.broadcast(
        shingles(holdout, n).select("shingle").distinct()
    )
    return (
        train_sh.join(hold_sh, "shingle")
        # count(*), not countDistinct: shingles() is already distinct per
        # (doc_id, shingle) and the broadcast side is .distinct(), so the
        # join output has no per-doc duplicates — a distinct-aggregate here
        # pays a second dedup phase for identical numbers
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("shared_shingles"))
    )


def quality_token_budget(docs: DataFrame, bin_bp: int = 2500) -> DataFrame:
    """Curriculum planning report: per (source, quality bin), how many
    documents there are and how many tokens they would contribute to the
    mix — the input every data-budget decision (which bins to upsample,
    where the next 10^12 tokens come from) is made against.

    ``quality_bin`` is ``floor(quality_bp / bin_bp)`` over the composite
    Gopher-rules score (functions/text.py); the token budget uses the
    BPE-ish regex counter, the closest stand-in for real tokenizer cost.

    Plan: ONE scan of the corpus — both the score and the token count are
    codegen expressions evaluated in the same projection — followed by a
    hash aggregate whose output is bounded by sources x bins, so map-side
    combine collapses everything before the wire. At 10^12 documents the
    cost is exactly one pass over the text bytes.
    """
    from binlog_processer_spark.functions.text import (
        bpe_tokens_col,
        quality_bp_col,
    )

    return (
        docs.select(
            "source",
            F.floor(quality_bp_col() / bin_bp).cast("int").alias(
                "quality_bin"
            ),
            bpe_tokens_col().alias("bpe_tokens"),
        )
        .groupBy("source", "quality_bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("bpe_tokens").cast("bigint").alias("tok_budget"),
        )
    )


def _shard_id(id_col: str, n_shards: int) -> Column:
    """Deterministic shard: first 8 md5 hex digits as uint32, mod n.
    Uniform (md5), ingest-order-independent, and engine-independent —
    DuckDB reproduces it as ``('0x' || substr(md5(id), 1, 8))::BIGINT %
    n`` (hex prefix, not Spark's murmur ``hash()``, whose seed/algorithm
    is engine-private)."""
    return (_md5_prefix_int(F.col(id_col)) % n_shards).alias("shard_id")


def shard_assign(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic training-shard export assignment: (id, shard_id,
    pos) — which output shard each document lands in and its stable
    position within the shard. This is the last hop of a pretraining
    pipeline: the trainer's data loader addresses (shard, pos), so the
    assignment must be reproducible across runs, clusters, and engines;
    both coordinates derive only from md5(id).

    Scale plan: ONE shuffle, partitioned by shard_id — exactly the
    shuffle the export write needs anyway, so assignment and write
    share it: pass the payload columns via ``carry_cols`` and they ride
    this same shuffle (a second corpus join to fetch them back would
    re-pay the payload movement). Within-shard order is md5 hex
    (uniform ⇒ no sort skew). Parallelism equals n_shards: production
    exports use thousands of shards (n_shards ≥ executor cores), so a
    window per shard is the natural unit — don't call this with
    n_shards=2 on a 1000-core cluster and expect speed.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard_id").orderBy(h.asc())
    return (
        df.select(id_col, _shard_id(id_col, n_shards), *(carry_cols or []))
        .withColumn("pos", F.row_number().over(w).cast("bigint") - 1)
    )


def shard_assign_incremental(
    df: DataFrame,
    manifest: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Append a NEW batch to an already-exported shard set without
    touching it: each new document keeps its md5-derived shard (stable
    by construction) and takes the next positions AFTER the shard's
    recorded tail — ``pos = manifest.n_docs + rank-among-new`` — so
    existing shard files stay immutable (the daily-ingest shape; a full
    re-shard of 10^12 rows to admit a 10^8 batch re-pays the corpus).

    ``manifest`` is ``shard_manifest`` output for the exported set
    (n_shards rows → broadcast; never a fact-table join). The batch pays
    one shuffle by shard_id, same as the append write. New docs order by
    md5 among THEMSELVES — append semantics, deliberately not the
    interleaved order a from-scratch run would give.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard_id").orderBy(h.asc())
    base = manifest.select(
        "shard_id", F.col("n_docs").cast("bigint").alias("__base")
    )
    return (
        df.select(id_col, _shard_id(id_col, n_shards))
        .withColumn("__rn", F.row_number().over(w).cast("bigint") - 1)
        .join(F.broadcast(base), "shard_id", "left")
        .select(
            id_col,
            "shard_id",
            (F.coalesce(F.col("__base"), F.lit(0)) + F.col("__rn")).alias(
                "pos"
            ),
        )
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-shard export manifest: (shard_id, n_docs, bytes_total,
    id_checksum) — what the exporter publishes next to the shards so a
    loader (or a re-run) can verify completeness without reading data.

    ``id_checksum`` is the SUM of each member's 32-bit md5 prefix —
    order-independent (commutative), so it needs no per-shard sort and
    no string aggregation: one hash groupBy, map-side combinable,
    bounded output (n_shards rows). Collision-detecting in practice
    (a dropped or duplicated doc shifts the sum), not cryptographic.
    """
    pre = _md5_prefix_int(F.col(id_col))
    return (
        df.select(
            _shard_id(id_col, n_shards),
            pre.alias("__pre"),
            F.coalesce(F.col(size_col), F.lit(0)).alias("__sz"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__sz").cast("bigint").alias("bytes_total"),
            F.sum("__pre").cast("bigint").alias("id_checksum"),
        )
    )


def holdout_carve(
    df: DataFrame,
    k: int,
    strat_col: str = "source",
    id_col: str = "doc_id",
    oversample: int = 4,
) -> DataFrame:
    """Carve an EXACT-size eval holdout: the ``k`` documents of each
    stratum with the smallest ``md5(id)`` — the fixed-count companion to
    ``stratified_sample`` (rate-based). Deterministic like the sampler:
    the same k docs on every run, any cluster, any partitioning, and
    stable under corpus growth except at the hash boundary.

    Scale plan — per-stratum top-k WITHOUT sorting each stratum: a plain
    window rank over 10^12 rows sorts every stratum's full partition.
    Instead (1) one column-pruned count pass bounds each stratum, (2) a
    codegen hash-threshold filter (rate ``oversample*k/n``) cuts
    candidates to ~oversample*k per stratum, (3) the window ranks only
    survivors. A stratum whose survivor count undershoots ``min(k, n)``
    (Chernoff-unlikely at oversample=4) falls back to ranking that
    stratum unfiltered — exactness is never probabilistic. Driver
    collects are bounded by the stratum count, never rows.
    """
    h = _hash_frac8(F.col(id_col))
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strat_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    full = "g"  # lexicographically above every md5 hex prefix: keep all

    def _match(s) -> Column:
        # a NULL stratum is a real stratum: == never matches it, so the
        # null key gets an explicit isNull arm (same in the fallback)
        return F.col(strat_col).isNull() if s is None else F.col(strat_col) == s

    thr = F.when(F.lit(False), F.lit(""))
    for s, n_s in sorted(counts.items(), key=lambda kv: (kv[0] is None, kv[0] or "")):
        rate = 1.0 if n_s <= oversample * k else oversample * k / n_s
        t = full if rate >= 1.0 else rate_threshold(rate)
        thr = thr.when(_match(s), F.lit(t))
    cand = df.filter(h < thr.otherwise(F.lit(full)))

    need = {s: min(k, n) for s, n in counts.items()}
    got = {
        r["s"]: r["n"]
        for r in cand.groupBy(F.col(strat_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    short = [s for s, n in need.items() if got.get(s, 0) < n]
    if short:
        is_short = F.lit(False)
        for s in short:
            is_short = is_short | _match(s)
        cand = df.filter(is_short).unionByName(cand.filter(~is_short))

    w = Window.partitionBy(strat_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(strat_col, id_col)
    )


def epoch_order(
    df: DataFrame,
    epoch: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training order WITHOUT re-shuffling data:
    ``(id, shard_id, epoch, order_key)`` where shard_id is the stable
    md5 home (identical to ``shard_assign`` — data stays where the
    export put it) and ``order_key = md5(epoch || '|' || id)`` is a
    fresh uniform permutation every epoch.

    Multi-epoch pretraining needs a different traversal order each
    epoch, reproducible across restarts, loader ranks, and engines.
    Physically re-shuffling 10^12 sequences per epoch re-pays the
    corpus; this derives the order as a PURE PROJECTION — zero shuffle,
    zero state, computable at load time by any worker that can hash.
    A loader (or a downstream ``sortWithinPartitions("order_key")``
    materialization, same pattern as ``materialize_packed``) sorts each
    shard independently; epoch-over-epoch the sort permutes because the
    seed is baked into the hash input, while shard membership — and so
    file placement — never moves.

    The ``epoch|id`` input means order keys across epochs are
    independent md5 draws: no correlation between an id's rank in epoch
    e and e+1 (the failure mode of seed-XOR schemes on weak hashes).
    """
    if epoch < 0:
        raise ValueError(f"epoch {epoch} must be >= 0")
    key = F.md5(
        F.concat(F.lit(f"{int(epoch)}|"), F.col(id_col).cast("string"))
    )
    return df.select(
        id_col,
        _shard_id(id_col, n_shards),
        F.lit(int(epoch)).cast("int").alias("epoch"),
        key.alias("order_key"),
    )


def temperature_targets(
    df: DataFrame,
    temperature: float,
    tok_col: str = "n_tok",
    strat_col: str = "source",
) -> DataFrame:
    """Temperature-scaled mixing planner: derive the target token shares
    FROM the observed shares — p_s ∝ share_s^(1/T) — then solve the same
    max-retention rate system as ``rebalance_report``. T = 1 keeps the
    natural mix (every rate 1.0); T → ∞ flattens toward uniform; the
    T ≈ 2–5 band is the standard multilingual/multi-source rebalancing
    (upweight the tail without drowning the head) when nobody hands you
    an explicit target dict.

    Unlike ``rebalance_report(df, targets)`` this never touches the
    driver: shares, the power transform, its normalizer, the binding
    constant c = min_s tokens_s / target_s, and the rates are all
    computed in ONE bounded aggregate (a row per source) plus one tiny
    unpartitioned window — nothing row-scale shuffles, so it composes
    into a job DAG over 10^12 rows as a side branch. Output schema is
    identical to ``rebalance_report`` (floored basis points; feed
    ``rate_bp / 10000`` per source to ``stratified_sample``).
    """
    if not temperature > 0:
        raise ValueError(f"temperature {temperature} must be > 0")
    alpha = 1.0 / float(temperature)
    tok = df.groupBy(strat_col).agg(
        F.sum(tok_col).cast("bigint").alias("tokens")
    )
    w = Window.partitionBy()  # bounded: n_sources rows
    share = F.col("tokens") / F.sum("tokens").over(w)
    scaled = F.when(F.col("tokens") > 0, F.pow(share, F.lit(alpha)))
    out = (
        # __c / __q (not __c * __tgt / tokens): the binding source divides
        # the same double by itself → rate exactly 1.0 at any parallelism.
        # The product form re-rounds and flipped floor(rate*10000) from
        # 10000 to 9999 between local[8] and local[32] (the sum(scaled)
        # window normalizer accumulates in partition order, so __tgt moves
        # by an ulp with cluster size; the ratio form is boundary-exact
        # for the binding row no matter what __tgt's low bits are).
        tok.withColumn("__tgt", scaled / F.sum(scaled).over(w))
        .withColumn(
            "__q",
            F.when(F.col("tokens") > 0, F.col("tokens") / F.col("__tgt")),
        )
        .withColumn("__c", F.min("__q").over(w))
        .withColumn("__total", F.sum("tokens").over(w))
        .withColumn(
            "__rate",
            F.when(F.col("tokens") == 0, F.lit(0.0)).otherwise(
                F.least(F.lit(1.0), F.col("__c") / F.col("__q"))
            ),
        )
    )
    return out.select(
        strat_col,
        "tokens",
        F.when(F.col("__total") == 0, F.lit(0))
        .otherwise(F.floor(F.col("tokens") * 10000 / F.col("__total")))
        .cast("bigint")
        .alias("cur_share_bp"),
        F.floor(F.coalesce(F.col("__tgt"), F.lit(0.0)) * 10000)
        .cast("bigint")
        .alias("target_share_bp"),
        F.floor(F.col("__rate") * 10000).cast("bigint").alias("rate_bp"),
        F.floor(F.col("__rate") * F.col("tokens"))
        .cast("bigint")
        .alias("kept_tokens"),
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str = "n_tok",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row gets key u^(1/w) for a uniform u and weight
    w; the n largest keys are exactly a weighted sample without
    replacement. Ordering by the monotone transform ln(u)/w avoids the
    overflow-prone power.

    u is NOT an RNG draw: it is the row's md5-prefix integer
    (``_md5_prefix_int``, the same canon behind shard assignment)
    mapped to (0, 1), so the sample is a pure function of the ids —
    identical on every run, any cluster size, any task retry, and
    reproducible bit-for-bit by any engine that can md5 (the DuckDB
    oracle recomputes it). Rows with weight <= 0 or NULL are excluded
    (a zero-weight row must never be drawn; NULL would order as a key
    of its own).

    Plan: filter + projection + global top-n — Spark executes
    ``orderBy(key).limit(n)`` as TakeOrderedAndProject (a bounded
    n-row heap per partition, then an n·partitions merge on the
    driver), NOT a full sort shuffle, so it survives 10^12 rows for
    any n that fits a heap. Use for quality-weighted corpus draws:
    w = quality score (or n_tok for token-proportional document
    selection).
    """
    if n <= 0:
        raise ValueError(f"n {n} must be > 0")
    u = (_md5_prefix_int(F.col(id_col)) + F.lit(0.5)) / F.lit(
        float(16**8)
    )
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .orderBy(key.desc())
        .limit(int(n))
    )
