"""Text-analysis functions for training-data curation.

Training-pipeline additions (SURVEY has no analogue — the reference carries
opaque row payloads): language-ID heuristic, quality scoring, token counting,
and document fingerprinting, all as JVM-side column expressions (codegen, no
UDFs) with exact DuckDB-oracle parity (ratios reported in basis points).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORDS = "split(trim(coalesce(text, '')), '\\\\s+')"
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


# GPT-2-shaped pre-tokenizer pattern, ASCII-restricted so Java regex (Spark)
# and RE2-ish (DuckDB) agree: a token is an optionally-space-prefixed letter
# run, digit run, or punctuation run
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_cols(df: DataFrame) -> DataFrame:
    """Token counting three ways, all pure expressions:
    - ws_tokens: whitespace split count
    - bpe_tokens: matches of the GPT-2-shaped pre-tokenizer regex
      (``BPE_PATTERN``) — the 'BPE-ish regex' counter
    - subword_est: ceil(chars/4), the chars-per-token rule of thumb

    The counters are the shared ``_N_WORDS`` / ``bpe_tokens_col``
    expressions, so this report and ``quality_token_budget`` can never
    desync.
    """
    return df.select(
        "doc_id",
        F.expr(_N_WORDS).cast("int").alias("ws_tokens"),
        bpe_tokens_col().alias("bpe_tokens"),
        F.expr("cast(ceil(length(coalesce(text, '')) / 4.0) as int)").alias("subword_est"),
        F.length(F.coalesce("text", F.lit(""))).cast("int").alias("n_chars"),
    )


def stopword_ratio_bp() -> Column:
    in_set = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(
        f"CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0 ELSE "
        f"cast(floor(size(filter({WORDS}, w -> lower(w) IN ({in_set}))) * 10000"
        f" / size({WORDS})) as bigint) END"
    )


_N_WORDS = f"CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0 ELSE size({WORDS}) END"
_MEAN_WLEN_BP = (
    f"CASE WHEN ({_N_WORDS}) = 0 THEN 0 ELSE "
    f"cast(floor(length(array_join({WORDS}, '')) * 10000 / ({_N_WORDS})) as bigint) END"
)


def bpe_tokens_col() -> Column:
    """BPE-ish token count of ``text`` as a reusable Column (the
    pre-tokenizer-regex counter from ``token_count_cols``).

    Built through the Column API, NOT an F.expr SQL string: Spark's SQL
    literal parser unescapes ``\\s`` to ``s``, which silently removed
    whitespace from the negated class — punctuation runs then swallowed
    the spaces between them and undercounted (' ! ?' counted as ONE
    token), while the DuckDB oracle kept the intended pattern.
    """
    return F.size(
        F.regexp_extract_all(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(BPE_PATTERN),
            F.lit(0),
        )
    ).cast("int")


def quality_bp_col() -> Column:
    """Composite quality score (basis points) of ``text`` as a reusable
    Column — word count band + mean word length band + stopword presence."""
    return (
        F.when(F.expr(_N_WORDS).between(10, 1000), F.lit(4000)).otherwise(0)
        + F.when(
            F.expr(_MEAN_WLEN_BP).between(30000, 80000), F.lit(3000)
        ).otherwise(0)
        + F.when(stopword_ratio_bp() > 0, F.lit(3000)).otherwise(0)
    ).cast("bigint")


def quality_scores(df: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score (basis points):
    word count band, mean word length band, stopword presence — the
    Gopher-rules-shaped feature family, deterministic and oracle-parity."""
    return df.select(
        "doc_id",
        F.expr(_N_WORDS).cast("int").alias("n_words"),
        F.expr(_MEAN_WLEN_BP).alias("mean_word_len_bp"),
        stopword_ratio_bp().alias("stopword_bp"),
        quality_bp_col().alias("quality_bp"),
    )


def lang_id(df: DataFrame) -> DataFrame:
    """Character/stopword n-gram heuristic language ID.

    Deterministic rule: English stopword hit-rate ≥ 8% → 'en'; else if mean
    word length < 4 → 'short'; else 'unk'. (The corpus text is synthetic
    English-ish regardless of its `lang` label; the operator demonstrates the
    classification plumbing, and `lang_match` reports agreement.)
    """
    pred = (
        F.when(stopword_ratio_bp() >= 800, F.lit("en"))
        .when(
            F.expr(
                f"CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0 ELSE "
                f"length(array_join({WORDS}, '')) / size({WORDS}) END"
            )
            < 4,
            F.lit("short"),
        )
        .otherwise(F.lit("unk"))
    )
    return df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("lang_match"),
    )


def fingerprints(df: DataFrame) -> DataFrame:
    """Document fingerprints:
    - content_fp: md5 of whitespace-normalized text (exact-dup key)
    - shingle_fp: md5 over the *sorted distinct* 3-gram shingle set — a
      rolling-hash-set fingerprint robust to shingle order."""
    norm = f"array_join({WORDS}, ' ')"
    sh = (
        f"transform(sequence(1, greatest(size({WORDS}) - 2, 0)),"
        f" i -> array_join(slice({WORDS}, i, 3), ' '))"
    )
    return df.select(
        "doc_id",
        F.expr(f"md5({norm})").alias("content_fp"),
        F.expr(
            f"CASE WHEN size({WORDS}) < 3 THEN md5('') ELSE "
            f"md5(array_join(array_sort(array_distinct({sh})), '|')) END"
        ).alias("shingle_fp"),
    )


_DISTINCT_BP = (
    f"CASE WHEN ({_N_WORDS}) = 0 THEN 0 ELSE "
    f"cast(floor(size(array_distinct({WORDS})) * 10000 / ({_N_WORDS}))"
    " as bigint) END"
)


def default_funnel_stages() -> list[tuple[str, Column]]:
    """The default quality-filter cascade over the documents table — the
    C4/Gopher/RefinedWeb-shaped rule family, each stage one codegen
    boolean over the shared word expressions (no UDF, no shuffle):

    1. lang_allowed — language whitelist
    2. min_words / max_words — Gopher word-count band
    3. stopword_floor — C4's "has stopwords" symbol-soup rejector
    4. distinct_ratio — low lexical diversity (boilerplate/spam) floor

    Thresholds are tuned for the synthetic corpus so every stage has
    real selectivity at sf0.01; a production pipeline passes its own
    ``stages`` list built from the same primitives.
    """
    return [
        ("lang_allowed", F.col("lang").isin("en", "de", "fr")),
        ("min_words", F.expr(_N_WORDS) >= 15),
        ("max_words", F.expr(_N_WORDS) <= 80),
        ("stopword_floor", stopword_ratio_bp() >= 200),
        ("distinct_ratio", F.expr(_DISTINCT_BP) >= 5500),
    ]


def filter_funnel(
    df: DataFrame, stages: list[tuple[str, Column]] | None = None
) -> DataFrame:
    """Per-stage funnel report for a filter cascade: for each stage, how
    many documents it rejects on its own (``fail_marginal``) and how many
    survive the cascade up to and including it (``survivors``) — the
    standard corpus-QA artifact a training-data pipeline publishes with
    every ingest.

    ONE pass, fully codegen: every stage flag is a boolean expression in
    a single projection, the counts are one global aggregate (bounded
    output: one row per stage via ``stack``). No per-stage scan, no
    shuffle beyond the final single-row aggregate — at 10^12 rows this
    costs exactly one corpus read.

    Returns (stage_idx int, stage string, fail_marginal bigint,
    survivors bigint), one row per stage in cascade order.
    """
    stages = stages if stages is not None else default_funnel_stages()
    flags = df.select(
        *[
            c.cast("int").alias(f"f{i}")
            for i, (_, c) in enumerate(stages)
        ]
    )
    aggs = []
    cum = None
    for i in range(len(stages)):
        f = F.col(f"f{i}")
        aggs.append(F.sum(1 - f).alias(f"fail{i}"))
        cum = f if cum is None else cum * f
        aggs.append(F.sum(cum).alias(f"cum{i}"))
    stack_args = ", ".join(
        f"cast({i} as int), '{name}', fail{i}, cum{i}"
        for i, (name, _) in enumerate(stages)
    )
    return flags.agg(*aggs).select(
        F.expr(
            f"stack({len(stages)}, {stack_args})"
            " as (stage_idx, stage, fail_marginal, survivors)"
        )
    )


# PII patterns restricted to the regex subset where Java (Spark) and
# RE2 (DuckDB/production scanners) agree: character classes, bounded/
# open counted repetition, optional prefix — no backrefs, no lookaround,
# no alternation whose leftmost-first (Java) vs leftmost-longest (RE2)
# semantics could diverge. Redaction is SEQUENTIAL in list order, and
# each count is taken on the text as already redacted by earlier stages,
# so n_<kind> is exactly the number of replacements performed (an email's
# digit runs can't double-count as a phone).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}-[0-9]{3,4}-[0-9]{3,4}", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    include_text: bool = False,
) -> DataFrame:
    """PII redaction for training text — the scrub every published-corpus
    pipeline runs before tokens leave the building (C4 and RefinedWeb both
    ship regex scrub stages; the reference carries payloads opaquely and
    has no analogue).

    Pure codegen: per-pattern ``regexp_extract_all`` counts + a chained
    ``regexp_replace``, all in ONE projection — no UDF, no shuffle; at
    10^12 rows this is a map-only pass that pipelines into whatever write
    follows. Returns per-doc ``n_<kind>`` counts, the redacted length, and
    an md5 fingerprint of the redacted text; ``include_text=True`` adds
    the redacted text itself as ``clean_text`` (what a release writes
    back for flagged docs — the default report carries only counts + fp
    so it stays narrow).
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    clean = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, repl in pats:
        counts.append(
            F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(
        "doc_id",
        *counts,
        F.length(clean).cast("bigint").alias("clean_len"),
        F.md5(clean).alias("clean_fp"),
        *([clean.alias("clean_text")] if include_text else []),
    )


# Java-regex ∩ RE2 character classes (hex escapes, ranges — no shorthand
# that differs across engines). C0 controls except \t \n \r.
_CTRL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
_NON_ASCII_KEEP = "[^\\x20-\\x7E\\t\\n\\r]"
_REPLACEMENT_CHAR = "�"


def encoding_qa(
    df: DataFrame, text_col: str = "text", min_ascii_bp: int = 9000
) -> DataFrame:
    """Mojibake / encoding-noise report — the decode-sanity gate a crawl
    pipeline runs right after charset conversion: U+FFFD replacement-char
    count (the tombstone every failed decode leaves), stray C0 control
    characters (binary bleeding into text), and the printable-ASCII ratio
    in basis points, plus the resulting keep verdict.

    Counts are length-differences under literal/class regexp_replace —
    ONE codegen projection, no UDF, no shuffle; character classes live in
    the Java-regex ∩ RE2 subset and lengths are codepoint-based in both
    engines, so the report is oracle-exact.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t).cast("bigint")
    n_repl = (
        F.length(t) - F.length(F.regexp_replace(t, _REPLACEMENT_CHAR, ""))
    ).cast("bigint")
    n_ctrl = (
        F.length(t) - F.length(F.regexp_replace(t, _CTRL_CLASS, ""))
    ).cast("bigint")
    ascii_n = F.length(F.regexp_replace(t, _NON_ASCII_KEEP, ""))
    ascii_bp = (
        F.when(n_chars == 0, F.lit(10000))
        .otherwise(F.floor(ascii_n * 10000 / n_chars))
        .cast("bigint")
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_repl.alias("n_repl"),
        n_ctrl.alias("n_ctrl"),
        ascii_bp.alias("ascii_bp"),
        (
            (n_repl == 0) & (n_ctrl == 0) & (ascii_bp >= min_ascii_bp)
        ).alias("ok"),
    )


def apply_filter_funnel(
    df: DataFrame, stages: list[tuple[str, Column]] | None = None
) -> DataFrame:
    """The cascade's keep decision: documents passing EVERY stage.
    Same boolean expressions as ``filter_funnel`` (one projection, pure
    codegen filter pushed to the scan)."""
    stages = stages if stages is not None else default_funnel_stages()
    keep = None
    for _, c in stages:
        keep = c if keep is None else keep & c
    return df.filter(keep)
