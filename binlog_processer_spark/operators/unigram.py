"""Unigram-LM subword tokenizer (SentencePiece's second algorithm,
Kudo 2018 "Subword Regularization"): the probabilistic counterpart to
operators/bpe.py's greedy merge learning.

Where BPE *builds up* a vocabulary by merging frequent pairs, the
unigram LM *prunes down*: seed a large candidate piece inventory, fit
piece probabilities by EM over the corpus likelihood, and repeatedly
drop the least-useful pieces until the target vocabulary size remains.
Encoding is Viterbi: the segmentation maximizing the product of piece
probabilities. The two trainers fail differently (BPE can never undo an
early merge; unigram keeps every candidate alive until evidence prunes
it), which is why production pipelines ship both.

Distribution shape — identical to bpe.py, deliberately:

1. **Word-frequency aggregation (distributed).** The ONLY full-corpus
   pass (``bpe.word_counts`` reused verbatim); map-side combine shrinks
   the shuffle to distinct words per task.
2. **Seed + EM + prune (driver, over the compact word table).** The
   word table is bounded (``max_words`` TakeOrderedAndProject on the
   ``cnt DESC, word`` total order), so seeding (all substrings up to
   ``max_piece_len``), the E-step (Viterbi over each distinct word,
   weighted by its count), and pruning are O(words x len x L) driver
   work — the same bounded-collect posture as bpe.train_bpe and
   mix.py's strata collect.
3. **Encode (distributed).** Piece log-probs ride the closure;
   ``mapInPandas`` Viterbi with a per-partition word→ids cache (Zipfian
   corpora hit the cache almost always).

Determinism deviations from the reference implementation (documented,
test-pinned): hard-EM (Viterbi counts) instead of forward-backward
expected counts, and count-based pruning (drop lowest expected count,
tie lexicographic) instead of likelihood-loss ranking. Both keep the
trainer a pure function of the corpus — the property every oracle-gated
query in this repo relies on — at the cost of slightly different (not
worse-in-kind) vocabularies than sentencepiece's. The float-EM
refinement itself has no cross-engine twin (IEEE log-probs), so it
lives behind the run_tokenize CLI and tests/test_unigram.py's
from-scratch reference; the DRIVER-facing contract queries are the
trainer's two relational stages — ``seed_pieces_df`` (integer substring
scores) and ``viterbi_encode_stats`` (integer micro-nat Viterbi under
the quantized EM-initialization model, ``seed_model_df``) — each with
an exact DuckDB oracle.

Reference parity: the reference engine has no tokenizer; this module is
part of the LLM-training-pipeline surface the build brief mandates
alongside SURVEY.md §2 (tokens axis).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binlog_processer_spark.operators.bpe import word_counts

UNK_ID = -1
# log-prob charged per character of unknown material: worse than any
# real piece can be, so Viterbi uses known pieces wherever possible
UNK_CHAR_LOGPROB = -20.0
MAX_TRAIN_WORDS = 65536


def viterbi_segment(
    word: str,
    logprobs: dict,
    max_piece_len: int = 8,
) -> tuple[tuple[str, ...], float]:
    """Best segmentation of ``word`` under a unigram piece model.

    dp over prefix ends; transition j→i consumes piece ``word[j:i]``.
    Unknown single characters are admitted at ``UNK_CHAR_LOGPROB`` so
    every word segments (open-vocabulary coverage). Ties on total
    log-prob break toward FEWER pieces, then toward the longer last
    piece — deterministic without depending on float epsilons beyond
    equality.
    """
    n = len(word)
    if n == 0:
        return (), 0.0
    NEG = float("-inf")
    best: list[float] = [NEG] * (n + 1)
    best_pieces: list[int] = [0] * (n + 1)  # piece count, for tie-break
    back: list[int] = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] == NEG:
                continue
            piece = word[j:i]
            lp = logprobs.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = UNK_CHAR_LOGPROB
            cand = best[j] + lp
            cand_pieces = best_pieces[j] + 1
            if cand > best[i] or (
                cand == best[i]
                and (
                    cand_pieces < best_pieces[i]
                    or (cand_pieces == best_pieces[i] and j < back[i])
                )
            ):
                best[i] = cand
                best_pieces[i] = cand_pieces
                back[i] = j
    pieces: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return tuple(pieces), best[n]


def _seed_pieces(
    counts: list[tuple[str, int]],
    seed_size: int,
    max_piece_len: int,
) -> dict:
    """Initial inventory: every substring (length <= max_piece_len) of
    the word table, scored by frequency x length (SentencePiece seeds
    from the suffix-array equivalent); all single characters are always
    kept for coverage. Returns piece -> raw score."""
    scores: Counter = Counter()
    chars: set[str] = set()
    for w, c in counts:
        chars.update(w)
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                piece = w[i : i + ln]
                scores[piece] += c * ln
    multi = [p for p in scores if len(p) > 1]
    # deterministic cut: score DESC, piece ASC
    multi.sort(key=lambda p: (-scores[p], p))
    keep = set(chars)
    for p in multi[: max(0, seed_size - len(keep))]:
        keep.add(p)
    return {p: scores[p] for p in keep}


def _normalize(counts: dict) -> dict:
    total = sum(counts.values())
    if total <= 0:
        return {p: UNK_CHAR_LOGPROB for p in counts}
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items() if c > 0}


def train_on_counts(
    counts: Iterable[tuple[str, int]],
    vocab_size: int = 512,
    seed_size: int = 4096,
    max_piece_len: int = 8,
    em_rounds: int = 2,
    prune_frac: float = 0.25,
) -> "UnigramModel":
    """Seed → (EM → prune) until the inventory fits ``vocab_size``.

    Each EM round: Viterbi-segment every distinct word under the current
    model, accumulate count-weighted piece usage (hard EM), re-normalize
    to probabilities; then drop the lowest-usage multi-char pieces
    (``prune_frac`` of the excess, tie lexicographic) — single chars are
    never pruned (coverage). A final EM pass refits probabilities on the
    surviving inventory.
    """
    table = [(w, int(c)) for w, c in counts if w]
    inventory = _seed_pieces(table, seed_size, max_piece_len)
    logprobs = _normalize(inventory)
    while True:
        # E-step (hard): count-weighted Viterbi usage
        usage: Counter = Counter()
        for w, c in table:
            pieces, _ = viterbi_segment(w, logprobs, max_piece_len)
            for p in pieces:
                usage[p] += c
        # M-step. Single characters are the coverage floor: even when a
        # char only ever appears inside a winning multi-char piece (zero
        # Viterbi usage), it must stay in the model with SOME mass so
        # unseen words still segment — add-one smoothing on chars only.
        kept_counts = {
            p: (max(usage.get(p, 0), 1) if len(p) == 1 else usage[p])
            for p in logprobs
            if len(p) == 1 or usage.get(p, 0) > 0
        }
        excess = len(kept_counts) - vocab_size
        if excess <= 0:
            logprobs = _normalize(kept_counts)
            em_rounds -= 1
            if em_rounds <= 0:
                break
            continue
        # prune: lowest usage first, ties lexicographically — but never
        # single characters
        multi = [p for p in kept_counts if len(p) > 1]
        multi.sort(key=lambda p: (kept_counts[p], p))
        n_drop = min(len(multi), max(1, int(excess * prune_frac)))
        for p in multi[:n_drop]:
            del kept_counts[p]
        logprobs = _normalize(kept_counts)
    pieces = sorted(logprobs)
    vocab = {p: i for i, p in enumerate(pieces)}
    return UnigramModel(
        pieces=tuple(pieces),
        logprobs={p: logprobs[p] for p in pieces},
        vocab=vocab,
        max_piece_len=max_piece_len,
    )


@dataclass(frozen=True)
class UnigramModel:
    """Fitted piece inventory. Ids are the sorted-piece order (stable
    across runs because training is deterministic)."""

    pieces: tuple
    logprobs: dict  # piece -> float log-prob
    vocab: dict  # piece -> id
    max_piece_len: int

    def encode_word(self, word: str) -> tuple:
        pieces, _ = viterbi_segment(
            word, self.logprobs, self.max_piece_len
        )
        return pieces

    def piece_ids(self, pieces: Iterable[str]) -> list:
        v = self.vocab
        return [v.get(p, UNK_ID) for p in pieces]

    def decode_pieces(self, pieces: Iterable[str]) -> str:
        return "".join(pieces)

    def to_dict(self) -> dict:
        return {
            "pieces": list(self.pieces),
            "logprobs": {p: self.logprobs[p] for p in self.pieces},
            "vocab": dict(self.vocab),
            "max_piece_len": self.max_piece_len,
        }

    @staticmethod
    def from_dict(d: dict) -> "UnigramModel":
        return UnigramModel(
            pieces=tuple(d["pieces"]),
            logprobs=dict(d["logprobs"]),
            vocab=dict(d["vocab"]),
            max_piece_len=int(d["max_piece_len"]),
        )


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 512,
    seed_size: int = 4096,
    min_count: int = 2,
    max_words: int = MAX_TRAIN_WORDS,
    max_piece_len: int = 8,
    text_col: str = "text",
) -> UnigramModel:
    """Distributed word-count pass, bounded collect, driver EM loop —
    the exact posture of ``bpe.train_bpe`` (see module docstring)."""
    wc = (
        word_counts(docs, text_col)
        .where(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), "word")
        .limit(max_words)
    )
    rows = [(r["word"], r["cnt"]) for r in wc.collect()]
    return train_on_counts(
        rows,
        vocab_size=vocab_size,
        seed_size=seed_size,
        max_piece_len=max_piece_len,
    )


def encode(
    docs: DataFrame, model: UnigramModel, text_col: str = "text"
) -> DataFrame:
    """Distributed Viterbi encode; output schema and cache shape match
    ``bpe.encode`` so the two tokenizers are drop-in comparable (same
    ``encode_stats`` report downstream)."""
    from binlog_processer_spark.operators.bpe import _ENCODE_SCHEMA

    model_dict = model.to_dict()
    cols = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = UnigramModel.from_dict(model_dict)
        cache: dict = {}

        def enc(text: str) -> tuple:
            ids: list = []
            words = text.split()
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = m.piece_ids(m.encode_word(w))
                    cache[w] = got
                ids.extend(got)
            return len(words), len(ids), ids

        for pdf in batches:
            res = [enc(t) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_words": [r[0] for r in res],
                    "n_pieces": [r[1] for r in res],
                    "n_chars": [len(t) for t in pdf["text"]],
                    "ids": [r[2] for r in res],
                }
            )

    return cols.mapInPandas(run, schema=_ENCODE_SCHEMA)


def seed_pieces_df(
    docs: DataFrame,
    seed_size: int = 512,
    max_piece_len: int = 8,
    min_count: int = 2,
    max_words: int = MAX_TRAIN_WORDS,
    text_col: str = "text",
) -> DataFrame:
    """Distributed seed-inventory construction — stage 1 of the unigram
    trainer (``_seed_pieces``), fully relational so it carries a DuckDB
    oracle: every substring (length <= ``max_piece_len``) of the capped
    word table, scored ``sum(count * len)``; all single characters kept
    for coverage, plus the top ``seed_size - n_chars`` multi-char pieces
    on the (score DESC, piece ASC) total order.

    Scale shape: the substring explode fans each distinct word into
    O(len x max_piece_len) rows but immediately hash-aggregates to the
    DISTINCT piece space (bounded by the capped word table, not the
    corpus), and the ranking window runs over that aggregated table —
    thousands of rows at any corpus size, so the single-partition window
    is not a bottleneck. Output: (piece, plen, score, is_char).
    """
    wc = (
        word_counts(docs, text_col)
        .where(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), "word")
        .limit(max_words)
    )
    pieces = wc.select(
        F.expr(
            "explode(flatten(transform(sequence(1, length(word)), i ->"
            f" transform(sequence(1, least({int(max_piece_len)},"
            " length(word) - i + 1)), n -> substring(word, i, n)))))"
        ).alias("piece"),
        "cnt",
    )
    scores = pieces.groupBy("piece").agg(
        F.sum(F.col("cnt") * F.length("piece")).cast("bigint").alias("score")
    )
    from pyspark.sql import Window

    n_chars = scores.where(F.length("piece") == 1).agg(
        F.count(F.lit(1)).alias("n_chars")
    )
    ranked = (
        scores.withColumn("plen", F.length("piece").cast("int"))
        .withColumn(
            "rn",
            F.when(F.col("plen") > 1, F.row_number().over(
                Window.partitionBy(F.col("plen") > 1)
                .orderBy(F.desc("score"), "piece")
            )),
        )
        .crossJoin(F.broadcast(n_chars))
    )
    return ranked.where(
        (F.col("plen") == 1)
        | (F.col("rn") <= F.greatest(
            F.lit(int(seed_size)) - F.col("n_chars"), F.lit(0)))
    ).select(
        "piece",
        "plen",
        "score",
        (F.col("plen") == 1).cast("int").alias("is_char"),
    )


def seed_model_df(
    docs: DataFrame,
    seed_size: int = 512,
    max_piece_len: int = 8,
    min_count: int = 2,
    max_words: int = MAX_TRAIN_WORDS,
    text_col: str = "text",
) -> DataFrame:
    """The trainer's EM-initialization model with INTEGER micro-nat
    log-probs: ``lp_un = round((ln(score) - ln(total)) * 1e6)`` over the
    kept seed inventory (``_normalize`` of the seed scores, quantized to
    the repo's fixed-point canon so Viterbi sums are exact integers —
    order-independent on any cluster, and replayable by DuckDB).
    """
    from pyspark.sql import Window

    seed = seed_pieces_df(
        docs, seed_size, max_piece_len, min_count, max_words, text_col
    )
    total = F.sum("score").over(Window.partitionBy())
    return seed.select(
        "piece",
        "plen",
        "score",
        F.round((F.log("score") - F.log(total)) * 1_000_000)
        .cast("bigint")
        .alias("lp_un"),
    )


def _viterbi_pieces_int(
    word: str, lp: dict, max_piece_len: int, unk_un: int
) -> int:
    """Piece COUNT of the best segmentation under integer micro-nat
    weights — the integer-exact core of ``viterbi_segment`` (the j
    tie-break there only picks among equal (score, pieces) states, so
    the count is identical)."""
    n = len(word)
    if n == 0:
        return 0
    best: list = [None] * (n + 1)
    bestp: list[int] = [0] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] is None:
                continue
            w = lp.get(word[j:i])
            if w is None:
                if i - j > 1:
                    continue
                w = unk_un
            cand = best[j] + w
            cp = bestp[j] + 1
            if (
                best[i] is None
                or cand > best[i]
                or (cand == best[i] and cp < bestp[i])
            ):
                best[i] = cand
                bestp[i] = cp
    return bestp[n]


def viterbi_encode_stats(
    docs: DataFrame,
    model: DataFrame,
    max_piece_len: int = 8,
    unk_char_un: int = int(UNK_CHAR_LOGPROB * 1_000_000),
    text_col: str = "text",
) -> DataFrame:
    """Per-source compression report for Viterbi encoding under a
    quantized (integer micro-nat) piece model — ``bpe.encode_stats``'s
    schema, driven by the unigram encoder instead of merge ranks.

    ``model`` is a (piece, lp_un) DataFrame (``seed_model_df``); it is
    collected (bounded by seed_size) and rides the closure like the BPE
    merge table. Integer DP makes the result a pure function of the
    corpus, so the contract query carries a DuckDB oracle (a chained-CTE
    dynamic program over prefix positions).
    """
    lp = {r["piece"]: int(r["lp_un"]) for r in model.select("piece", "lp_un").collect()}
    L = int(max_piece_len)
    unk = int(unk_char_un)

    cols = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}

        def enc(text: str) -> tuple:
            n_pieces = 0
            words = text.split()
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = _viterbi_pieces_int(w, lp, L, unk)
                    cache[w] = got
                n_pieces += got
            return len(words), n_pieces

        for pdf in batches:
            res = [enc(t) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_words": [r[0] for r in res],
                    "n_pieces": [r[1] for r in res],
                    "n_chars": [len(t) for t in pdf["text"]],
                    "ids": [[] for _ in res],
                }
            )

    from binlog_processer_spark.operators.bpe import (
        _ENCODE_SCHEMA,
        encode_stats,
    )

    return encode_stats(cols.mapInPandas(run, schema=_ENCODE_SCHEMA))


def vocab_df(spark, model: UnigramModel) -> DataFrame:
    """Fitted inventory as a DataFrame: (id, piece, logprob in
    milli-nats as bigint — the repo's hash-stable float convention)."""
    rows = [
        (model.vocab[p], p, int(round(model.logprobs[p] * 1000)))
        for p in model.pieces
    ]
    return spark.createDataFrame(
        rows, schema="id int, piece string, logprob_mn bigint"
    ).orderBy("id")
