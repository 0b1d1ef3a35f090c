"""Distributed BPE tokenizer: train a subword vocabulary on the corpus,
encode the corpus with it — the tokens-axis capability the rest of the
token stack (merge_pair_counts, vocab_stats, surprisal) points at but
never completes.

Algorithm is the public byte-pair-encoding of Sennrich et al. 2016 as
implemented by subword-nmt / HuggingFace tokenizers:

1. **Word-frequency aggregation (distributed).** The ONLY full-corpus
   pass. Whitespace words explode into one hash aggregate; map-side
   partial combine shrinks each task's output to its DISTINCT words
   before the wire, so the shuffle carries at most tasks × word-vocab
   rows — at 100 TB the word vocabulary is millions of rows, not
   trillions. This is exactly how production BPE trainers scale: they
   never iterate the raw corpus, only the compact ``(word, count)``
   table.
2. **Merge learning (driver, over the compact table).** The word table
   is capped (``min_count`` filter + ``max_words`` TakeOrderedAndProject
   head on the total order ``cnt DESC, word``) and collected — a BOUNDED
   driver collect, ≤ ``max_words`` rows by construction, same posture as
   mix.py's strata collect. The merge loop maintains pair statistics
   incrementally (subword-nmt's index trick): each merge touches only
   the words that contain the merged pair, so learning V merges over W
   words costs O(V·affected), not O(V·W).
3. **Encode (distributed).** Merge ranks broadcast to every executor;
   ``mapInPandas`` re-derives each document's pieces with a
   per-partition word→ids cache. Word frequencies are Zipfian, so the
   cache hit rate approaches 1 and the steady-state cost is a dict
   lookup per word. (The alternative for adversarially high-cardinality
   corpora — encode DISTINCT words once, join the mapping back — trades
   the cache for a corpus-wide re-assembly shuffle; documented, not
   default.)

Ties in the argmax are broken deterministically (highest count, then
lexicographically smallest pair) so the learned vocabulary is a pure
function of the corpus — the same property every oracle-gated query in
this repo relies on. The merge loop is pure integer arithmetic over the
capped word table, so the contract queries carry full DuckDB oracles
(a generated chained-CTE replay of the loop — ``_bpe_merges_oracle`` in
``__spark_entry__``); tests/test_bpe.py's from-scratch reference pins
the semantics a second way.

Reference parity: the reference engine (binlog-processer) has no
tokenizer; this module is part of the LLM-training-pipeline surface the
build brief mandates alongside SURVEY.md §2.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EOW = "</w>"
UNK_ID = -1
MAX_TRAIN_WORDS = 65536  # driver-collect bound; ~a few MB of strings


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` over whitespace words — the one full-corpus pass.

    One explode + one hash aggregate; partial (map-side) combine makes
    the shuffle carry distinct words per task, not token positions.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(words).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _symbols(word: str) -> tuple[str, ...]:
    """subword-nmt initial segmentation: chars, end-of-word marker fused
    onto the last char so decode is ``concat → strip EOW``."""
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Apply one merge rule left-to-right (non-overlapping)."""
    a, b = pair
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_on_counts(
    counts: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, int]]:
    """Greedy BPE merge learning over a ``(word, count)`` table.

    Returns ``[(left, right, pair_count_at_merge_time), ...]`` in rank
    order. Pair statistics are maintained incrementally with a
    pair→word-ids index (subword-nmt's trick): merging a pair rescans
    only the words that contain it. Stale index entries (a word that no
    longer contains an indexed pair after later merges) are skipped by
    the no-op check; the statistics themselves stay exact because every
    rescanned word's pair contributions are fully retracted and
    re-added. Ties break on (count DESC, pair ASC) — deterministic.
    """
    words: list[tuple[str, ...]] = []
    freqs: list[int] = []
    for w, c in counts:
        if not w:
            continue
        words.append(_symbols(w))
        freqs.append(int(c))

    stats: Counter = Counter()
    index: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (syms, f) in enumerate(zip(words, freqs)):
        for p in zip(syms, syms[1:]):
            stats[p] += f
            index[p].add(i)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_cnt = 0
        for p, c in stats.items():
            if c > best_cnt or (c == best_cnt and best is not None and p < best):
                best, best_cnt = p, c
        if best is None or best_cnt < 1:
            break
        merges.append((best[0], best[1], best_cnt))
        for i in sorted(index[best]):
            syms = words[i]
            new = _merge_word(syms, best)
            if new == syms:  # stale index entry
                continue
            f = freqs[i]
            for p in zip(syms, syms[1:]):
                stats[p] -= f
            for p in zip(new, new[1:]):
                stats[p] += f
                index[p].add(i)
            words[i] = new
        del stats[best]
        del index[best]
    return merges


@dataclass(frozen=True)
class BpeModel:
    """Learned merges + vocabulary. ``vocab`` ids: alphabet symbols in
    sorted order first, then merge products in rank order (first
    occurrence wins when two merges produce the same string)."""

    merges: tuple[tuple[str, str], ...]
    vocab: dict  # piece -> id

    @property
    def ranks(self) -> dict:
        # built once per model (lazy, cached around the frozen dataclass):
        # encode_word consults it per merge step, and rebuilding an
        # n-merge dict on every cache-miss word would dominate encode
        # cost for production-sized (30k+) vocabularies
        cached = self.__dict__.get("_ranks")
        if cached is None:
            cached = {p: r for r, p in enumerate(self.merges)}
            object.__setattr__(self, "_ranks", cached)
        return cached

    def encode_word(self, word: str) -> tuple[str, ...]:
        """Standard rank-greedy BPE encode: repeatedly merge the
        lowest-rank adjacent pair until none is mergeable."""
        if not word:
            return ()
        syms = _symbols(word)
        ranks = self.ranks
        while len(syms) > 1:
            pairs = set(zip(syms, syms[1:]))
            cand = min(
                (p for p in pairs if p in ranks),
                key=lambda p: ranks[p],
                default=None,
            )
            if cand is None:
                break
            syms = _merge_word(syms, cand)
        return syms

    def piece_ids(self, pieces: Iterable[str]) -> list[int]:
        v = self.vocab
        return [v.get(p, UNK_ID) for p in pieces]

    def decode_pieces(self, pieces: Iterable[str]) -> str:
        return "".join(pieces).replace(EOW, " ").rstrip()

    def to_dict(self) -> dict:
        return {
            "merges": [list(m) for m in self.merges],
            "vocab": dict(self.vocab),
        }

    @staticmethod
    def from_dict(d: dict) -> "BpeModel":
        return BpeModel(
            merges=tuple((a, b) for a, b in d["merges"]),
            vocab=dict(d["vocab"]),
        )


def train_bpe(
    docs: DataFrame,
    num_merges: int = 256,
    min_count: int = 2,
    max_words: int = MAX_TRAIN_WORDS,
    text_col: str = "text",
) -> tuple[BpeModel, list[tuple[str, str, int]]]:
    """Distributed word-count pass, bounded collect, driver merge loop.

    The collect is ≤ ``max_words`` rows by construction (cnt DESC, word
    total order, so the cut is deterministic under ties and keeps the
    highest-frequency words — the ones that matter for merge counts).
    """
    wc = (
        word_counts(docs, text_col)
        .where(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), "word")
        .limit(max_words)  # TakeOrderedAndProject: bounded driver collect
    )
    rows = [(r["word"], r["cnt"]) for r in wc.collect()]
    merges = train_on_counts(rows, num_merges)

    alphabet: set[str] = set()
    for w, _ in rows:
        alphabet.update(_symbols(w))
    vocab: dict[str, int] = {}
    for s in sorted(alphabet):
        vocab[s] = len(vocab)
    for a, b, _ in merges:
        piece = a + b
        if piece not in vocab:
            vocab[piece] = len(vocab)
    model = BpeModel(
        merges=tuple((a, b) for a, b, _ in merges), vocab=vocab
    )
    return model, merges


_ENCODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_words", IntegerType()),
        StructField("n_pieces", IntegerType()),
        StructField("n_chars", IntegerType()),
        StructField("ids", ArrayType(IntegerType())),
    ]
)


def encode(
    docs: DataFrame, model: BpeModel, text_col: str = "text"
) -> DataFrame:
    """Encode every document with the learned vocabulary.

    The model rides the closure (Spark broadcasts task binaries once per
    executor); each partition keeps a word→ids cache, so the per-word
    cost after warmup is one dict hit — the right shape for a Zipfian
    corpus. Output is one row per document with the piece-id array and
    the count columns the compression report needs.
    """
    model_dict = model.to_dict()
    cols = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = BpeModel.from_dict(model_dict)
        cache: dict[str, list[int]] = {}

        def enc(text: str) -> tuple[int, int, list[int]]:
            ids: list[int] = []
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


def encode_stats(encoded: DataFrame) -> DataFrame:
    """Per-source compression report over ``encode()`` output — one hash
    aggregate, integer ppm ratios (hash-stable convention)."""
    return (
        encoded.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("n_words").cast("bigint").alias("words"),
            F.sum("n_pieces").cast("bigint").alias("pieces"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .select(
            "source",
            "docs",
            "words",
            "pieces",
            "chars",
            F.floor(F.col("pieces") * 1_000_000 / F.col("words"))
            .cast("bigint")
            .alias("pieces_per_word_ppm"),
            F.floor(F.col("chars") * 1_000_000 / F.col("pieces"))
            .cast("bigint")
            .alias("chars_per_piece_ppm"),
        )
        .orderBy("source")
    )


def merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Learned merge table as a DataFrame (rank, left, right, freq)."""
    return spark.createDataFrame(
        [(r, a, b, c) for r, (a, b, c) in enumerate(merges)],
        schema="rank int, left string, right string, freq bigint",
    ).orderBy("rank")
