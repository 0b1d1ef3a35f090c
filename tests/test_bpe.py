"""BPE trainer/encoder: exact-equality pin against a from-scratch
reference implementation (the trainer is iterative, hence deliberately
rows-only in the oracle contract — this file is its correctness gate)."""

from __future__ import annotations

from collections import Counter

import pytest

from binlog_processer_spark.operators.bpe import (
    EOW,
    BpeModel,
    _merge_word,
    _symbols,
    encode,
    encode_stats,
    train_bpe,
    train_on_counts,
    word_counts,
)


def _reference_train(counts, num_merges):
    """Naive reference: recount every pair from scratch each round.
    Same tie-break (count DESC, pair ASC). Deliberately shares no code
    with the production incremental trainer beyond _symbols/_merge_word
    semantics, which are re-stated inline here."""
    words = {}
    for w, c in counts:
        syms = tuple(w[:-1]) + (w[-1] + EOW,)
        words[syms] = words.get(syms, 0) + int(c)
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for syms, f in words.items():
            for p in zip(syms, syms[1:]):
                stats[p] += f
        live = [(c, p) for p, c in stats.items() if c >= 1]
        if not live:
            break
        best_cnt = max(c for c, _ in live)
        best = min(p for c, p in live if c == best_cnt)
        merges.append((best[0], best[1], best_cnt))
        new_words = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + f
        words = new_words
    return merges


COUNTS = [
    ("lower", 5),
    ("lowest", 2),
    ("newer", 6),
    ("wider", 3),
    ("new", 2),
    ("low", 7),
    ("widest", 1),
    ("renew", 4),
]


def test_trainer_matches_reference_implementation():
    got = train_on_counts(COUNTS, 40)
    want = _reference_train(COUNTS, 40)
    assert got == want
    assert len(got) > 10  # the corpus supports a real merge sequence


def test_trainer_tie_break_is_lexicographic():
    # "ab" and "cd" both appear exactly twice; the smaller pair wins.
    merges = train_on_counts([("ab", 2), ("cd", 2)], 1)
    assert merges[0][:2] == ("a", "b" + EOW)


def test_merge_word_left_to_right_non_overlapping():
    assert _merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")


def test_encode_word_reproduces_training_segmentation():
    merges = train_on_counts(COUNTS, 40)
    model = BpeModel(
        merges=tuple((a, b) for a, b, _ in merges),
        vocab={},
    )
    # Classic BPE property: rank-greedy encoding of a training word lands
    # on the trainer's final segmentation for that word. Verify via the
    # reference: replay the merges over each word.
    for w, _ in COUNTS:
        syms = _symbols(w)
        for a, b, _ in merges:
            syms = _merge_word(syms, (a, b))
        assert model.encode_word(w) == syms


def test_encode_decode_roundtrip():
    merges = train_on_counts(COUNTS, 20)
    model = BpeModel(
        merges=tuple((a, b) for a, b, _ in merges), vocab={}
    )
    for w, _ in COUNTS + [("unseenword", 1)]:
        pieces = model.encode_word(w)
        assert model.decode_pieces(pieces) == w


def test_model_dict_roundtrip():
    merges = train_on_counts(COUNTS, 10)
    vocab = {"a": 0, "b": 1}
    m = BpeModel(tuple((a, b) for a, b, _ in merges), vocab)
    m2 = BpeModel.from_dict(m.to_dict())
    assert m2.merges == m.merges and m2.vocab == m.vocab


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "low low lower lowest", "srcA"),
        (1, "new newer newest renew", "srcA"),
        (2, "wide wider widest", "srcB"),
        (3, None, "srcB"),
        (4, "   ", "srcB"),
        (5, "low newer low", "srcB"),
    ]
    return spark.createDataFrame(
        rows, schema="doc_id long, text string, source string"
    )


def test_word_counts_single_aggregate(docs):
    wc = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert wc["low"] == 4 and wc["newer"] == 2 and "" not in wc
    plan = word_counts(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shuffle: the hash aggregate


def test_train_encode_stats_end_to_end(spark, docs):
    model, merges = train_bpe(docs, num_merges=30, min_count=1)
    assert merges and all(len(m) == 3 for m in merges)
    # vocab ids are dense and unique
    ids = sorted(model.vocab.values())
    assert ids == list(range(len(ids)))

    enc = encode(docs, model)
    out = {r["doc_id"]: r for r in enc.collect()}
    assert out[3]["n_words"] == 0 and out[3]["ids"] == []
    r0 = out[0]
    assert r0["n_words"] == 4
    assert r0["n_pieces"] == len(r0["ids"]) >= 4
    # every id resolves (training covered the corpus at min_count=1)
    rev = {v: k for k, v in model.vocab.items()}
    pieces = [rev[i] for i in r0["ids"]]
    assert model.decode_pieces(pieces) == "low low lower lowest"

    stats = {r["source"]: r for r in encode_stats(enc).collect()}
    assert stats["srcA"]["docs"] == 2 and stats["srcB"]["docs"] == 4
    assert stats["srcA"]["pieces_per_word_ppm"] >= 1_000_000


def test_encode_unknown_word_gets_unk_ids(spark, docs):
    model, _ = train_bpe(docs, num_merges=5, min_count=1)
    tiny = spark.createDataFrame(
        [(9, "zzzqqq", "srcC")], schema="doc_id long, text string, source string"
    )
    row = encode(tiny, model).collect()[0]
    # chars unseen in training fall back to UNK (-1), never crash
    assert row["n_pieces"] == len(row["ids"]) > 0
    assert all(i == -1 for i in row["ids"])
