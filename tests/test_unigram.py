"""Unigram-LM tokenizer (operators/unigram.py): Viterbi segmentation,
EM training determinism, coverage, and the distributed encode path."""

import math

import pytest

from binlog_processer_spark.operators.unigram import (
    UNK_ID,
    UnigramModel,
    encode,
    train_on_counts,
    train_unigram,
    viterbi_segment,
    vocab_df,
)


def test_viterbi_picks_max_probability_segmentation():
    lp = {"a": -3.0, "b": -3.0, "ab": -1.0, "abc": -9.0, "c": -2.0}
    pieces, score = viterbi_segment("abc", lp)
    # ab+c = -3.0 beats a+b+c = -8.0 and abc = -9.0
    assert pieces == ("ab", "c")
    assert score == -3.0


def test_viterbi_tie_prefers_fewer_pieces():
    lp = {"a": -2.0, "aa": -4.0, "aaa": -6.0}
    # aaa (1 piece, -6) ties a+aa (-6), aa+a (-6), a+a+a (-6)
    pieces, score = viterbi_segment("aaa", lp)
    assert score == -6.0
    assert pieces == ("aaa",)


def test_viterbi_unknown_chars_covered_per_char():
    lp = {"a": -1.0}
    pieces, score = viterbi_segment("axa", lp)
    assert pieces == ("a", "x", "a")
    assert score == pytest.approx(-22.0)  # -1 + UNK(-20) + -1


def test_viterbi_empty_word():
    assert viterbi_segment("", {"a": -1.0}) == ((), 0.0)


def test_train_keeps_frequent_multichar_piece_and_normalizes():
    counts = [("abab", 50), ("ab", 30), ("cd", 5)]
    m = train_on_counts(counts, vocab_size=6, seed_size=32)
    assert "ab" in m.vocab  # the dominant bigram survives pruning
    assert {"a", "b", "c", "d"} <= set(m.vocab)  # coverage never pruned
    total = sum(math.exp(v) for v in m.logprobs.values())
    assert total == pytest.approx(1.0, abs=1e-9)
    # whole-word memorization wins where the inventory kept it (one
    # piece always beats two of anything, probs being < 1) ...
    assert m.encode_word("abab") == ("abab",)
    # ... and the sub-piece handles the words the big one can't
    assert m.encode_word("ab") == ("ab",)
    # ab+abab and abab+ab tie on probability; the backpointer tie-break
    # (earliest split survives) pins the first form
    assert m.encode_word("ababab") == ("ab", "abab")


def test_train_is_deterministic():
    counts = [("hello", 9), ("help", 7), ("held", 3), ("lop", 2)]
    a = train_on_counts(counts, vocab_size=12, seed_size=64)
    b = train_on_counts(counts, vocab_size=12, seed_size=64)
    assert a.pieces == b.pieces
    assert a.logprobs == b.logprobs
    assert a.vocab == b.vocab


def test_model_roundtrips_through_dict():
    counts = [("abc", 5), ("abd", 3)]
    m = train_on_counts(counts, vocab_size=8, seed_size=32)
    m2 = UnigramModel.from_dict(m.to_dict())
    assert m2 == m


def test_piece_ids_unknown_maps_to_unk():
    m = train_on_counts([("ab", 5)], vocab_size=4, seed_size=8)
    ids = m.piece_ids(("ab", "zz"))
    assert ids[1] == UNK_ID
    assert ids[0] == m.vocab["ab"]


def test_segmentation_always_reconstructs_word():
    counts = [("tokenizer", 5), ("token", 9), ("size", 4)]
    m = train_on_counts(counts, vocab_size=16, seed_size=128)
    for w in ("tokenizer", "tokens", "windowpane", "x"):
        assert m.decode_pieces(m.encode_word(w)) == w


def test_distributed_encode_matches_driver_and_parallelism(spark):
    rows = [
        (1, "s0", "the token the token stream"),
        (2, "s0", "token stream of the corpus"),
        (3, "s1", "stream the corpus token"),
    ] * 4
    docs = spark.createDataFrame(
        [(i * 10 + j, s, t) for j, (i, s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    m = train_unigram(docs, vocab_size=24, seed_size=128, min_count=1)
    out2 = encode(docs.repartition(2), m).orderBy("doc_id").collect()
    out8 = encode(docs.repartition(8), m).orderBy("doc_id").collect()
    assert [tuple(r) for r in out2] == [tuple(r) for r in out8]
    by_id = {r.doc_id: r for r in out2}
    txt = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for doc_id, r in by_id.items():
        want = []
        for w in txt[doc_id].split():
            want.extend(m.piece_ids(m.encode_word(w)))
        assert list(r.ids) == want
        assert r.n_pieces == len(want)


def test_vocab_df_shape(spark):
    m = train_on_counts([("ab", 5), ("cd", 2)], vocab_size=8, seed_size=16)
    rows = vocab_df(spark, m).collect()
    assert [r.id for r in rows] == list(range(len(m.pieces)))
    for r in rows:
        assert r.logprob_mn == int(round(m.logprobs[r.piece] * 1000))


def test_seed_pieces_df_matches_driver_reference(spark):
    # distributed seed inventory == _seed_pieces over the same word table
    from binlog_processer_spark.operators.bpe import word_counts
    from binlog_processer_spark.operators.unigram import (
        _seed_pieces,
        seed_pieces_df,
    )
    import pyspark.sql.functions as F

    rows = [
        (1, "s0", "the token the token stream"),
        (2, "s0", "token stream of the corpus"),
        (3, "s1", "stream the corpus token xyz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.piece: (r.score, r.is_char)
        for r in seed_pieces_df(docs, seed_size=24, min_count=1).collect()
    }
    wc = [
        (r.word, r.cnt)
        for r in word_counts(docs)
        .orderBy(F.desc("cnt"), "word")
        .collect()
    ]
    want = _seed_pieces(wc, seed_size=24, max_piece_len=8)
    assert set(got) == set(want)
    for p, s in want.items():
        assert got[p] == (s, int(len(p) == 1))


def test_viterbi_pieces_int_matches_float_viterbi_counts():
    # integer micro-nat weights: piece count equals the float Viterbi's
    # when the float model IS the dequantized integers (exact ties keep
    # the same fewer-pieces preference)
    from binlog_processer_spark.operators.unigram import (
        _viterbi_pieces_int,
        viterbi_segment,
    )

    lp_un = {"a": -3_000_000, "b": -3_000_000, "ab": -1_000_000,
             "abc": -9_000_000, "c": -2_000_000}
    lp_f = {k: v / 1_000_000 for k, v in lp_un.items()}
    for w in ("abc", "ababab", "abq", "q", "", "cabba"):
        pieces, _ = viterbi_segment(w, lp_f)
        assert _viterbi_pieces_int(w, lp_un, 8, -20_000_000) == len(pieces)


def test_viterbi_encode_stats_matches_driver_recompute(spark):
    from binlog_processer_spark.operators.unigram import (
        _viterbi_pieces_int,
        seed_model_df,
        viterbi_encode_stats,
    )

    rows = [
        (1, "s0", "the token the token stream"),
        (2, "s0", "token stream of the corpus"),
        (3, "s1", "stream the corpus token"),
        (4, "s1", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    model = seed_model_df(docs, seed_size=32, min_count=1)
    lp = {r.piece: int(r.lp_un) for r in model.collect()}
    got = {r.source: r for r in viterbi_encode_stats(docs, model).collect()}
    stats = {}
    for _, src, t in rows:
        t = t or ""
        d = stats.setdefault(src, [0, 0, 0, 0])
        words = t.split()
        d[0] += 1
        d[1] += len(words)
        d[2] += sum(_viterbi_pieces_int(w, lp, 8, -20_000_000) for w in words)
        d[3] += len(t)
    assert set(got) == set(stats)
    for src, (n_docs, words, pieces, chars) in stats.items():
        r = got[src]
        assert (r.docs, r.words, r.pieces, r.chars) == (
            n_docs, words, pieces, chars,
        )
