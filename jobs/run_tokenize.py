"""spark-submit entry point for subword tokenizer training + encode.

The thirteenth CLI: learns a subword vocabulary from the corpus (one
distributed word-count pass, driver loop over the compact word table),
encodes every document with the broadcast model, and writes the
artifacts a training pipeline hands to the data loader. ``--algo``
selects the trainer: ``bpe`` (greedy merge-up, operators/bpe.py,
default) or ``unigram`` (EM prune-down Viterbi LM,
operators/unigram.py) — same word-count pass, same encoded schema, so
the two are drop-in comparable.

- ``<output>/vocab.json``        — model dict (algo-tagged)
- ``<output>/encoded``           — snapshot table: doc_id, source,
                                   n_words, n_pieces, n_chars, ids
- stdout                         — one JSON summary line (per-source
                                   compression, vocab size, merge count)

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_tokenize.py \
        --docs /root/testdata/sf0.01/documents.parquet \
        [--output /tmp/tok_wh] [--num-merges 256] [--min-count 2] \
        [--max-words 65536]

Without --output nothing is written; the job just trains and prints the
report (a dry-run of the vocabulary before committing to a tokenization
of 100 TB). With ``--vocab <vocab.json>`` the job skips training and
encodes with the frozen vocabulary — the daily-ingest shape: ids stay
stable across batches.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_processer_spark.operators._cache import unpin_all
from binlog_processer_spark.operators.bpe import (
    encode,
    encode_stats,
    train_bpe,
)
from binlog_processer_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--output", help="artifact dir (omit for dry-run)")
    ap.add_argument(
        "--vocab",
        help="apply-only mode: load this vocab.json (from a previous "
        "run's --output) and encode --docs with the FROZEN vocabulary "
        "instead of training — the daily-ingest shape: one training "
        "run, then stable ids for every later batch",
    )
    ap.add_argument(
        "--algo", choices=("bpe", "unigram"), default="bpe",
        help="trainer: greedy merge-up BPE or EM prune-down unigram LM",
    )
    ap.add_argument("--num-merges", type=int, default=256)
    ap.add_argument(
        "--vocab-size", type=int, default=512,
        help="unigram only: target piece-inventory size",
    )
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--max-words", type=int, default=65536)
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    spark = get_spark("run_tokenize")
    docs = spark.read.parquet(args.docs)

    if args.vocab:
        with open(args.vocab) as f:
            d = json.load(f)
        if d.get("algo") == "unigram" or "logprobs" in d:
            from binlog_processer_spark.operators.unigram import (
                UnigramModel,
            )

            args.algo = "unigram"
            model = UnigramModel.from_dict(d)
            merges = []
        else:
            from binlog_processer_spark.operators.bpe import BpeModel

            args.algo = "bpe"
            model = BpeModel.from_dict(d)
            merges = list(model.merges)
    elif args.algo == "unigram":
        from binlog_processer_spark.operators.unigram import (
            train_unigram,
        )

        model = train_unigram(
            docs,
            vocab_size=args.vocab_size,
            min_count=args.min_count,
            max_words=args.max_words,
            text_col=args.text_col,
        )
        merges = []
    else:
        model, merges = train_bpe(
            docs,
            num_merges=args.num_merges,
            min_count=args.min_count,
            max_words=args.max_words,
            text_col=args.text_col,
        )
    if args.algo == "unigram":
        from binlog_processer_spark.operators.unigram import (
            encode as _enc,
        )
    else:
        _enc = encode
    encoded = _enc(docs, model, text_col=args.text_col)
    stats = [r.asDict() for r in encode_stats(encoded).collect()]

    out = {
        "algo": args.algo,
        "merges_learned": len(merges),
        "vocab_size": len(model.vocab),
        "trained": not args.vocab,
        "per_source": stats,
        "written": False,
    }

    if args.output:
        from binlog_processer_spark.storage.table import SnapshotTable

        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "vocab.json"), "w") as f:
            json.dump({"algo": args.algo, **model.to_dict()}, f)
        t = SnapshotTable(os.path.join(args.output, "encoded"))
        t.write(_enc(docs, model, text_col=args.text_col))
        out["written"] = True
        out["encoded_rows"] = t.read(spark).count()

    unpin_all()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
