"""spark-submit entry point for an end-to-end training-data release.

The whole tokens-axis curation pipeline as ONE job — what a data team
runs to turn a raw document corpus into trainer-ready shards:

  1. hygiene gates  — encoding QA verdict + quality-filter funnel
  2. dedup          — MinHash-LSH pairs → connected components → keep
                      one representative per cluster
  3. mix            — closed-form rebalance to target token shares,
                      applied with the deterministic md5 sampler
  4. pack           — fixed-budget sequence packing, materialized token
                      arrays (single payload shuffle) + boundary masks
  5. manifest       — per-shard export manifest for loader verification

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_release.py \
        --docs /path/to/documents.parquet --output /path/to/release_wh \
        [--targets src0=0.5,src1=0.3,src2=0.2] [--max-tokens 2048] \
        [--pack-shards 4]

Every stage's output is a snapshot table under --output (``kept``,
``mix_report``, ``packed``, ``boundaries``, ``shard_manifest``), so any
stage can be audited or resumed from; one JSON summary line at the end.
Token arrays are synthesized from text with the corpus module's
deterministic hash tokenizer when the input carries no ``tokens``
column (the 10^12-row production input is already pre-tokenized).
With ``--bpe-merges N`` the job instead trains a real BPE vocabulary
on the kept corpus (operators/bpe.py) and packs learned subword ids,
writing ``<output>/vocab.json`` for the loader.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binlog_processer_spark.corpus import _DIALECTS, tokens_expr
from binlog_processer_spark.functions.text import (
    apply_filter_funnel,
    encoding_qa,
)
from binlog_processer_spark.operators._cache import unpin_all
from binlog_processer_spark.operators.dedup import (
    connected_components,
    keep_representatives,
    minhash_lsh_pairs,
)
from binlog_processer_spark.operators.mix import (
    materialize_packed,
    pack_sequences,
    rebalance_report,
    sequence_boundaries,
    shard_manifest,
    stratified_sample,
)
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def _parse_targets(spec: str | None) -> dict[str, float] | None:
    if not spec:
        return None
    out = {}
    for part in spec.split(","):
        k, v = part.split("=")
        out[k.strip()] = float(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--targets", help="source=share[,source=share...]")
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument(
        "--bpe-merges",
        type=int,
        default=0,
        help="train a BPE vocabulary of this many merges on the kept "
        "corpus and tokenize with it (writes <output>/vocab.json; "
        "unseen characters encode as UNK id -1). Default 0: pass "
        "through a pre-tokenized column / the deterministic hash "
        "tokenizer",
    )
    ap.add_argument(
        "--sketch",
        action="store_true",
        help="add per-source distinct-token cardinality to the summary "
        "via the KMV/HLL sketches (estimates only — the release job "
        "never pays an exact-distinct shuffle for a report line)",
    )
    ap.add_argument("--pack-shards", type=int, default=4)
    ap.add_argument("--export-shards", type=int, default=16)
    ap.add_argument(
        "--tag",
        help="tag every output table's committed snapshot with this name "
        "(Iceberg-style ref): tagged releases survive snapshot expiry and "
        "stay readable via SnapshotTable.read(spark, snapshot='<tag>')",
    )
    args = ap.parse_args()

    spark = get_spark("binlog-release")
    docs = spark.read.parquet(args.docs)
    n_in = docs.count()

    # 1. hygiene gates: encoding verdict (tiny per-doc report joined
    # back) + the funnel's codegen keep filter
    enc_ok = encoding_qa(docs).filter("ok").select("doc_id")
    eligible = apply_filter_funnel(docs).join(enc_ok, "doc_id")
    n_eligible = eligible.count()

    # 2. dedup on the eligible corpus
    pairs = minhash_lsh_pairs(eligible)
    comp = connected_components(pairs)
    kept = keep_representatives(
        eligible.select("doc_id", "source"), comp
    ).join(eligible, ["doc_id", "source"])

    # tokens: a learned BPE vocabulary when asked for, else pass through
    # a pre-tokenized column, else synthesize with the deterministic
    # hash tokenizer (same expression family as the corpus generator)
    bpe_info = None
    if args.bpe_merges > 0:
        from binlog_processer_spark.operators.bpe import encode, train_bpe

        model, _ = train_bpe(
            kept, num_merges=args.bpe_merges, min_count=1
        )
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "vocab.json"), "w") as f:
            json.dump(model.to_dict(), f)
        # encode() carries doc_id/source through, so no join back: the
        # packed shards downstream need exactly (doc_id, source, tokens,
        # n_tok) and get real subword ids instead of surrogate hashes
        kept = encode(kept, model).select(
            "doc_id",
            "source",
            F.col("ids").alias("tokens"),
            F.col("n_pieces").cast("bigint").alias("n_tok"),
        )
        bpe_info = {
            "merges": len(model.merges),
            "vocab_size": len(model.vocab),
        }
    else:
        if "tokens" not in kept.columns:
            kept = kept.withColumn(
                "tokens", F.expr(tokens_expr("text", _DIALECTS["spark"]))
            )
        kept = kept.withColumn("n_tok", F.size("tokens").cast("bigint"))
    kept = kept.persist()
    kept_t = SnapshotTable(os.path.join(args.output, "kept"))
    kept_t.write(kept.select("doc_id", "source", "tokens", "n_tok"))
    n_kept = kept.count()

    # 3. mix: report + applied rates (rates are n_sources scalars — the
    # one intentionally driver-sized hop)
    targets = _parse_targets(args.targets)
    if targets:
        report = rebalance_report(kept, targets)
        SnapshotTable(os.path.join(args.output, "mix_report")).write(report)
        rates = {
            r[0]: r.rate_bp / 10000.0
            for r in report.select(F.col("source"), F.col("rate_bp")).collect()
        }
        mixed = stratified_sample(kept, rates, default_rate=0.0)
    else:
        mixed = kept

    # 4. pack + materialize + boundaries
    packed = materialize_packed(
        mixed, args.max_tokens, shards=args.pack_shards
    )
    SnapshotTable(os.path.join(args.output, "packed")).write(packed)
    bounds = sequence_boundaries(
        pack_sequences(
            mixed, args.max_tokens, shards=args.pack_shards,
        ),
        args.max_tokens,
    )
    SnapshotTable(os.path.join(args.output, "boundaries")).write(bounds)

    # 5. export manifest over the mixed docs
    man = shard_manifest(
        mixed.withColumn("n_chars", F.col("n_tok")),
        n_shards=args.export_shards,
        size_col="n_chars",
    )
    SnapshotTable(os.path.join(args.output, "shard_manifest")).write(man)

    packed_rd = SnapshotTable(os.path.join(args.output, "packed")).read(spark)
    summary = {
        "docs_in": n_in,
        "eligible": n_eligible,
        "kept_after_dedup": n_kept,
        "mixed_docs": mixed.count(),
        "sequences": packed_rd.count(),
        "tokens_total": (packed_rd.agg(F.sum("n_tok")).collect()[0][0] or 0),
        "pack_shards": args.pack_shards,
        "export_shards": args.export_shards,
    }
    if bpe_info:
        summary["bpe"] = bpe_info
    if args.sketch:
        # estimate-only (with_exact=False): the whole pass is one
        # zero-shuffle KMV candidate scan + one register fold over the
        # packed payload — a report line, not a shuffle
        from binlog_processer_spark.operators.sketch import (
            hll_distinct,
            kmv_distinct,
        )

        kmv = {
            r["source"]: int(r["est_distinct"])
            for r in kmv_distinct(
                packed_rd, k=256, with_exact=False
            ).collect()
        }
        hll = {
            r["source"]: int(r["est_distinct"])
            for r in hll_distinct(
                packed_rd, b=10, with_exact=False
            ).collect()
        }
        summary["distinct_tokens_kmv"] = kmv
        summary["distinct_tokens_hll"] = hll
    if args.tag:
        tagged = []
        for name in ("kept", "mix_report", "packed", "boundaries",
                     "shard_manifest"):
            t = SnapshotTable(os.path.join(args.output, name))
            if t.current_snapshot() is not None:
                t.tag(args.tag)
                tagged.append(name)
        summary["tagged"] = tagged
        summary["tag"] = args.tag
    kept.unpersist()
    unpin_all()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
