"""spark-submit entry point for corpus quality assurance.

The pre-training-data QA gate: one job that publishes the hygiene
reports every corpus release ships with — encoding sanity (mojibake /
control chars), PII redaction counts, the quality-filter funnel, a
per-column profile + id-uniqueness summary, and (optionally)
embedding-column health — each as a snapshot table, plus a
per-document verdict table and a one-line JSON summary.

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_qa.py \
        --docs /path/to/documents.parquet --output /path/to/qa_wh \
        [--embeddings /path/to/embeddings.parquet] [--inject-noise]

Every report is a map-only scan of the corpus (codegen projections, no
UDFs, no shuffles); the verdict table joins the three per-doc REPORTS
(each doc_id + a few ints — tiny next to the corpus text) rather than
re-reading text. ``--inject-noise`` plants the same deterministic
corruption the contract queries use (U+FFFD/control tails, doc_id-derived
PII) so a smoke run exercises every gate on a clean corpus.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binlog_processer_spark.functions.text import (
    apply_filter_funnel,
    encoding_qa,
    filter_funnel,
    pii_scrub,
)
from binlog_processer_spark.operators.profile import (
    key_uniqueness,
    profile_columns,
)
from binlog_processer_spark.operators.similarity import embedding_qa
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def _inject(docs):
    """Deterministic corruption for smoke runs: decode tombstones on
    doc_id%6, a PII tail on doc_id%4 (mirrors the contract queries)."""
    noise = (
        F.when(F.col("doc_id") % 6 == 0, F.lit(" ��x\x01"))
        .when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com via 10.0.0."),
                (F.col("doc_id") % 250).cast("string"),
            ),
        )
        .otherwise(F.lit(""))
    )
    return docs.withColumn(
        "text", F.concat(F.coalesce(F.col("text"), F.lit("")), noise)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="QA warehouse dir")
    ap.add_argument("--embeddings", help="optional embeddings parquet path")
    ap.add_argument(
        "--contract", metavar="RULES_JSON",
        help="JSON file with a rule list for the declarative contract "
        "(operators/profile.expectations spec); default: unique doc_id, "
        "non-null doc_id/text, n_chars >= 0",
    )
    ap.add_argument(
        "--distill",
        action="store_true",
        help="train the logistic-regression quality model on the rule "
        "verdicts (operators/classifier.py) and publish model scores + "
        "rule/model agreement — the learned gate that replaces the rule "
        "cascade where only a cheap score can run",
    )
    ap.add_argument(
        "--inject-noise",
        action="store_true",
        help="plant deterministic mojibake/PII so every gate is exercised",
    )
    ap.add_argument(
        "--k-anonymity",
        type=int,
        default=5,
        metavar="K",
        help="k bar for the quasi-identifier anonymity audit (default 5)",
    )
    args = ap.parse_args()

    spark = get_spark("binlog-qa")
    docs = spark.read.parquet(args.docs)
    if args.inject_noise:
        docs = _inject(docs)

    enc_t = SnapshotTable(os.path.join(args.output, "encoding"))
    pii_t = SnapshotTable(os.path.join(args.output, "pii"))
    funnel_t = SnapshotTable(os.path.join(args.output, "funnel"))
    verdict_t = SnapshotTable(os.path.join(args.output, "doc_qa"))

    enc_t.write(encoding_qa(docs), mode="overwrite")
    pii_full = pii_scrub(docs, include_text=True)
    pii_t.write(pii_full.drop("clean_text"), mode="overwrite")
    # the redaction itself, for every flagged doc — the artifact a release
    # swaps in for the original text (counts alone can't scrub anything)
    red_t = SnapshotTable(os.path.join(args.output, "redacted"))
    red_t.write(
        pii_full.filter(
            (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
        ).select("doc_id", "clean_text"),
        mode="overwrite",
    )
    funnel_t.write(filter_funnel(docs), mode="overwrite")

    enc = enc_t.read(spark)
    pii = pii_t.read(spark)
    kept = apply_filter_funnel(docs).select(
        "doc_id", F.lit(True).alias("funnel_keep")
    )
    verdict = (
        enc.select("doc_id", F.col("ok").alias("encoding_ok"))
        .join(
            pii.select(
                "doc_id",
                (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
                .alias("pii_hits"),
            ),
            "doc_id",
        )
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "encoding_ok",
            "pii_hits",
            F.coalesce("funnel_keep", F.lit(False)).alias("funnel_keep"),
            # PII hits do NOT fail a doc: the redacted table carries its
            # scrubbed text, so it ships redacted rather than dropped
            (
                F.col("encoding_ok")
                & F.coalesce("funnel_keep", F.lit(False))
            ).alias("qa_pass"),
        )
    )
    verdict_t.write(verdict, mode="overwrite")
    verdict = verdict_t.read(spark)

    out = {
        "docs_in": docs.count(),
        "encoding_bad": verdict.filter(~F.col("encoding_ok")).count(),
        "pii_docs": verdict.filter(F.col("pii_hits") > 0).count(),
        "redacted_rows": red_t.read(spark).count(),
        "funnel_kept": verdict.filter(F.col("funnel_keep")).count(),
        "qa_pass": verdict.filter(F.col("qa_pass")).count(),
    }

    # column-level profile + id-uniqueness — the Deequ-style summary a
    # release publishes next to the hygiene gates (operators/profile.py)
    prof_cols = [
        c for c in ("doc_id", "source", "lang", "n_chars") if c in docs.columns
    ]
    prof_t = SnapshotTable(os.path.join(args.output, "profile"))
    prof_t.write(profile_columns(docs, prof_cols), mode="overwrite")
    out["profile_cols"] = len(prof_cols)
    out["id_dup_rows"] = int(
        key_uniqueness(docs, ["doc_id"]).collect()[0]["dup_rows"]
    )

    # declarative contract on the drop (operators/profile.expectations):
    # every row-level rule rides the profile's scan-count posture — one
    # aggregate however many rules; published as its own table so a
    # failed run leaves the evidence queryable
    from binlog_processer_spark.operators.profile import expectations

    if args.contract:
        with open(args.contract) as fh:
            rules = json.load(fh)
    else:
        rules = [{"rule": "unique", "columns": ["doc_id"]}]
        for c in ("doc_id", "text"):
            if c in docs.columns:
                rules.append({"rule": "not_null", "column": c})
        if "n_chars" in docs.columns:
            rules.append({"rule": "in_range", "column": "n_chars", "lo": 0})
    contract_t = SnapshotTable(os.path.join(args.output, "contract"))
    contract_t.write(expectations(docs, rules), mode="overwrite")
    out["contract_failed"] = contract_t.read(spark).filter(
        ~F.col("passed")
    ).count()
    if args.embeddings:
        emb_t = SnapshotTable(os.path.join(args.output, "embedding_qa"))
        emb_t.write(
            embedding_qa(spark.read.parquet(args.embeddings)),
            mode="overwrite",
        )
        eq = emb_t.read(spark)
        out["vectors_in"] = eq.count()
        out["vectors_unusable"] = eq.filter(~F.col("usable")).count()

    # k-anonymity over the release's quasi-identifiers (source, lang,
    # length decile): the re-identification risk number a privacy review
    # asks for AFTER scrubbing — scrubbed text can still isolate
    # near-singleton (source, lang, length) cells (operators/privacy.py)
    from binlog_processer_spark.operators.privacy import k_anonymity_report

    qid_docs = docs.withColumn(
        "len_bucket",
        F.least(
            F.floor(F.coalesce(F.col("n_chars"), F.length("text")) / 100),
            F.lit(9),
        ).cast("int"),
    )
    priv_t = SnapshotTable(os.path.join(args.output, "k_anonymity"))
    priv_t.write(
        k_anonymity_report(
            qid_docs,
            k=args.k_anonymity,
            qids=("source", "lang", "len_bucket"),
            group_col="source",
        ),
        mode="overwrite",
    )
    priv = priv_t.read(spark)
    out["kanon_worst_risk_ppm"] = int(
        priv.agg(F.max("risk_ppm")).collect()[0][0] or 0
    )
    out["kanon_rows_below_k"] = int(
        priv.agg(F.sum("rows_below_k")).collect()[0][0] or 0
    )

    if args.distill:
        # self-distillation: learn the rule cascade's verdict as a model
        # so downstream consumers that can only afford one cheap score
        # (zero-shuffle literal-weight projection) approximate the full
        # gate; agreement_ppm is the monitoring number — a drop means
        # the corpus drifted away from what the rules were written for
        from binlog_processer_spark.operators.classifier import (
            hash_features,
            score,
            train_logreg,
        )

        k = 128
        labeled = hash_features(docs, k).join(
            verdict.select(
                "doc_id", F.col("qa_pass").cast("int").alias("y")
            ),
            "doc_id",
        )
        w, history = train_logreg(labeled, k=k, n_iters=25)
        scores = score(hash_features(docs, k), w)
        SnapshotTable(os.path.join(args.output, "model_scores")).write(
            scores, mode="overwrite"
        )
        judged = scores.join(
            verdict.select("doc_id", "qa_pass"), "doc_id"
        )
        agree = judged.filter(
            ((F.col("prob_bp") >= 5000) & F.col("qa_pass"))
            | ((F.col("prob_bp") < 5000) & ~F.col("qa_pass"))
        ).count()
        out["distill_agreement_ppm"] = int(
            agree * 1_000_000 / max(out["docs_in"], 1)
        )
        out["distill_final_loss_ppm"] = history[-1]["loss_ppm"]

    print(json.dumps(out))
    # release anything an operator pinned (filter_funnel etc. persist
    # intermediates); a long QA session must not accumulate cached plans
    from binlog_processer_spark.operators._cache import unpin_all

    unpin_all()
    spark.stop()


if __name__ == "__main__":
    main()
