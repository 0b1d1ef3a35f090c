"""Distributed logistic regression: from-scratch fixed-point reference
agreement (EXACT — the 1e-9 weight grid / 1e-7 error grain makes
training a pure function of the corpus), linearly-separable
learnability with a holdout, zero-shuffle scoring plan."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.operators.classifier import (
    ERR_SCALE,
    W_SCALE,
    hash_features,
    hash_idx,
    quality_classifier_report,
    score,
    sigmoid,
    train_logreg,
)

K = 32


def _docs():
    """120 docs: label 1 iff 'shiny' present — linearly separable, with
    shared noise words on both sides."""
    rows = []
    for i in range(120):
        noise = " ".join(f"w{(i * 7 + j) % 11}" for j in range(6))
        if i % 2:
            rows.append((i, f"shiny quality {noise}", f"s{i % 3}", 1))
        else:
            rows.append((i, f"dull junk {noise}", f"s{i % 3}", 0))
    return rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        _docs(), schema="doc_id long, text string, source string, y int"
    )


def _idxs(text, k=K):
    ix = [
        int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % k
        for w in text.split()
        if w
    ]
    return ix + [k]  # bias index


def _rha(x):
    a = math.floor(abs(x))
    r = a + 1 if abs(x) - a >= 0.5 else a
    return int(r) if x >= 0 else -int(r)


def _fixed_point_gd(rows, k, n_iters, lr=0.5, l2=1e-4):
    """From-scratch reference of the fixed-point canon: integer margins
    (1e-9 weight grid), per-row errors rounded to the 1e-7 grain before
    the gradient sum, half-away-from-zero weight requantization."""
    feats = [(_idxs(t), y) for _, t, _, y in rows]
    n = len(feats)
    w_fp = [0] * (k + 1)
    for _ in range(n_iters):
        grad_fp = [0] * (k + 1)
        for ix, y in feats:
            m = sum(w_fp[j] for j in ix) / W_SCALE
            efp = _rha((sigmoid(m) - y) * ERR_SCALE)
            for j in ix:
                grad_fp[j] += efp
        w_fp = [
            _rha(
                (
                    wf / W_SCALE
                    - lr * ((gf / ERR_SCALE) / n + l2 * (wf / W_SCALE))
                )
                * W_SCALE
            )
            for wf, gf in zip(w_fp, grad_fp)
        ]
    return [wf / W_SCALE for wf in w_fp]


def test_hash_features_matches_md5_canon(spark, docs):
    got = {
        r["doc_id"]: list(r["idxs"])
        for r in hash_features(docs, K).collect()
    }
    for i, t, _, _ in _docs():
        assert got[i] == _idxs(t)
        assert got[i][:-1] == [hash_idx(w, K) for w in t.split()]


def test_train_matches_fixed_point_reference_exactly(spark, docs):
    feats = hash_features(docs, K)
    train = feats.join(docs.select("doc_id", "y"), "doc_id")
    w, history = train_logreg(train, k=K, n_iters=10)
    want = _fixed_point_gd(_docs(), K, 10)
    assert w == want  # exact: integer grid, no tolerance needed
    # loss decreases monotonically on a separable problem
    losses = [h["loss_ppm"] for h in history]
    assert losses == sorted(losses, reverse=True)


def test_learns_separable_labels_on_holdout(spark, docs):
    # train on doc_id % 5 != 0, evaluate on the held-out fifth
    train_docs = docs.filter("doc_id % 5 != 0")
    held = docs.filter("doc_id % 5 = 0")
    feats = hash_features(train_docs, K)
    w, _ = train_logreg(
        feats.join(train_docs.select("doc_id", "y"), "doc_id"),
        k=K,
        n_iters=40,
    )
    scored = score(hash_features(held, K), w).join(
        held.select("doc_id", "y"), "doc_id"
    )
    right = scored.filter(
        ((F.col("prob_bp") >= 5000) & (F.col("y") == 1))
        | ((F.col("prob_bp") < 5000) & (F.col("y") == 0))
    ).count()
    assert right == held.count()  # separable: perfect holdout


def test_scoring_is_shuffle_free(spark, docs):
    w = [0.01] * (K + 1)
    plan = (
        score(hash_features(docs, K), w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_quality_report_counts(spark, docs):
    rep = {
        r["source"]: r
        for r in quality_classifier_report(
            docs, label_col="y", k=K, n_iters=40
        ).collect()
    }
    assert set(rep) == {"s0", "s1", "s2"}
    for r in rep.values():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 40
        assert r["accuracy_ppm"] == 1_000_000  # separable, same corpus
