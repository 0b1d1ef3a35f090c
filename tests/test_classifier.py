"""Distributed logistic regression: numpy-reference agreement, linearly-
separable learnability with a holdout, zero-shuffle scoring plan. Float
sums are IEEE-order-dependent — hence tolerances here and rows-only
status in the oracle contract."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.operators.classifier import (
    hash_features,
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
    ix = [zlib.crc32(w.encode()) % k for w in text.split() if w]
    return ix + [k]  # bias index


def _numpy_gd(rows, k, n_iters, lr=0.5, l2=1e-4):
    """Reference: same hashing, same full-batch GD, same L2."""
    feats = [(_idxs(t), y) for _, t, _, y in rows]
    n = len(feats)
    w = np.zeros(k + 1)
    for _ in range(n_iters):
        grad = np.zeros(k + 1)
        for ix, y in feats:
            m = sum(w[j] for j in ix)
            err = sigmoid(m) - y
            for j in ix:
                grad[j] += err
        w = w - lr * (grad / n + l2 * w)
    return w


def test_hash_features_matches_crc32(spark, docs):
    got = {
        r["doc_id"]: list(r["idxs"])
        for r in hash_features(docs, K).collect()
    }
    for i, t, _, _ in _docs():
        assert got[i] == _idxs(t)


def test_train_matches_numpy_reference(spark, docs):
    feats = hash_features(docs, K)
    train = feats.join(docs.select("doc_id", "y"), "doc_id")
    w, history = train_logreg(train, k=K, n_iters=10)
    want = _numpy_gd(_docs(), K, 10)
    np.testing.assert_allclose(w, want, rtol=1e-6, atol=1e-9)
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
