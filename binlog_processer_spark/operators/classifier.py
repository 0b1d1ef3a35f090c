"""Model-based quality filtering: a distributed logistic-regression
classifier over hashed bag-of-words features — the fastText-style
quality gate production corpora are filtered with (CCNet / LLaMA-style
"looks like reference text" scoring), trained and applied on-engine.

Layout (the Spark-idiomatic distributed-LR shape):

- **Features are kept sparse and implicit.** A document is just its
  array of hashed token indices (``crc32(word) % k``) — no dense vector
  is ever materialized. The dot product w·x is a pure-codegen
  ``aggregate`` fold over that array (each occurrence adds ``w[idx]``,
  so raw term counts are implicit), with the weight vector inlined as a
  literal array — margins and per-row errors cost ZERO shuffles.
- **One shuffle per iteration.** The gradient is
  ``sum over token occurrences of err(doc)`` grouped by hashed index:
  one explode into a map-side-combined hash aggregate whose output is
  ≤ k+1 rows regardless of corpus size. The k+1-dim result collects to
  the driver (bounded by construction), the update happens there, and
  the new weights re-enter the next round as literals — lineage
  truncates every round, the same posture as kmeans_refine and
  connected_components.
- At 10^12 rows each iteration is one corpus pass; production would
  subsample per round (the deterministic md5 sampler composes directly)
  — the aggregate shape is unchanged.

Determinism canon (fixed-point): weights live on a 1e-9 integer grain
and per-row errors round to a 1e-7 grain BEFORE the gradient sum, so
every aggregate in the loop is an INTEGER sum — associative and
commutative, hence exactly reproducible on any partitioning, any
cluster size, any engine. The weight update itself runs on the driver
over those integers with the shared round-half-away canon. Trained
weights are therefore a pure function of the corpus and the contract
query carries a full DuckDB value-hash oracle (a generated
chained-CTE gradient-descent replay in ``__spark_entry__``);
tests/test_classifier.py's from-scratch reference pins the same canon
bit-for-bit.

Reference parity: the reference engine has no trainer; this is part of
the LLM-training-pipeline surface the build brief mandates alongside
SURVEY.md §2.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binlog_processer_spark.operators.similarity import _round_half_away

BIAS = "__bias__"  # the bias term rides as one extra feature index (k)
W_SCALE = 1_000_000_000  # 1e-9 weight grain
ERR_SCALE = 10_000_000  # 1e-7 per-row error grain


def hash_features(
    docs: DataFrame, k: int = 256, text_col: str = "text"
) -> DataFrame:
    """(doc_id, idxs): hashed bag-of-words token indices, pure codegen.

    The hash is the repo-wide md5 canon (first 8 hex digits as an
    integer, mod k) — DuckDB computes the identical value with
    ``('0x' || substr(md5(w), 1, 8))::bigint % k``, which is what lets
    the training loop carry a cross-engine oracle (crc32, the previous
    choice, has no DuckDB builtin). The bias index ``k`` is appended so
    the model trains an intercept through the same path as every other
    weight."""
    split_sql = f"split(trim(coalesce({text_col}, '')), '\\\\s+')"
    idxs = F.expr(
        f"transform(filter({split_sql}, w -> length(w) > 0),"
        f" w -> cast(cast(conv(substr(md5(encode(w, 'utf-8')), 1, 8),"
        f" 16, 10) as bigint) % {k} as int))"
    )
    return docs.select(
        "doc_id",
        F.concat(idxs, F.array(F.lit(k))).alias("idxs"),
    )


def hash_idx(word: str, k: int) -> int:
    """Driver-side twin of the hashing expression (tests use it)."""
    import hashlib

    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % k


def _wfp_lit(w_fp: list[int]) -> str:
    return "array(" + ", ".join(f"{int(x)}L" for x in w_fp) + ")"


def _margin_fp(w_fp: list[int]) -> F.Column:
    """w·x on the integer weight grain as one codegen fold over the
    index array (counts implicit) — an integer sum, so the margin is
    exact on any evaluation order."""
    return F.expr(
        f"aggregate(idxs, 0L, (acc, j) ->"
        f" acc + element_at({_wfp_lit(w_fp)}, j + 1))"
    )


def _margin(w: list[float]) -> F.Column:
    """Float-weight margin: requantize to the 1e-9 grain (exact for any
    weight that came off the grain) and fold as integers."""
    return (
        _margin_fp([_round_half_away(x * W_SCALE) for x in w]).cast("double")
        / F.lit(float(W_SCALE))
    )


def train_logreg(
    train: DataFrame,
    k: int = 256,
    n_iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> tuple[list[float], list[dict]]:
    """Full-batch gradient descent over ``(idxs, y)`` rows.

    Returns the k+1 weight list (bias last) and a per-iteration history
    of ``{iter, loss_ppm}`` (mean log-loss in ppm — integer, so the
    history is stable enough to report). One zero-shuffle scoring pass +
    one bounded gradient aggregate per iteration; the weight vector is a
    driver-side k+1 list throughout.
    """
    t = train.select("idxs", F.col("y").cast("double").alias("y"))
    n = t.count()
    if n == 0:
        raise ValueError("train_logreg: empty training set")
    w_fp = [0] * (k + 1)
    history: list[dict] = []
    for it in range(n_iters):
        # margin on the integer grain (exact under any fold order), then
        # the per-row error ROUNDS to the 1e-7 grain before summing — so
        # the gradient aggregate is an integer sum, order-independent
        scored = (
            t.withColumn("__mfp", _margin_fp(w_fp))
            .withColumn(
                "__m",
                F.col("__mfp").cast("double") / F.lit(float(W_SCALE)),
            )
            .withColumn(
                "__efp",
                F.round(
                    (
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))
                        - F.col("y")
                    )
                    * ERR_SCALE
                ).cast("bigint"),
            )
        )
        # loss + gradient come out of ONE pass over the scored relation:
        # log(1+exp(-m)) + (1-y)*m is the numerically-safe log-loss
        agg = (
            scored.select(
                F.explode("idxs").alias("idx"),
                "__efp",
                F.when(
                    F.col("__m") > 0,
                    F.log1p(F.exp(-F.col("__m")))
                    + (F.lit(1.0) - F.col("y")) * F.col("__m"),
                )
                .otherwise(
                    F.log1p(F.exp(F.col("__m"))) - F.col("y") * F.col("__m")
                )
                .alias("__l"),
                (F.lit(1.0) / F.size("idxs")).alias("__lw"),
            )
            .groupBy("idx")
            .agg(
                F.sum("__efp").cast("bigint").alias("g_fp"),
                F.sum(F.col("__l") * F.col("__lw")).alias("l"),
            )
            .collect()
        )
        grad_fp = [0] * (k + 1)
        loss = 0.0
        for r in agg:
            grad_fp[int(r["idx"])] = int(r["g_fp"])
            loss += float(r["l"])
        # driver-side update over integers with the shared rounding
        # canon: every term derives from exact int64s via deterministic
        # IEEE double ops, so the new grid point is engine-independent
        w_fp = [
            _round_half_away(
                (
                    wf / W_SCALE
                    - lr * ((gf / ERR_SCALE) / n + l2 * (wf / W_SCALE))
                )
                * W_SCALE
            )
            for wf, gf in zip(w_fp, grad_fp)
        ]
        history.append(
            {"iter": it, "loss_ppm": int(loss / n * 1_000_000)}
        )
    return [wf / W_SCALE for wf in w_fp], history


def score(feats: DataFrame, w: list[float]) -> DataFrame:
    """(doc_id, prob_bp): sigmoid(w·x) in basis points — one projection,
    weights inlined as literals, zero shuffles."""
    m = _margin(w)
    return feats.select(
        "doc_id",
        F.round(
            F.lit(10000.0) / (F.lit(1.0) + F.exp(-m))
        )
        .cast("bigint")
        .alias("prob_bp"),
    )


def quality_classifier_report(
    docs: DataFrame,
    label_col: str = "y",
    k: int = 64,
    n_iters: int = 25,
    threshold_bp: int = 5000,
) -> DataFrame:
    """Train on ``docs`` (text + 0/1 ``label_col``), score the same
    corpus, and report per-source confusion counts — the end-to-end
    quality-gate health check. One row per source with tp/fp/fn/tn and
    accuracy in ppm."""
    feats = hash_features(docs, k)
    train = feats.join(
        docs.select("doc_id", F.col(label_col).alias("y")), "doc_id"
    )
    w, _ = train_logreg(train, k=k, n_iters=n_iters)
    scored = score(feats, w).join(
        docs.select("doc_id", "source", F.col(label_col).alias("y")),
        "doc_id",
    )
    pred = (F.col("prob_bp") >= threshold_bp).cast("int")
    y = F.col("y").cast("int")
    return (
        scored.groupBy("source")
        .agg(
            F.sum((pred * y)).cast("bigint").alias("tp"),
            F.sum((pred * (1 - y))).cast("bigint").alias("fp"),
            F.sum(((1 - pred) * y)).cast("bigint").alias("fn"),
            F.sum(((1 - pred) * (1 - y))).cast("bigint").alias("tn"),
        )
        .select(
            "source",
            "tp",
            "fp",
            "fn",
            "tn",
            F.floor(
                (F.col("tp") + F.col("tn"))
                * 1_000_000
                / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"))
            )
            .cast("bigint")
            .alias("accuracy_ppm"),
        )
        .orderBy("source")
    )


def sigmoid(x: float) -> float:
    """Driver-side twin of the scoring expression (tests use it)."""
    if x >= 0:
        return 1.0 / (1.0 + math.exp(-x))
    e = math.exp(x)
    return e / (1.0 + e)
