"""Per-source token-distribution drift — training-mix QA over the corpus.

A 100 TB training pipeline needs to see when one source's payload
distribution walks away from the rest of the mix (a scraper change, a
tokenizer bump, a poisoned feed). The reference's per-sink counters
(BinlogCount.java analogue, operators/aggregate.py) say HOW MANY rows a
sink got; this module says whether their SHAPE still matches everyone
else's:

- ``token_length_histogram``: fixed-width bucket counts of ``n_tok`` per
  source — one hash aggregate with map-side combine, output bounded by
  sources × buckets regardless of corpus size.
- ``distribution_drift``: Jensen-Shannon divergence of each source's
  bucket distribution against the complement of the corpus (everything
  that is not that source). JSD is symmetric, bounded by ln 2, and zero
  iff the distributions agree — the standard drift score.

Scale posture: the ONLY full-corpus pass is the first groupBy (tiny
shuffle: ≤ sources × buckets partial rows per task). Everything after —
the source/bucket margins, the dense grid, the divergence sum — operates
on that bounded aggregate, so the cost is identical at sf0.01 and at
10^12 rows. No UDFs anywhere; every expression is whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 32
BUCKET_WIDTH = 4


def _bucket(n_buckets: int, width: int) -> F.Column:
    return F.least(
        F.floor(F.col("n_tok") / width), F.lit(n_buckets - 1)
    ).cast("int")


def token_length_histogram(
    df: DataFrame, n_buckets: int = N_BUCKETS, width: int = BUCKET_WIDTH
) -> DataFrame:
    """Bucketed ``n_tok`` counts per source. The top bucket is clamped so
    outliers cannot widen the schema-level contract."""
    return (
        df.groupBy("source", _bucket(n_buckets, width).alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def distribution_drift(
    df: DataFrame, n_buckets: int = N_BUCKETS, width: int = BUCKET_WIDTH
) -> DataFrame:
    """Per-source JSD (natural log) against the rest of the corpus, in
    parts-per-million (bigint — float columns don't survive value-hash
    gates; same convention as the cosine basis-point queries).

    For source s with bucket distribution P and complement distribution Q
    (all other sources pooled): JSD = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q)),
    zero-count terms contributing zero. Bounded by ln 2 ≈ 0.693147
    (693147 ppm) when s shares no bucket with the rest.
    """
    hist = token_length_histogram(df, n_buckets, width)
    by_src = hist.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    by_bkt = hist.groupBy("bucket").agg(F.sum("cnt").alias("g_b"))
    total = by_src.agg(F.sum("n_s").alias("n_total"))

    # dense (source × bucket) grid: buckets a source never hit still feed
    # the q-side sum (q·ln 2 where p = 0) — all inputs here are already
    # aggregate-tiny, so the cross join is sources × buckets rows
    grid = (
        by_src.crossJoin(F.broadcast(by_bkt))
        .join(F.broadcast(hist), ["source", "bucket"], "left")
        .crossJoin(F.broadcast(total))
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    )
    p = F.col("cnt") / F.col("n_s")
    q = (F.col("g_b") - F.col("cnt")) / (F.col("n_total") - F.col("n_s"))
    term = 0.5 * (
        F.when(p > 0, p * F.log(2 * p / (p + q))).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(2 * q / (p + q))).otherwise(F.lit(0.0))
    )
    return (
        grid.groupBy("source")
        .agg(F.round(F.sum(term) * 1_000_000).cast("bigint").alias("jsd_ppm"))
    )
