"""binlog_processer_spark — a from-scratch PySpark-native reimplementation of the
capabilities of wang-shun/binlog-processer (reference at /root/reference, Java 8
thread-pool CDC pipeline) as an idiomatic Spark DataFrame engine.

Pipeline: parse (vectorized pandas/Arrow UDF) → enrich (broadcast join) →
route (fan-out partitioned sinks, dual date trees) → aggregate (per-sink op
counts, windowed histograms, watermarks) → verify (anti/semi/theta joins) →
repair (merge) — plus resume-from-manifest checkpointing, salted-key skew
mitigation, and large-scale training-data ops (dedup, similarity search,
text analysis, multimodal plumbing).

Nothing here is a translation of the reference's execution machinery; every
operator is re-expressed on the public PySpark DataFrame/SQL API so Catalyst +
Tungsten choose the physical plan.
"""

__version__ = "0.1.0"
