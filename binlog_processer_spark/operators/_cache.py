"""Registry for plan-size persists.

Several LSH operators persist a small intermediate relation not for data
reuse but to stop Catalyst from inlining a very wide signature expression
into every branch of a self-join (driver codegen blowup — see
dedup.minhash_lsh_pairs). Those persists used to be anonymous, so a
long-lived session accumulated cached relations indefinitely. ``pin``
persists AND registers the DataFrame; a driver that runs many such queries
in one session calls ``unpin_all()`` between them (or, bluntly,
``spark.catalog.clearCache()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() + register for later ``unpin_all`` cleanup."""
    df = df.persist()
    _PINNED.append(df)
    return df


def unpin_all() -> int:
    """Unpersist every registered relation; returns how many were released."""
    n = 0
    while _PINNED:
        _PINNED.pop().unpersist()
        n += 1
    return n
