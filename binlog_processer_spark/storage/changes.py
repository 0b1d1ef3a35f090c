"""Change-data-feed between two snapshots, planned from the manifest diff.

Iceberg/Delta expose "what changed between snapshot A and B" as a scan of
the files ADDED and REMOVED between the two manifests — never the table.
The same contract on SnapshotTable:

- plan: ``added = files(to) - files(since)``, ``removed = files(since) -
  files(to)`` — two manifest reads, no listing, no full scan. A file
  carried unchanged between snapshots contributes nothing and is never
  opened, so the cost of ``table_changes`` scales with the churn (the
  rewritten/appended files), not the table. On an append-only history the
  removed set is empty and the diff degenerates to ``read_incremental``.
- rows: a rewrite (compaction, repair, upsert) copies unchanged rows into
  new files; a file-level diff alone would surface them as phantom
  changes. A signed-count aggregate (+1 per added-file row, −1 per
  removed-file row, grouped on the full row) cancels identical rows
  multiset-exactly — the EXCEPT ALL semantics in ONE pass over the
  churned files and one exchange, where literal exceptAll calls would
  rebuild each side per consuming branch.
- classification (Delta CDF convention): with ``key_cols``, a key present
  on both sides of the residue is an update (emitted twice:
  ``update_preimage`` + ``update_postimage``); only-new is ``insert``;
  only-old is ``delete``. Without keys, inserts/deletes only.

Schema evolution: each side scans under its own snapshot's schema; the old
side is then aligned to the new schema (cast-widened, absent columns
null-filled) — legal because ``migrate_schema`` admits widening only.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .table import SnapshotTable

CHANGE_COL = "_change_type"


def _align(df: DataFrame, to_schema: StructType) -> DataFrame:
    """Project ``df`` onto ``to_schema``: cast present columns (widening —
    the only migration the table admits), null-fill added ones."""
    have = set(df.columns)
    return df.select(
        *[
            (F.col(f.name) if f.name in have else F.lit(None)).cast(
                f.dataType
            ).alias(f.name)
            for f in to_schema.fields
        ]
    )


def table_changes(
    spark: SparkSession,
    table: SnapshotTable,
    since: int,
    snapshot: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level changes between ``since`` and ``snapshot`` (default
    current): the table's columns plus ``_change_type`` in
    ``insert | delete | update_preimage | update_postimage``.

    Planned from the manifest file diff — only churned files are scanned
    (verifiable via ``DataFrame.inputFiles()``); identical rows copied by
    rewrites cancel. File-level granularity means a no-op overwrite that
    rewrote every byte still diffs to zero rows, at the cost of scanning
    what the overwrite touched.
    """
    snap = table.current_snapshot() if snapshot is None else snapshot
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot in {table.root}")
    m_old = table._manifest(since)
    m_new = table._manifest(snap)
    old_files = set(table._files_rel(m_old))
    new_files = set(table._files_rel(m_new))
    new_schema = StructType.fromJson(json.loads(m_new["schema"]))

    # merge-on-read equality deletes change rows WITHOUT changing the file
    # inventory, so the file diff alone would report a delete commit as
    # zero changes. Files carried by both snapshots whose applicable
    # delete set differs are scanned on BOTH sides (each side under its
    # own manifest, so each applies its own delete state); the signed
    # residue below cancels the surviving rows and emits exactly the rows
    # the new deletes removed. Cost still scales with churn: only files a
    # changed delete could touch (older commit sequence) are re-read.
    def _dkey(e: dict) -> tuple:
        return (e["path"], int(e["seq"]), tuple(e["key_cols"]))

    d_old = {_dkey(e) for e in m_old.get("delete_files", [])}
    d_new = {_dkey(e) for e in m_new.get("delete_files", [])}
    affected: set[str] = set()
    changed_deletes = d_old ^ d_new
    if changed_deletes:
        affected = {
            f
            for f in old_files & new_files
            if any(
                seq > SnapshotTable._dir_seq(f)
                for _, seq, _ in changed_deletes
            )
        }

    added = table._scan(spark, m_new, sorted((new_files - old_files) | affected))
    removed = _align(
        table._scan(spark, m_old, sorted((old_files - new_files) | affected)),
        new_schema,
    )
    cols = [f.name for f in new_schema.fields]

    # signed-count residue: ONE aggregate over one pass of the churned
    # files replaces two exceptAlls (whose DAG would rebuild each side per
    # consuming branch — measured 12 exchanges / 4 re-scans as joins).
    # delta > 0 ⇒ the row is new (that many times over), delta < 0 ⇒ it
    # was removed; identical rewrite-copied rows cancel to delta = 0.
    # groupBy treats NULLs as equal — the same multiset semantics
    # EXCEPT ALL uses. (Map-typed columns are not groupable, but they are
    # not EXCEPT-comparable either — same constraint, same failure.)
    residue = (
        added.withColumn("__d", F.lit(1))
        .unionByName(removed.withColumn("__d", F.lit(-1)))
        .groupBy(*cols)
        .agg(F.sum("__d").alias("__delta"))
        .filter(F.col("__delta") != 0)
    )

    if not key_cols:
        change = F.when(F.col("__delta") > 0, "insert").otherwise("delete")
        classified = residue
    else:
        # per-key sign presence classifies updates. Window over the key
        # cols, not aggregate+join: partitionBy groups NULL keys together
        # (null-safe — an equi-join would drop NULL-keyed changes, since
        # NULL != NULL), and it's one exchange on the residue instead of
        # an aggregate plus a join.
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols)
        classified = residue.withColumn(
            "__hn",
            F.max(F.when(F.col("__delta") > 0, 1).otherwise(0)).over(w),
        ).withColumn(
            "__ho",
            F.max(F.when(F.col("__delta") < 0, 1).otherwise(0)).over(w),
        )
        change = F.when(
            F.col("__delta") > 0,
            F.when(F.col("__ho") == 1, "update_postimage").otherwise("insert"),
        ).otherwise(
            F.when(F.col("__hn") == 1, "update_preimage").otherwise("delete")
        )
    # restore multiset multiplicity (EXCEPT ALL emits |delta| copies)
    return (
        classified.withColumn(CHANGE_COL, change)
        .withColumn(
            "__r",
            F.explode(F.expr("array_repeat(1, cast(abs(__delta) AS int))")),
        )
        .select(*cols, CHANGE_COL)
    )


class ChangeFeed:
    """Crash-safe consumer cursor over a table's change feed — the
    subscribe side of ``table_changes`` (Delta's ``readChangeFeed`` /
    Iceberg's incremental-consume shape, consumer-owned offsets like a
    Kafka group).

    ``poll`` returns ``(changes, snapshot)`` for everything committed
    since the cursor; the caller processes the batch, then ``commit``\\ s
    the returned snapshot — at-least-once by construction (a crash before
    commit re-polls the same batch; the signed-count residue makes
    replays idempotent to reconcile downstream). The cursor is one JSON
    file in a CONSUMER-owned location: many independent consumers can
    follow one table at their own pace, and the table knows nothing
    about them.

    ``initial='latest'`` starts at the current snapshot (new changes
    only); ``'earliest'`` emits the whole current snapshot as inserts
    first — the bootstrap-a-new-downstream shape.
    """

    def __init__(
        self,
        table: SnapshotTable,
        cursor_path: str,
        key_cols: list[str] | None = None,
        initial: str = "latest",
    ):
        if initial not in ("latest", "earliest"):
            raise ValueError("initial must be 'latest' or 'earliest'")
        self.table = table
        self.cursor_path = cursor_path
        self.key_cols = key_cols
        self.initial = initial
        self._fs = None

    def _cursor_fs(self):
        from . import fs as fsmod

        if self._fs is None:
            self._fs = fsmod.fs_for(self.cursor_path)
        return self._fs

    def position(self) -> int | None:
        import json as _json

        try:
            return _json.loads(
                self._cursor_fs().read_text(self.cursor_path)
            )["snapshot"]
        except FileNotFoundError:
            return None

    def commit(self, snapshot: int) -> None:
        import json as _json
        import os as _os

        parent = _os.path.dirname(self.cursor_path)
        if parent:
            self._cursor_fs().mkdirs(parent)
        self._cursor_fs().write_text_atomic(
            self.cursor_path, _json.dumps({"snapshot": snapshot})
        )

    def poll(self, spark: SparkSession):
        """(changes DataFrame, snapshot to commit) — ``(None, snap)`` when
        the cursor is already at the table head (nothing to process)."""
        cur = self.table.current_snapshot()
        if cur is None:
            raise FileNotFoundError(
                f"no committed snapshot in {self.table.root}"
            )
        pos = self.position()
        if pos is None:
            if self.initial == "earliest":
                return (
                    self.table.read(spark).withColumn(
                        CHANGE_COL, F.lit("insert")
                    ),
                    cur,
                )
            self.commit(cur)
            pos = cur
        if pos == cur:
            return None, cur
        return table_changes(
            spark, self.table, since=pos, snapshot=cur,
            key_cols=self.key_cols,
        ), cur


def apply_changes(
    spark: SparkSession,
    mirror: SnapshotTable,
    changes: DataFrame,
    key_cols: list[str],
) -> int:
    """Apply one CDF batch to a downstream MIRROR table — CDC replication
    with file-scoped writes (the run_repair / streaming-upsert commit
    pattern): only mirror files containing an affected key are rewritten;
    everything else is carried by manifest reference.

    IDEMPOTENT by construction: every key the batch touches is removed
    from the hit files first, then the batch's insert/postimage rows go
    in — replaying the same batch (or a superset span after a crashed
    relay) deletes what the earlier replay inserted and re-inserts it
    identically, so at-least-once delivery yields exactly-once state with
    no sink-side watermark.

    ``changes`` must carry exactly the mirror's columns plus
    ``_change_type``. Keys are assumed unique per side (the same contract
    CDF classification uses). Returns the committed snapshot."""
    add = changes.filter(
        F.col(CHANGE_COL).isin("insert", "update_postimage")
    ).drop(CHANGE_COL)
    if mirror.current_snapshot() is None:
        return mirror.write(
            add,
            bloom_columns=[key_cols[0]] if len(key_cols) == 1 else None,
        )
    from .table import plan_hit_files

    touched = changes.select(*key_cols).distinct()
    hit_files = plan_hit_files(spark, mirror, touched, key_cols)
    cur_hit = mirror.read_files(spark, hit_files)
    # null-safe anti join, matching the planner: NULL-keyed rows must be
    # replaced like any other, not silently kept alongside their postimage
    cond = F.expr(" AND ".join(f"c.{k} <=> k.{k}" for k in key_cols))
    replacement = (
        cur_hit.alias("c")
        .join(touched.alias("k"), cond, "left_anti")
        .unionByName(add)
    )
    return mirror.rewrite_files(hit_files, replacement)
