"""Resumable processing via a processed-file manifest.

Reference parity: the pipeline tracks per-file status in `t_binlog_process`
(DBbiz.java:43-83), skips in-flight/done files (ProcessCheck.java:36-80,
TransferTimerTask.java:33-34 processingSet) and resumes partial downloads from
current size (TransferProcess.java:48-67). Spark-side: each completed input
file_id is recorded in a manifest; a rerun **anti-joins** the input against the
manifest so only unprocessed files flow, and per-file sink writes are
idempotent (partition overwrite in the storage layer) so a crash between
write and manifest-commit is safe to replay.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ProcessedManifest:
    """Tiny driver-side manifest (the t_binlog_process stand-in). The file
    list is small (one entry per input file), so it is deliberately not a
    DataFrame; it broadcasts into the anti-join."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path) as f:
            return set(json.load(f)["processed"])

    def mark(self, file_ids: list[str]) -> None:
        self._save(self.load() | set(file_ids))

    def unmark(self, file_ids: list[str]) -> None:
        """Forget completed files so the next run re-processes them — the
        structural-repair hook (Repair.java:179-260 resets t_binlog_process
        status for files whose output was lost)."""
        self._save(self.load() - set(file_ids))

    def _save(self, done: set[str]) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"processed": sorted(done)}, f)
        os.replace(tmp, self.path)  # atomic commit, HdfsStorage.java:40-51 analogue


def remaining_events(events: DataFrame, processed: set[str]) -> DataFrame:
    """Anti-join the input against the processed set (broadcast isin — the
    set is tiny; at real scale swap for a broadcast anti-join on a manifest
    table)."""
    if not processed:
        return events
    return events.filter(~F.col("file_id").isin(*sorted(processed)))
