"""Build-once/probe-many IVF: a probe against the materialized index is
bit-identical to computing the index inline, incremental appends against
frozen centroids converge to the one-shot index, and the persisted
layout actually partitions by list."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.operators.similarity import (
    ivf_assignments,
    ivf_index,
    ivf_probe,
    ivf_topk,
)
from binlog_processer_spark.storage.table import SnapshotTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(SF).select("vec_id", "embedding")


def _rows(df):
    return sorted(
        (r["query_id"], r["vec_id"], r["cosine_bp"], r["rank"])
        for r in df.collect()
    )


def test_probe_matches_inline_ivf_topk(spark, embs):
    index, cent = ivf_index(embs, n_centroids=16)
    got = ivf_probe(index, cent, list(range(10)), k=5, n_probe=4)
    want = ivf_topk(embs, list(range(10)), k=5, n_centroids=16, n_probe=4)
    assert _rows(got) == _rows(want)  # bit-identical, ranks included


def test_incremental_append_converges_to_one_shot(spark, tmp_path, embs):
    old = embs.filter("vec_id % 5 != 0")
    batch = embs.filter("vec_id % 5 = 0")
    index, cent = ivf_index(old, n_centroids=8)

    t = SnapshotTable(str(tmp_path / "ivf_index"))
    t.write(index, partition_by=["centroid_id"])
    t.write(
        ivf_assignments(batch, cent, keep_embedding=True),
        partition_by=["centroid_id"],
        mode="append",
    )
    merged = t.read(spark)
    assert merged.count() == embs.count()

    # probing the appended index == probing a one-shot index over the
    # union with the SAME frozen centroids
    one_shot = ivf_assignments(embs, cent, keep_embedding=True)
    got = ivf_probe(merged, cent, [0, 5, 10, 31], k=5, n_probe=3)
    want = ivf_probe(one_shot, cent, [0, 5, 10, 31], k=5, n_probe=3)
    assert _rows(got) == _rows(want)


def test_index_cli_build_add_probe(tmp_path, spark, embs):
    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    embs.filter("vec_id >= 50").write.parquet(old_p)
    embs.filter("vec_id < 50").write.parquet(new_p)
    wh = str(tmp_path / "index_wh")

    def run(*extra):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "run_index.py"),
             "--output", wh, *extra],
            capture_output=True, text=True, timeout=600, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    b = run("--embeddings", old_p, "--centroids", "8", "--refine", "1")
    assert b["mode"] == "build" and b["vectors"] == 450
    assert b["centroids"] == 8 and b["refined_iters"] == 1

    a = run("--embeddings", new_p, "--add")
    assert a["added"] == 50 and a["total"] == 500

    p = run("--probe", "3,7", "--k", "4", "--n-probe", "3")
    assert p["queries"] == 2 and len(p["rows"]) == 8
    for row in p["rows"]:
        assert row["vec_id"] != row["query_id"] and 1 <= row["rank"] <= 4

    # the persisted layout is one directory per inverted list
    snap = json.load(open(os.path.join(wh, "ivf_index", "_current")))
    man = json.load(open(os.path.join(
        wh, "ivf_index", f"snap-{snap['snapshot']}", "manifest.json")))
    assert man["partition_by"] == ["centroid_id"]
    parts = {f.split("centroid_id=")[-1].split("/")[0]
             for f in man["files"] if "centroid_id=" in f}
    assert len(parts) >= 2  # genuinely partitioned by list
