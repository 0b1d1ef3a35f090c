"""N vs 4N parity: identical results at two cluster sizes.

BASELINE.json's north rule validates the pipeline "at cluster sizes N
and 4N executors"; the sandbox stand-in is SPARK_GRAFT_CPUS=2 vs 8
(local[2]/local[8], the same levels the scaling campaign measures).
Beyond evidencing the rule, this pins a real invariant: nothing in the
engine — salted repartition, AQE coalescing, per-partition Misra-Gries,
mapInPandas batch boundaries — may let PARALLELISM leak into RESULTS.
Every row (token arrays included) and every sink count must be
bit-identical across levels.

Runs the real spark-submit surface (jobs/run_pipeline.py) in
subprocesses — separate JVMs, so the two levels can't share a session —
and compares the written warehouses with DuckDB.
"""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_pipeline(cpus: int, out_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         "--generate", "4000", "--output", out_dir],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _data_dirs(root: str) -> list[str]:
    snap = json.load(open(os.path.join(root, "_current")))["snapshot"]
    man = json.load(
        open(os.path.join(root, f"snap-{snap}", "manifest.json"))
    )
    # data_dirs are recorded relative to the table root
    return [os.path.join(root, d) for d in man["data_dirs"]]


def test_results_identical_at_n_and_4n(tmp_path):
    m2 = _run_pipeline(2, str(tmp_path / "wh2"))
    m8 = _run_pipeline(8, str(tmp_path / "wh8"))
    assert m2["rows_routed"] == m8["rows_routed"] > 0
    assert m2["rows_failed"] == m8["rows_failed"]

    con = duckdb.connect()
    con.execute("SET threads=4")
    for level, wh in (("2", tmp_path / "wh2"), ("8", tmp_path / "wh8")):
        globs = [f"'{d}/**/*.parquet'" for d in _data_dirs(str(wh / "routed"))]
        con.execute(
            f"CREATE VIEW routed{level} AS SELECT * FROM read_parquet("
            f"[{', '.join(globs)}], hive_partitioning=1)"
        )
        counts = str(wh / "sink_counts")
        cglobs = [f"'{d}/**/*.parquet'" for d in _data_dirs(counts)]
        con.execute(
            f"CREATE VIEW counts{level} AS SELECT * FROM read_parquet("
            f"[{', '.join(cglobs)}], hive_partitioning=1)"
        )

    # routed rows: exact multiset equality including token arrays — the
    # per-row invariant the reference asserts (routed-row equality)
    digest = (
        "SELECT md5(string_agg(h, '|' ORDER BY h)) FROM (SELECT md5("
        " concat_ws(',', tree, database_name, table_name, doc_id,"
        " cast(event_seq AS varchar), cast(part_date AS varchar), op,"
        " array_to_string(list_transform(img_tokens, x -> cast(x AS varchar)), ';')"
        ")) AS h FROM routed{l})"
    )
    n2 = con.execute("SELECT count(*) FROM routed2").fetchone()[0]
    n8 = con.execute("SELECT count(*) FROM routed8").fetchone()[0]
    assert n2 == n8 == m2["rows_routed"]
    assert (
        con.execute(digest.format(l=2)).fetchone()[0]
        == con.execute(digest.format(l=8)).fetchone()[0]
    )

    # per-sink aggregate parity (the reference's per-sink count assertion)
    cdig = (
        "SELECT md5(string_agg(h, '|' ORDER BY h)) FROM (SELECT md5("
        " concat_ws(',', database_name, table_name,"
        " cast(insert_cnt AS varchar), cast(update_cnt AS varchar),"
        " cast(delete_cnt AS varchar))) AS h FROM counts{l})"
    )
    assert (
        con.execute(cdig.format(l=2)).fetchone()[0]
        == con.execute(cdig.format(l=8)).fetchone()[0]
    )


def _run_tokenize(cpus: int, docs: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_tokenize.py"),
         "--docs", docs, "--num-merges", "48", "--min-count", "2"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_mix_planner_rates_identical_at_n_and_4n():
    """Regression pin for a real cluster-size leak: temperature_targets
    normalizes pow(share, 1/T) with a sum-of-doubles window, whose
    accumulation order follows partition count; the binding source's
    rate, computed as c*tgt/tokens, re-rounded to 0.999… at local[8] but
    1.0 at local[32], flipping floor(rate*10000) from 10000 to 9999.
    The fix computes rate = c/q where q = tokens/tgt is the SAME double
    the min was taken over — the binding row divides a value by itself,
    which IEEE guarantees is exactly 1.0 at any parallelism. This test
    runs the planner in-process at local[2] and local[8] (fresh sessions)
    and demands every floored bp column be identical."""
    import subprocess
    import sys as _sys

    code = r"""
import json, sys
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.operators.mix import temperature_targets, rebalance_report
spark = get_spark("parity-mix")
df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").selectExpr(
    "source", "greatest(1, cast(floor(n_chars / 4) as bigint)) as n_tok")
rows_t = sorted(map(tuple, temperature_targets(df, temperature=2.0).collect()))
tgt = {f"src{i}": 1.0 for i in range(20)}
rows_r = sorted(map(tuple, rebalance_report(df, tgt).collect()))
print(json.dumps({"t": rows_t, "r": rows_r}, default=str))
spark.stop()
"""
    out = {}
    for cpus in (2, 8):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        r = subprocess.run(
            [_sys.executable, "-c", code], capture_output=True,
            text=True, timeout=600, env=env, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        out[cpus] = json.loads(
            [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        )
    assert out[2]["t"] == out[8]["t"]
    assert out[2]["r"] == out[8]["r"]
    # the binding source keeps everything, exactly: one rate_bp == 10000
    assert any(row[4] == 10000 for row in out[2]["t"])


def test_bpe_tokenizer_identical_at_n_and_4n():
    """The tokens-axis surface meets the same two-cluster-size bar as
    the pipeline: the learned vocabulary and every per-source encode
    count are pure functions of the corpus — word counts are integer
    aggregates, the merge loop runs on a deterministically ordered
    bounded collect, and encoding is per-word — so nothing may change
    between local[2] and local[8]."""
    docs = "/root/testdata/sf0.001/documents.parquet"
    m2 = _run_tokenize(2, docs)
    m8 = _run_tokenize(8, docs)
    assert m2["merges_learned"] == m8["merges_learned"] == 48
    assert m2["vocab_size"] == m8["vocab_size"]
    assert m2["per_source"] == m8["per_source"]  # every count, every source
