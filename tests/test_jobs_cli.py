"""spark-submit surface smoke: the three CLI entry points end-to-end in
subprocesses (resolve → verify → repair), sharing one warehouse — the
reference's BinlogMain / TiDBCheckByFile / HiveRepairByDataBase trio
(SURVEY.md §3) as --py-files-shippable jobs."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    out = subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_pipeline_verify_repair_cli(tmp_path):
    wh = str(tmp_path / "wh")
    m = _run(["jobs/run_pipeline.py", "--generate", "2000", "--output", wh])
    assert m["rows_routed"] > 0 and m["rows_failed"] == 0

    clean = _run(["jobs/run_verify.py", "--warehouse", wh])
    assert clean["findings_total"] == 0

    dirty = _run(["jobs/run_verify.py", "--warehouse", wh, "--mutate"])
    assert dirty["findings_total"] > 0

    rep = _run(["jobs/run_repair.py", "--warehouse", wh])
    assert rep["findings_before"] == dirty["findings_total"]
    assert rep["findings_after"] == 0


def test_package_zip():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package

    out = package.build(os.path.join(REPO, "dist", "engine-test.zip"))
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "binlog_processer_spark/session.py" in names
    assert "binlog_processer_spark/plans/pipeline.py" in names
    os.remove(out)
