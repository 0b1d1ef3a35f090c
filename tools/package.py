"""Build dist/engine.zip for spark-submit --py-files.

Usage: python tools/package.py  →  dist/engine.zip

The zip contains the binlog_processer_spark package (and the jobs' shared
helpers are plain modules inside jobs/, shipped as the main script +
--py-files). Executors unpack the zip onto sys.path, so pandas-UDF workers
resolve the package on a real cluster exactly as PYTHONPATH does in local
mode (session.py).
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "binlog_processer_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
