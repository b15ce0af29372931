#!/usr/bin/env python
"""Build the spark-submit --py-files artifact.

Produces ``dist/spark_geotile.zip`` containing the ``whitebox_tools_spark``
package (sources only — no tests, no caches). Usage on a cluster:

    spark-submit --py-files dist/spark_geotile.zip your_job.py

where ``your_job.py`` does ``from whitebox_tools_spark import api`` etc.
The zip is importable directly (zipimport), verified by this script.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "whitebox_tools_spark"
OUT = os.path.join(ROOT, "dist", "spark_geotile.zip")


def main() -> int:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    # verify the artifact is importable via zipimport, as spark-submit
    # executors will see it
    probe = subprocess.run(
        [sys.executable, "-c", f"import {PKG}.registry as r; print(len(r.TOOLS))"],
        env={**os.environ, "PYTHONPATH": OUT},
        capture_output=True,
        text=True,
        cwd="/",
    )
    if probe.returncode != 0:
        print(probe.stderr, file=sys.stderr)
        return 1
    print(f"{OUT}: {os.path.getsize(OUT)} bytes, {probe.stdout.strip()} tools importable")
    return 0


if __name__ == "__main__":
    sys.exit(main())
