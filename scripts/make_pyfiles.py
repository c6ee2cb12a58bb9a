#!/usr/bin/env python3
"""Package the engine for `spark-submit --py-files` (BASELINE.json ships-as
requirement).

Produces dist/feature_extraction_spark.zip containing the package at the
archive root, importable on executors via --py-files.

Usage:
    python scripts/make_pyfiles.py
    spark-submit --py-files dist/feature_extraction_spark.zip your_job.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "feature_extraction_spark"


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
