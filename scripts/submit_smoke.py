#!/usr/bin/env python3
"""Prove the `spark-submit --py-files` ships-as requirement end-to-end.

Builds dist/feature_extraction_spark.zip, copies ONLY the job file into a
scratch directory, scrubs PYTHONPATH, and runs the flagship pipeline twice
under `spark-submit --py-files <zip>` at two parallelism levels. Passing
means the zip alone carries the engine (no repo on the path) and the output
hash is identical across parallelism levels (partitioning-independence).

Usage:  python scripts/submit_smoke.py [events_parquet_dir]
Prints one JSON line with rows/hash per level and writes nothing else.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(events: str) -> dict:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import main as make_zip

    zip_path = make_zip()
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        job = os.path.join(tmp, "submit_job.py")
        shutil.copy(os.path.join(REPO, "scripts", "submit_job.py"), job)
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("PYTHONPATH",)  # the zip must be the only source
        }
        for level in ("local[4]", "local[8]"):
            proc = subprocess.run(
                [
                    "spark-submit",
                    "--master", level,
                    "--conf", "spark.sql.shuffle.partitions=16",
                    "--py-files", zip_path,
                    job, events,
                ],
                cwd=tmp,  # NOT the repo: import must come from the zip
                env=env,
                capture_output=True,
                text=True,
                timeout=600,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"spark-submit failed at {level}:\n{proc.stderr[-3000:]}"
                )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            results[level] = json.loads(line)
    hashes = {r["hash"] for r in results.values()}
    results["hash_identical_across_levels"] = len(hashes) == 1
    return results


if __name__ == "__main__":
    events = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/events.parquet"
    print(json.dumps(run(events)))
