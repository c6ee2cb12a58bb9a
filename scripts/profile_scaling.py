#!/usr/bin/env python3
"""Decompose the flagship pipeline's scaling: time nested sub-pipelines at
two parallelism levels to locate the non-scaling component (Amdahl term).

Usage: python scripts/profile_scaling.py [tpath]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
cores = int(sys.argv[1]); tpath = sys.argv[2]
sys.path.insert(0, "@REPO@")
import pyspark.sql.functions as F
from feature_extraction_spark.session import get_spark
from feature_extraction_spark.ops.backfill import backfill
from feature_extraction_spark.ops.sessionize import sessionize
from feature_extraction_spark.ops.turn_stats import verbosity_stats
from feature_extraction_spark.ops.windows import rolling_turn_features, with_role_transition

spark = get_spark("prof", cores=cores, shuffle_partitions=cores * 2,
                  extra_conf={"spark.driver.memory": f"{int(cores*1.5)}g"})
t = spark.read.parquet(tpath)

def stage_scan(t):
    return t
def stage_sess(t):
    return sessionize(t, gap_seconds=300.0)
def stage_roll(t):
    x = sessionize(t, gap_seconds=300.0)
    x = with_role_transition(x)
    return rolling_turn_features(x, trailing_seconds=600, trailing_rows=10)
def stage_backfill(t):
    x = stage_roll(t)
    x = x.withColumn("tool_val", F.when(F.col("tool").isNotNull(), F.length("tool").cast("double")))
    return backfill(x, ["tool_val"])
def stage_verbosity(t):
    return verbosity_stats(t, level="conv")
def stage_full(t):
    x = stage_backfill(t)
    return x.join(verbosity_stats(t, level="conv"), on="conv_id", how="left")

def force(df):
    df.write.format("noop").mode("overwrite").save()

res = {}
for name, fn in [("scan", stage_scan), ("sessionize", stage_sess),
                 ("rolling", stage_roll), ("backfill", stage_backfill),
                 ("verbosity", stage_verbosity), ("full", stage_full)]:
    df = fn(t)
    force(df); force(df); force(df)  # steady state
    t0 = time.monotonic(); force(df)
    res[name] = round(time.monotonic() - t0, 3)
print(json.dumps({"cores": cores, **res}))
"""


def main() -> None:
    tpath = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/spark_graft_bench/transcripts_scaling_600000_seed42"
    )
    script = CHILD.replace("@REPO@", REPO)
    out = {}
    for cores in (8, 32):
        r = subprocess.run(
            [sys.executable, "-c", script, str(cores), tpath],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-3000:])
            raise SystemExit(1)
        out[cores] = json.loads(r.stdout.strip().splitlines()[-1])
    for k in out[8]:
        if k == "cores":
            continue
        t8, t32 = out[8][k], out[32][k]
        eff = (t8 / t32) / 4 if t32 else float("nan")
        print(f"{k:12s} local8={t8:8.3f}s local32={t32:8.3f}s eff={eff:.3f}")


if __name__ == "__main__":
    main()
