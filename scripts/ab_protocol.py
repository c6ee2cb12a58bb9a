#!/usr/bin/env python3
"""Same-protocol perf A/B (round-3 item): the r1->r2 per-query drift was
confounded by a protocol change — round 2 started REBUILDING each query
inside the timed loop (construction + Catalyst compile + any
construction-time materialization now counted), while round 1 timed a
prebuilt DataFrame's execution only. This script runs the 21 round-1
queries under BOTH protocols in one process on one host, so

  prebuilt  ~ r1 protocol  (execution only)
  rebuilt   ~ r2 protocol  (construction + compile + execution)
  rebuilt - prebuilt ~ per-query construction/compile overhead

and compares `prebuilt` against BENCH_r01.json's numbers like for like.
Writes BENCH/ab_protocol.json and prints a markdown table.

Usage: python scripts/ab_protocol.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

R1_QUERIES = [
    "verbosity_docs", "lexdiv_docs", "asof_purchase", "sessionize_events",
    "rolling_events_1h", "backfill_purchase", "latency_stats_events",
    "tpch_q1", "exact_dedup_docs", "jaccard_pairs_docs",
    "minhash_pairs_docs", "cosine_topk", "liwc_docs", "quality_docs",
    "daily_stats_events", "asof_purchase_tolerance", "multilevel_events",
    "tpch_q3", "timing_stats_events", "session_stats_events",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from feature_extraction_spark.session import get_spark

    import __spark_entry__ as entry_mod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "ab", cores=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": f"{max(8, int(cpus * 1.5))}g"},
    )
    queries = entry_mod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    r1 = json.load(open(os.path.join(REPO, "BENCH_r01.json")))["parsed"]["queries"]

    out = {}
    for name in R1_QUERIES:
        mk = lambda: queries[name](spark, SF_DIR)
        # warmups (build + 2 forced runs: codegen C2 promotion)
        df = mk()
        force(df)
        force(df)
        pre = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            force(df)
            pre = min(pre, time.monotonic() - t0)
        reb = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            force(mk())
            reb = min(reb, time.monotonic() - t0)
        out[name] = {
            "r1_recorded": r1.get(name),
            "prebuilt": round(pre, 3),
            "rebuilt": round(reb, 3),
            "construct_overhead": round(reb - pre, 3),
            "vs_r1": round(pre / r1[name], 2) if r1.get(name) else None,
        }
        print(f"{name:28s} r1={r1.get(name)} prebuilt={pre:.3f} "
              f"rebuilt={reb:.3f}", file=sys.stderr)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    payload = {
        "sf_dir": SF_DIR,
        "cpus": cpus,
        "reps": reps,
        "protocol": "one process, min-of-reps after 2 warmups; prebuilt = "
                    "r1 protocol (execution only), rebuilt = r2 protocol "
                    "(construction+compile+execution)",
        "queries": out,
    }
    with open(os.path.join(REPO, "BENCH", "ab_protocol.json"), "w") as f:
        json.dump(payload, f, indent=2)

    print("| query | r1 recorded | prebuilt (r1 proto) | rebuilt (r2 proto) "
          "| construct overhead | prebuilt/r1 |")
    print("|---|---|---|---|---|---|")
    for name, r in out.items():
        print(f"| {name} | {r['r1_recorded']} | {r['prebuilt']} | "
              f"{r['rebuilt']} | {r['construct_overhead']} | {r['vs_r1']} |")
    print(json.dumps({"ok": True, "n": len(out)}))


if __name__ == "__main__":
    main()
