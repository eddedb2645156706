"""A/B the headline bench across JVM heap sizes (VERDICT r12 #1).

Round 12 raised the default driver heap 8g→24g (needed for the x100
sweeps) and the 23-query headline total moved +14.4% vs r11 — uniformly,
worst on fixed-overhead-dominated queries, which points at the JVM config
change (G1 region size / ergonomics shift with heap) plus ambient load
rather than any plan regression. This tool attributes it: it runs the
SAME legacy-23 query set under each heap in fresh JVMs, INTERLEAVED
(A B A B ...) so ambient drift hits both arms equally, and writes
``heap_ab.json`` at the repo root. ``bench.py`` merges that file into
``bench_detail.json`` so the A/B travels with the round's bench artifact.

Usage: python tools/heap_ab.py [trials_per_arm]   (default 2)
       python tools/heap_ab.py --worker 8g        (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the 23 queries every prior round pinned (bench.py HEADLINE before the
# round-13 flagship additions) — the set the +14.4% was measured on
LEGACY23 = [
    "lql_contains", "lql_tail", "lql_format", "show_partitions",
    "pricing_summary", "revenue_by_segment", "revenue_by_nation",
    "top_orders_per_customer", "events_hourly", "dedup_exact",
    "dedup_lsh_candidates", "dedup_near_duplicates", "dedup_simhash_pairs",
    "text_stats", "text_top_words", "ann_cosine_topk", "ann_bucketed_topk",
    "dedup_embedding", "parse_k8json", "events_sessions", "events_asof",
    "events_range_join", "training_pipeline",
]


def worker(heap: str) -> None:
    """One fresh-JVM bench pass at ``heap``: warm every query once, then
    min-of-3 per query — the exact pinned protocol, minus ingest (the
    question is query wall time vs heap, and ingest doubles the trial)."""
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
    import __spark_entry__ as entry_mod
    from logrange_spark import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name=f"heap-ab-{heap}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    for name in LEGACY23:  # warm pass (untimed)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings = {}
    for name in LEGACY23:
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        timings[name] = min(runs)
    print("HEAP_AB_WORKER " + json.dumps(
        {"heap": heap, "total": round(sum(timings.values()), 3),
         "queries": timings}))
    spark.stop()


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
        return 0
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    order = []
    for _ in range(trials):
        order += ["8g", "24g"]
    results = []
    for i, heap in enumerate(order):
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", heap],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines()
                if l.startswith("HEAP_AB_WORKER ")]
        if not line:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"worker {heap} produced no result line")
        rec = json.loads(line[-1].split(" ", 1)[1])
        rec["trial"] = i
        rec["wall_sec"] = round(time.time() - t0, 1)
        results.append(rec)
        print(json.dumps({"trial": i, "heap": heap,
                          "total": rec["total"]}), flush=True)
    by = {}
    for r in results:
        by.setdefault(r["heap"], []).append(r["total"])
    summary = {
        h: {"totals": v, "min": min(v),
            "median": sorted(v)[len(v) // 2] if len(v) % 2
            else round((sorted(v)[len(v) // 2 - 1]
                        + sorted(v)[len(v) // 2]) / 2, 3)}
        for h, v in by.items()
    }
    ratio = round(min(by["24g"]) / min(by["8g"]), 3) if (
        "8g" in by and "24g" in by) else None
    out = {
        "protocol": {"warm": True, "n_runs": 3, "agg": "min",
                     "interleaved": "ABAB", "set": "legacy23",
                     "fresh_jvm_per_trial": True, "ingest": False},
        "trials": results,
        "summary": summary,
        "ratio_24g_over_8g_min": ratio,
    }
    with open(os.path.join(REPO, "heap_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("HEAP_AB " + json.dumps(
        {"summary": summary, "ratio_24g_over_8g_min": ratio}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
