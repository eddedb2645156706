"""Bench a subset of headline queries under bench.py's exact protocol
(3 runs, min-of-warm, noop-format write). Usage:

    python tools/bench_subset.py dedup_lsh_candidates dedup_embedding ...

Prints one JSON line {name: min_sec, ...} plus the raw runs.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __spark_entry__ as entry_mod
    from logrange_spark import build_session

    names = sys.argv[1:] or ["dedup_lsh_candidates", "dedup_near_duplicates",
                             "dedup_simhash_pairs", "dedup_embedding",
                             "training_pipeline"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # x100/sf0.1-scale entry point; library default is 8g
    spark = build_session(app_name="logrange-spark-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.groupBy("n_regionkey").count().write.format("noop").mode("overwrite").save()

    # retired registry rows still bench as headline members
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    out, runs_out = {}, {}
    for name in names:
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = min(runs)
        runs_out[name] = runs
    print(json.dumps({"queries": out, "runs": runs_out, "total": round(sum(out.values()), 3)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
