"""Decompose per-query wall time into build / analyze+optimize / execute.

For each headline query: time (a) the Python-side DataFrame construction
(fn call — py4j round trips + analyzer), (b) explain (optimization), and
(c) the noop-write execution, plus the executed job/stage counts from the
status tracker. Reveals whether a slow bench row is driver-bound (a+b) or
execution-bound (c), and how many sequential stage barriers it pays.

Usage: python tools/time_decompose.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import bench
    import __spark_entry__ as entry_mod
    from logrange_spark import build_session

    names = sys.argv[1:] or list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = build_session(app_name="logrange-spark-time-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.groupBy("n_regionkey").count().write.format("noop").mode("overwrite").save()

    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    out = {}
    for name in names:
        fn = qs[name]
        # warm (fixture build, codegen cache, scan cache)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(3):
            tracker = sc.statusTracker()
            jobs_before = len(tracker.getJobIdsForGroup() or [])
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.schema  # force analysis
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            rec = {
                "build_s": round(t1 - t0, 3),
                "analyze_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        # job/stage count for one run
        jdf = fn(spark, sf_dir)
        before_jobs = sc._jsc.sc().dagScheduler().nextJobId()
        before_stages = sc._jsc.sc().dagScheduler().nextStageId()
        jdf.write.format("noop").mode("overwrite").save()
        after_jobs = sc._jsc.sc().dagScheduler().nextJobId()
        after_stages = sc._jsc.sc().dagScheduler().nextStageId()
        def _n(x):
            return x if isinstance(x, int) else x.get()
        best["jobs"] = _n(after_jobs) - _n(before_jobs)
        best["stages"] = _n(after_stages) - _n(before_stages)
        out[name] = best
        print(name, json.dumps(best), flush=True)
    print("DECOMPOSE " + json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
