"""Per-stage metrics for one headline query, via the Spark UI REST API.

Runs the query once warm + once measured with the UI enabled, then dumps
each executed stage's wall, task time, shuffle read/write bytes, input
bytes and GC — the section-7.1 'which stage is slow and why' view the
bench's single wall number can't give.

Usage: python tools/stage_profile.py <query> [more queries...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __spark_entry__ as entry_mod
    from logrange_spark import build_session

    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = build_session(
        app_name="logrange-spark-stage-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"

    def rest(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.loads(r.read())

    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.groupBy("n_regionkey").count().write.format("noop").mode("overwrite").save()

    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        stages_before = {s["stageId"] for s in rest("/stages")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        stages = [
            s for s in rest("/stages")
            if s["stageId"] not in stages_before and s["status"] == "COMPLETE"
        ]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(stages)} stages ===")
        tot_run = sum(s.get("executorRunTime", 0) for s in stages)
        print(f"  total executorRunTime {tot_run/1000:.2f}s (sum over tasks)")
        for s in stages[:14]:
            sub = (
                time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                if s.get("submissionTime")
                else None
            )
            print(
                "  stage {id:>4} tasks={n:>3} run={run:>7.2f}s gc={gc:>5.2f}s "
                "in={inp:>9} sr={sr:>9} sw={sw:>9} wall≈{w} | {desc}".format(
                    id=s["stageId"],
                    n=s.get("numCompleteTasks", 0),
                    run=s.get("executorRunTime", 0) / 1000,
                    gc=s.get("jvmGcTime", 0) / 1000,
                    inp=s.get("inputBytes", 0),
                    sr=s.get("shuffleReadBytes", 0),
                    sw=s.get("shuffleWriteBytes", 0),
                    w=_stage_wall(s),
                    desc=(s.get("description") or s.get("name", ""))[:80],
                )
            )
    spark.stop()
    return 0


def _stage_wall(s) -> str:
    try:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f"
        a = datetime.strptime(s["firstTaskLaunchedTime"][:-3], fmt)
        b = datetime.strptime(s["completionTime"][:-3], fmt)
        return f"{(b - a).total_seconds():.2f}s"
    except Exception:
        return "?"


if __name__ == "__main__":
    raise SystemExit(main())
