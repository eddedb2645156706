"""Per-stage wall-time attribution for the cc_pipeline capstone.

For each named cumulative stage of ``__spark_entry__._cc_stages`` the
stage output is force-materialized from a FRESH build (so lazy
localCheckpoints never leak work between measurements), giving the
cumulative wall per stage; the marginal column is the first
difference. Runs at the scale_proof x10 corpus (50k docs) by default;
pass a directory to override.

Usage: python tools/cc_stage_timing.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    import __spark_entry__ as entry

    from logrange_spark import build_session

    spark = build_session(app_name="logrange-spark-cc-stage-timing")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    else:
        import scale_proof

        _x1, sf_dir = scale_proof.build(spark)

    names = [n for n, _ in entry._cc_stages(spark, sf_dir)]
    # warm pass: fixture build + JVM/codegen out of the measurements
    entry._cc_stages(spark, sf_dir)[-1][1].write.format("noop").mode(
        "overwrite"
    ).save()

    cumulative = {}
    for i, name in enumerate(names):
        t0 = time.monotonic()
        # fresh build per measurement: each call mints its own (lazy)
        # checkpoints, so stage k pays its full prefix
        entry._cc_stages(spark, sf_dir)[i][1].write.format("noop").mode(
            "overwrite"
        ).save()
        cumulative[name] = round(time.monotonic() - t0, 2)
    marginal = {}
    prev = 0.0
    for name in names:
        marginal[name] = round(cumulative[name] - prev, 2)
        prev = cumulative[name]
    print(json.dumps({
        "sf_dir": sf_dir,
        "cumulative_sec": cumulative,
        "marginal_sec": marginal,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
