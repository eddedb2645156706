"""Dump .explain("formatted") for headline/registry queries to files.

Usage: python tools/explain_dump.py OUTDIR [query ...]

Writes OUTDIR/<query>.txt for each named query (default: every bench
HEADLINE row). Plans are captured from the same tuned session bench.py
uses, so Exchange counts / join strategies match what the bench runs.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import bench
    import __spark_entry__ as entry_mod
    from logrange_spark import build_session

    outdir = sys.argv[1]
    names = sys.argv[2:] or list(bench.HEADLINE)
    os.makedirs(outdir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = build_session(app_name="logrange-spark-explain-dump")
    spark.sparkContext.setLogLevel("ERROR")

    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
