"""kn_order5_ppl wall attribution: model BUILD vs scoring, x1 vs x10.

SCALE.md blames the 2.1x 10x wall on the model build's eager
localCheckpoint barriers; this splits the measurement so the claim is
data, not narrative, and measures what the KenLM-style ``min_count``
pruning knob buys at the same scales.

Usage: python tools/kn_split_timing.py
Prints one JSON line per (scale, variant).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(spark, sf_dir: str, label: str, min_count) -> dict:
    from logrange_spark.ops import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.monotonic()
    model = T.kn_ngram_lm(docs, order=5, min_count=min_count)
    t1 = time.monotonic()
    top_rows = model["counts"][5].count()
    t1b = time.monotonic()
    df = T.kn_ngram_score(docs, model)
    t2 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    t3 = time.monotonic()
    return {
        "scale": label,
        "min_count": min_count if isinstance(min_count, int) else dict(min_count),
        "t_build_sec": round(t1 - t0, 2),
        "t_score_plan_sec": round(t2 - t1b, 2),
        "t_score_exec_sec": round(t3 - t2, 2),
        "top_order_rows": top_rows,
    }


def main() -> None:
    import scale_proof

    from logrange_spark import build_session

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # x100/sf0.1-scale entry point; library default is 8g
    spark = build_session(app_name="kn-split-timing")
    spark.sparkContext.setLogLevel("ERROR")
    x1, x10 = scale_proof.build(spark)
    spark.read.parquet(f"{x1}/documents.parquet").count()  # warm
    for label, d in (("x1", x1), ("x10", x10)):
        for mc in (1, {5: 2}):
            print(json.dumps(run(spark, d, label, mc)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
