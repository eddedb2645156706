"""One-off sf1-equivalent sweep for the output-size-bound rows.

`dedup_simhash_pairs` and `repeated_spans` scale with their OUTPUT
(pair volume / repeated-window volume), so their 1x/10x walls look
steep; this sweep adds a ~500k-doc (~28M-token) datapoint so the
linear-in-output story is checked at two decades, not one.

The x100 table replicates the sf0.1 documents with a TOKEN-PREFIX
transform (`rK_` on every token) instead of scale_proof's Caesar shift:
the shift alphabet has only 52 rotations, so k and k+52 would collide
into full cross-replica duplicates at 100 replicas; a per-replica token
prefix keeps token identity bijective within a replica (duplicate and
near-dup structure exact) and token sets fully disjoint across
replicas (true answer scales linearly).

Usage: python tools/sf1_sweep.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/lrspark_scale")
REPLICAS = 100


def build_x100(spark) -> str:
    x100 = os.path.join(WORK, "x100")
    os.makedirs(x100, exist_ok=True)
    out = os.path.join(x100, "documents.parquet")
    if not os.path.exists(out):
        docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
        n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), r"(\S+)", f"r{k}_$1"
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for k in range(REPLICAS)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(64).write.mode("overwrite").parquet(out)
    return x100


def main() -> None:
    from logrange_spark import build_session
    from logrange_spark.ops import dedup

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = build_session(app_name="sf1-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    x100 = build_x100(spark)
    docs = spark.read.parquet(f"{x100}/documents.parquet")
    n_docs = docs.count()

    for name, make in (
        (
            "dedup_simhash_pairs",
            lambda: dedup.simhash_near_pairs(
                docs, "doc_id", "text", max_hamming=3
            ),
        ),
        (
            "repeated_spans",
            lambda: dedup.repeated_spans(docs, "doc_id", "text"),
        ),
    ):
        out_rows = make().count()
        walls = []
        for _ in range(runs):
            t0 = time.monotonic()
            make().write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 2))
        print(
            json.dumps(
                {
                    "query": name,
                    "scale": "x100",
                    "n_docs": n_docs,
                    "out_rows": out_rows,
                    "wall_sec": min(walls),
                    "runs": walls,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
