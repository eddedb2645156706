"""One-off sf1-equivalent sweep for the output-size-bound rows.

`dedup_simhash_pairs` and `repeated_spans` scale with their OUTPUT
(pair volume / repeated-window volume), so their 1x/10x walls look
steep; this sweep adds a ~500k-doc (~28M-token) datapoint so the
linear-in-output story is checked at two decades, not one.

At this scale the 16-bit simhash saturates (hamming ≤ 3 captures
697/2^16 ≈ 1.1% of the entire code space, so unrelated docs pair up
~n²/2 · 1.1% times); its exact output is computed analytically from
the 65,536-bin fingerprint histogram, and the timed runs use the
64-bit fingerprint (`bits=64`, Manku/Jain/Sarma WWW'07) — the layout
that holds at web scale.

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


def simhash16_exact_pairs(spark, docs) -> dict:
    """EXACT hamming ≤ 3 pair count of the 16-bit operator at x100,
    computed from the full fingerprint histogram instead of the pair
    join: with only 2¹⁶ possible fingerprints the answer is
    Σ_{popcount(d)∈1..3} c·c[idx⊕d] / 2 + Σ C(c,2) over the 65,536-bin
    exact histogram — the same number ``simhash_near_pairs.count()``
    returns, in seconds instead of hours. (The pair join itself was
    killed after 1,800 s at this scale: 4-bit band buckets hold
    n/16 ≈ 31k reps each, so the join generates ~n²/16 candidates AND
    the true output is ~n²/2 · 697/2¹⁶ — the fingerprint is past its
    envelope, which is the point of this datapoint.)"""
    import numpy as np
    from logrange_spark.ops import dedup

    t0 = time.monotonic()
    hist = (
        dedup.simhash(docs, "doc_id", "text", bits=16)
        .groupBy("simhash")
        .count()
        .collect()
    )
    c = np.zeros(1 << 16, dtype=np.float64)
    for r in hist:
        c[int(r["simhash"])] = r["count"]
    idx = np.arange(1 << 16)
    deltas = [
        d for d in range(1, 1 << 16) if bin(d).count("1") <= 3
    ]
    cross = sum(float((c * c[idx ^ d]).sum()) for d in deltas) / 2.0
    same = float((c * (c - 1) / 2.0).sum())
    return {
        "query": "dedup_simhash_pairs",
        "scale": "x100",
        "out_rows_exact": int(cross + same),
        "hist_wall_sec": round(time.monotonic() - t0, 2),
        "pair_join_wall": "killed at 1800s (saturated; see SCALE.md)",
    }


def main() -> None:
    from logrange_spark import build_session
    from logrange_spark.ops import dedup

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # x100/sf0.1-scale entry point; library default is 8g
    spark = build_session(app_name="sf1-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    x100 = build_x100(spark)
    docs = spark.read.parquet(f"{x100}/documents.parquet")
    n_docs = docs.count()

    print(json.dumps(simhash16_exact_pairs(spark, docs)), flush=True)

    for name, make in (
        # the 64-bit fingerprint (Manku/Jain/Sarma WWW'07) — the scale
        # path: at 16 bits UNRELATED docs collide at hamming ≤ 3 with
        # p = 697/2^16 ≈ 1.1%, so both candidates and TRUE output grow
        # ~n²/2 · 1.1% past ~10^5 docs; at 64 bits that p is ~2e-15 and
        # output stays the planted near-dup volume (linear here).
        (
            "dedup_simhash_pairs_64",
            lambda: dedup.simhash_near_pairs(
                docs, "doc_id", "text", max_hamming=3, bits=64
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
