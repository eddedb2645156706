"""Embedding-side x100 stress (round 12): 200k vectors.

Companion to tools/sf1_sweep.py for the vector operators: replicate the
sf0.1 embeddings 100× and run the ANN/semantic dedup family looking for
the failure class the documents-side sweep caught (a data-scaled frame
broadcast off a bad size estimate → executor OOM) plus occupancy bugs.

The per-replica transform is cyclic-shift ⊗ deterministic sign flips:
a plain shift collides at 100 replicas (dim = 64, so replicas k and
k+64 would transform identically and every base vector would reappear
as an exact cross-replica duplicate); composing with a per-replica ±1
diagonal keeps the transform orthogonal (norms and ALL intra-replica
distances exact) while making the 100 transforms distinct. Replica 0 is
the identity so the fixed vec_id<10 query sets are untouched.
Flip signs are exactly representable, so float×(±1) is lossless and the
cast back to float[] preserves the schema bit-for-bit.

k for SemDeDup scales with the corpus (occupancy n/k ≈ 125 held, the
convention SCALE.md documents) → k = 1600 at 200k vectors, which forces
the numpy/Arrow assignment path (a literal-expression codebook is
infeasible at that k).

Usage: python tools/emb_x100_stress.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/lrspark_scale")
REPLICAS = 100


def _flips(k: int, dim: int) -> list[float]:
    if k == 0:
        return [1.0] * dim
    return [
        1.0 if hashlib.md5(f"r{k}c{i}".encode()).digest()[0] & 1 else -1.0
        for i in range(dim)
    ]


def build_x100(spark) -> str:
    out = os.path.join(WORK, "x100", "embeddings.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for k in range(REPLICAS):
        s = k % dim
        shifted = (
            F.concat(
                F.slice("embedding", s + 1, dim - s),
                F.slice("embedding", 1, s),
            )
            if s
            else F.col("embedding")
        )
        flips = F.array(*[F.lit(f) for f in _flips(k, dim)])
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                F.zip_with(shifted, flips, lambda a, b: a * b)
                .cast("array<float>")
                .alias("embedding"),
                "label",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(64).write.mode("overwrite").parquet(out)
    return out


def main() -> None:
    from logrange_spark import build_session
    from logrange_spark.ops import ann

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # x100/sf0.1-scale entry point; library default is 8g
    spark = build_session(app_name="emb-x100-stress")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(build_x100(spark))
    n_vecs = emb.count()

    t0 = time.monotonic()
    pairs = ann.embedding_near_duplicates(emb, threshold=0.95).count()
    t1 = time.monotonic()
    print(
        json.dumps(
            {
                "query": "dedup_embedding",
                "scale": "x100",
                "n_vecs": n_vecs,
                "out_rows": pairs,
                "wall_first_sec": round(t1 - t0, 1),
            }
        ),
        flush=True,
    )

    k = max(16, n_vecs // 125)
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.where(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    t2 = time.monotonic()
    drops = ann.semantic_dedup_drops(
        emb, cents, threshold=0.97, assign="numpy"
    ).count()
    t3 = time.monotonic()
    print(
        json.dumps(
            {
                "query": "semantic_dedup",
                "scale": "x100",
                "n_vecs": n_vecs,
                "k": k,
                "out_rows": drops,
                "wall_first_sec": round(t3 - t2, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
