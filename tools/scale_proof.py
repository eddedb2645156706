"""Scale proof: the top-cost operators must scale ~linearly in rows.

Builds an sf1-equivalent documents corpus (10x the sf0.1 one, ~50k docs)
and times the three most expensive headline operators at 1x vs 10x. The
claim under test is the VERDICT's: every pair-finding path is blocked
(LSH bands / simhash bands), so wall time per row should stay roughly
flat at 10x — a quadratic operator would blow up ~100x.

The 10x corpus is 10 replicas of the base corpus with a per-replica
Caesar shift applied to the text (``F.translate``): token structure,
lengths and within-replica duplicate structure are preserved exactly, but
tokens differ ACROSS replicas, so the true near-dup pair count scales
linearly (10x), not quadratically — i.e. the workload itself is scaled,
not degenerate.

Usage:  python tools/scale_proof.py   (prints one JSON line per scale)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/lrspark-scale"
REPLICAS = 10
# (query, table it scales over) — documents for the text dedup path,
# embeddings for the vector path (its sign-bucket blocked self-join is
# the other place a quadratic could hide)
QUERIES = [
    ("dedup_lsh_candidates", "documents"),
    ("dedup_simhash_pairs", "documents"),
    ("training_pipeline", "documents"),
    ("dedup_embedding", "embeddings"),
    ("ann_bucketed_topk", "embeddings"),
]
ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def shifted(k: int) -> str:
    lo, up = ALPHA[:26], ALPHA[26:]
    return lo[k:] + lo[:k] + up[k:] + up[:k]


def build(spark) -> tuple[str, str]:
    x1 = os.path.join(WORK, "x1")
    x10 = os.path.join(WORK, "x10")
    os.makedirs(x1, exist_ok=True)
    for table in ("documents", "embeddings"):
        link = os.path.join(x1, f"{table}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE_SF, f"{table}.parquet"), link)

    docs_out = os.path.join(x10, "documents.parquet")
    if not os.path.exists(docs_out):
        docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
        n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                F.translate(F.col("text"), ALPHA, shifted(k)).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for k in range(REPLICAS)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(8).write.mode("overwrite").parquet(docs_out)

    emb_out = os.path.join(x10, "embeddings.parquet")
    if not os.path.exists(emb_out):
        emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
        n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        dim = len(emb.select("embedding").first()[0])
        # per-replica rotation of the vector preserves norms and ALL
        # intra-replica distances (the duplicate structure scales
        # linearly) while cross-replica vectors land in different sign
        # buckets; replica 0 is the identity so the fixed vec_id<10 ANN
        # query set is untouched
        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                (
                    F.concat(
                        F.slice("embedding", k + 1, dim - k),
                        F.slice("embedding", 1, k),
                    )
                    if k
                    else F.col("embedding")
                ).alias("embedding"),
                "label",
            )
            for k in range(REPLICAS)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(8).write.mode("overwrite").parquet(emb_out)
    return x1, x10


def run(spark, sf_dir: str, label: str) -> dict:
    qs = entry.queries()
    counts = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        for t in ("documents", "embeddings")
    }
    res = {"scale": label, "rows": counts, "queries": {}}
    for name, table in QUERIES:
        nrows = counts[table]
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        best = min(runs)
        res["queries"][name] = {
            "sec": best,
            "sec_per_1k_rows": round(best / (nrows / 1000.0), 4),
            "runs": runs,
        }
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name}@{label}: cartesian!"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}@{label}: BNLJ!"
    return res


def main() -> int:
    from logrange_spark import build_session

    spark = build_session(app_name="logrange-spark-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")
    x1, x10 = build(spark)
    # warm the JVM/readers so x1 isn't charged the startup cost
    spark.read.parquet(f"{x1}/documents.parquet").count()
    for sf_dir, label in ((x1, "x1"), (x10, "x10")):
        print(json.dumps(run(spark, sf_dir, label)))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
