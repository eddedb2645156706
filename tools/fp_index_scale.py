"""x1/x10 scale datapoints for the persisted fingerprint index
(persist_corpus_fingerprints / hamming_near_pairs_against).

Builds the scale_proof x1/x10 corpora, simhash64-fingerprints each,
persists the x-scale corpus index ONCE, then probes it with a derived
"next crawl" (every 10th document re-fingerprinted from lightly edited
text, so planted near-dups exist). Reports persist and probe wall
times (min of 3 warm runs) plus pair counts, and asserts the probe
plan reads the corpus bucketed.

Usage: python tools/fp_index_scale.py  → one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import scale_proof
    from pyspark.sql import functions as F

    from logrange_spark import build_session
    from logrange_spark.ops import dedup

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = build_session(app_name="logrange-spark-fp-index-scale")
    spark.sparkContext.setLogLevel("ERROR")
    x1, x10 = scale_proof.build(spark)
    wh = tempfile.mkdtemp(prefix="fpidx-")
    for sf_dir, label in ((x1, "x1"), (x10, "x10")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n = docs.count()
        fp = dedup.simhash(docs, "doc_id", "text", bits=64)
        name = f"fpidx_{label}"
        t0 = time.time()
        fps_t, members_t, ids_t = dedup.persist_corpus_fingerprints(
            spark, fp, name, f"{wh}/{name}", max_hamming=3
        )
        persist_s = round(time.time() - t0, 3)
        # next crawl: every 10th doc, one word appended (near-dup of its
        # corpus original), plus the raw text of every 17th (exact dup)
        new_docs = docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" trailing crawl token")).alias(
                "text"
            ),
        )
        nfp = dedup.simhash(new_docs, "doc_id", "text", bits=64)
        runs, pairs = [], 0
        for _ in range(3):
            t0 = time.time()
            pairs = dedup.hamming_near_pairs_against(
                nfp, fps_t, members_t, max_hamming=3
            ).count()
            runs.append(round(time.time() - t0, 3))
        plan = (
            dedup.hamming_near_pairs_against(nfp, fps_t, members_t)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Bucketed: true") >= 2, plan
        print(json.dumps({
            "scale": label,
            "corpus_docs": n,
            "persist_sec": persist_s,
            "probe_sec": min(runs),
            "probe_runs": runs,
            "pairs": pairs,
        }))
        for t in (f"{name}_fps", f"{name}_fp_members", f"{name}_fp_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
