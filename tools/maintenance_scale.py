"""Wall-clock datapoints for the corpus-maintenance job.

Bootstraps the streaming capstone state over a scaled documents table
(the accumulated-streamed-corpus stand-in), then runs
streaming/maintenance.maintain_cc_corpus with the capstone's
deterministic doc_id%97 benchmark slice and records the report + wall.

Usage:
  python tools/maintenance_scale.py          # x10 (50k docs)
  python tools/maintenance_scale.py x100     # 500k docs (existence proof)

Writes/updates maintenance_scale.json at the repo root (the x100 run
lands under the "x100" key).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    import scale_proof
    # the ONE C4-passing page wrapper + the shared JSON merge protocol
    from cc_stream_rate import _merge_out, _pages
    from logrange_spark import build_session
    from logrange_spark.streaming.cc_ingest import bootstrap_cc_corpus
    from logrange_spark.streaming.maintenance import maintain_cc_corpus

    scale = sys.argv[1] if len(sys.argv) > 1 else "x10"
    spark = build_session(app_name="maintenance-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if scale == "x100":
        import cc_x100_proof

        corpus_dir = cc_x100_proof.build_corpus(spark)
        n_buckets = 64
    else:
        _x1, corpus_dir = scale_proof.build(spark)
        n_buckets = 16
    name, root = "mscale", tempfile.mkdtemp(prefix="lr-maint-scale-")
    out: dict = {"scale": scale}
    try:
        for t in ("fps", "fp_members", "fp_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
        seed = _pages(
            spark.read.parquet(f"{corpus_dir}/documents.parquet")
            .select("doc_id", "text")
        )
        out["corpus_docs_in"] = seed.count()
        t0 = time.time()
        bootstrap_cc_corpus(
            spark, seed, name, f"{root}/{name}", ["casino"],
            gopher_kw={"min_words": 8, "min_stopword_hits": 0,
                       "max_symbol_word_ratio": 1.0},
            max_hamming=3, n_buckets=n_buckets,
            min_docs=3, min_doc_frac=0.05,
        )
        out["bootstrap_sec"] = round(time.time() - t0, 1)
        docs = spark.read.parquet(f"{root}/{name}_docs")
        bench = docs.where(F.col("doc_id") % 97 == 0).select(
            "doc_id", "text"
        ).localCheckpoint()
        out["bench_docs"] = bench.count()
        t0 = time.time()
        report = maintain_cc_corpus(
            spark, name, f"{root}/{name}", benchmark=bench,
            max_hamming=3, n_buckets=n_buckets,
        )
        out["maintenance"] = report
        out["maintenance_wall_sec"] = round(time.time() - t0, 1)
        out["fps_rows_after"] = spark.table(f"{name}_fps").count()
        out["members_after"] = spark.table(f"{name}_fp_members").count()
    finally:
        for t in ("fps", "fp_members", "fp_ids"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
        shutil.rmtree(root, ignore_errors=True)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "maintenance_scale.json",
    )
    # one shared merge protocol (cc_stream_rate._merge_out): x100 lands
    # under its own block, the x10 datapoint merges at the top level —
    # each preserves the other across reruns
    _merge_out("x100" if scale == "x100" else None, out, path=path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
