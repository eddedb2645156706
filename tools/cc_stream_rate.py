"""Sustained throughput of the streaming cc capstone
(streaming/cc_ingest.start_cc_ingest_stream).

Bootstraps the persisted model state from the sf0.01 documents table,
then streams the sf0.1 documents (deduplicated against the seed and
each other by the fingerprint index) through the full per-shard stack
— gates → boilerplate → fingerprint probe → redact → LM score →
bucket — as N parquet shard files, and reports end-to-end docs/sec
from first shard landing to last survivor committed.

Usage: python tools/cc_stream_rate.py [n_shards] [input_parquet]

``input_parquet`` defaults to the sf0.1 documents table (5k docs);
pass the scale_proof x10 table (50k docs) to measure real
CommonCrawl-sized shards — the fixed per-micro-batch cost (~12 s of
job rounds across the six stages) amortizes with shard size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    from logrange_spark import build_session
    from logrange_spark.streaming.cc_ingest import (
        bootstrap_cc_corpus,
        start_cc_ingest_stream,
    )

    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = build_session(app_name="cc-stream-rate")
    spark.sparkContext.setLogLevel("ERROR")
    name = "ccrate"
    for t in ("fps", "fp_members"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{t}")
    root = tempfile.mkdtemp(prefix="lr-cc-stream-rate-")
    gop = {"min_words": 8, "min_stopword_hits": 0,
           "max_symbol_word_ratio": 1.0}
    out: dict = {"n_shards": n_shards}
    try:
        # the synthetic documents are single unpunctuated lines, which
        # C4's line rules reject wholesale; wrap each doc as a 3-line
        # C4-passing page (each line ends in a terminal period and
        # carries stop words), same text per line so cross-doc
        # fingerprint distances are untouched
        def pages(df):
            line = F.concat(
                F.lit("the content of this page is "),
                F.col("text"),
                F.lit(" and that must be the end."),
            )
            return df.select(
                "doc_id",
                F.concat_ws("\n", line, line, line).alias("text"),
            )

        seed = pages(
            spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .select("doc_id", "text")
        )
        t0 = time.time()
        bootstrap_cc_corpus(
            spark, seed, name, f"{root}/{name}", ["casino"],
            gopher_kw=gop, max_hamming=3, n_buckets=16,
            min_docs=3, min_doc_frac=0.05,
        )
        out["bootstrap_sec"] = round(time.time() - t0, 1)
        out["seed_docs"] = seed.count()

        # incoming corpus: sf0.1 documents with REMAPPED ids so the
        # replay guard doesn't collide with seed ids (sf0.1 embeds the
        # sf0.01 rows — those stream docs are true near-dups and the
        # index correctly drops them)
        in_path = (
            sys.argv[2]
            if len(sys.argv) > 2
            else "/root/testdata/sf0.1/documents.parquet"
        )
        incoming = pages(
            spark.read.parquet(in_path)
            .select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                "text",
            )
        )
        n_in = incoming.count()
        out["stream_docs"] = n_in
        inp = f"{root}/incoming"
        os.makedirs(inp, exist_ok=True)
        q = start_cc_ingest_stream(
            spark, inp, name, f"{root}/{name}", f"{root}/ckpt",
            "doc_id long, text string", ["casino"], gopher_kw=gop,
            max_hamming=3, max_files_per_trigger=1,
        )
        try:
            t0 = time.time()
            incoming.repartition(n_shards).write.mode("append").parquet(inp)

            # recentProgress is a RING (last ~100 updates) — summing it
            # directly under-counts once batches outnumber the buffer;
            # accumulate per batchId instead (r15 review finding)
            seen: dict = {}

            def processed():
                for pr in q.recentProgress:
                    seen[pr["batchId"]] = pr["numInputRows"]
                return sum(seen.values())

            deadline = time.time() + 1200
            while processed() < n_in and time.time() < deadline:
                time.sleep(1.0)
                if q.exception():
                    raise RuntimeError(str(q.exception()))
            # drain the trailing commit
            time.sleep(3.0)
            wall = time.time() - t0
            out["stream_wall_sec"] = round(wall, 1)
            out["docs_per_sec"] = round(n_in / wall)
            surv = spark.read.parquet(f"{root}/{name}_docs")
            out["corpus_docs"] = surv.count()
            out["buckets"] = {
                r["bucket"]: r["n"]
                for r in surv.groupBy("bucket").agg(
                    F.count("*").alias("n")
                ).collect()
            }
        finally:
            q.stop()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "cc_stream_rate.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
