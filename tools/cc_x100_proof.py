"""x100 (500k-page) datapoint for the FULL cc_pipeline capstone.

Builds a 500k-doc corpus by the sf1_sweep recipe (per-replica token
prefix — replicas near-dup-disjoint so the true pair answer scales
linearly) EXCEPT that the Gopher stop words stay unprefixed: the
capstone's quality gate requires a stop-word hit, and prefixing
everything would flunk replicas 1..99 wholesale at the gate — the
downstream stages would then only ever see the 5k base docs. Keeping
the 8 stop words intact preserves the gate's pass behavior per replica
while shingles (which span prefixed content words) remain ~disjoint
across replicas.

The corpus serializes through the capstone's own WARC fixture builder
(500 .warc.gz files — CommonCrawl's many-small-shards layout, one gzip
member per task) and the 11-stage pipeline runs end to end: URL
keep-best → HTML extraction → C4 line rules → boilerplate →
Gopher/blocklist gates → MinHash near-dup → repeated-span removal →
8-gram decontamination → PII redaction → LM terciles → shards.

Reports fixture-build and pipeline walls plus the survivor count and
bucket distribution. One run (this is a decade-scale existence proof,
not a min-of-3 latency row).

Usage: python tools/cc_x100_proof.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_corpus(spark) -> str:
    """Build (or reuse) the 500k-doc x100 corpus directory: sf0.1
    documents replicated 100x with per-replica token prefixes, Gopher
    stop words left intact (see the module docstring). Returns the
    directory whose documents.parquet holds the corpus — shared by the
    capstone proof below and tools/maintenance_scale.py's x100 mode."""
    import sf1_sweep
    from pyspark.sql import functions as F

    from logrange_spark.ops.text import GOPHER_STOPWORDS

    x100 = os.path.join(sf1_sweep.WORK, "x100cc")
    os.makedirs(x100, exist_ok=True)
    out_path = os.path.join(x100, "documents.parquet")
    if not os.path.exists(out_path):
        docs = spark.read.parquet(
            f"{sf1_sweep.BASE_SF}/documents.parquet"
        )
        n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        stop_alt = "|".join(GOPHER_STOPWORDS)
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"),
                    rf"\b(?!(?:{stop_alt})\b)(\S+)",
                    f"r{k}_$1",
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for k in range(sf1_sweep.REPLICAS)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(64).write.mode("overwrite").parquet(out_path)
    return x100


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from logrange_spark import build_session

    spark = build_session(app_name="logrange-spark-cc-x100")
    spark.sparkContext.setLogLevel("ERROR")

    x100 = build_corpus(spark)
    n_docs = spark.read.parquet(
        os.path.join(x100, "documents.parquet")
    ).count()

    # fixture build (content-addressed; a re-run reuses it)
    t0 = time.monotonic()
    d = entry._fixture_dir(
        "ccpipe",
        [
            entry._cc_fixture_bytes(c)
            for c in entry._chunked(entry._doc_rows(spark, x100))
        ],
    )
    fixture_s = round(time.monotonic() - t0, 1)
    n_files = sum(1 for f in os.listdir(d) if f.endswith(".warc.gz"))

    t0 = time.monotonic()
    out = entry._q_cc_pipeline(spark, x100)
    dist = {
        r["bucket"]: r["n"]
        for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    wall = round(time.monotonic() - t0, 1)
    print(json.dumps({
        "scale": "x100",
        "docs": n_docs,
        "warc_files": n_files,
        "fixture_build_sec": fixture_s,
        "pipeline_wall_sec": wall,
        "survivors": sum(dist.values()),
        "buckets": dist,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
