"""Offline shard-rebalance drill at the 10M-row store.

Builds a 2-shard store with 10M rows across 20 srcs (the follow_scale
store size), reopens it at 4 shards, and runs
``shard.rebalance_shards`` — the admin job that moves every src to its
pure-hash home after growth. Reports plan size, bytes/files moved,
move wall, and verifies row-identity (count + order-insensitive
checksum of (ts, src, seq)) before/after.

Usage: python tools/rebalance_drill.py [rows] [srcs]
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

    from logrange_spark import Engine, build_session
    from logrange_spark import shard as sh

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_srcs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = build_session(app_name="rebalance-drill")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="lr-rebalance-drill-")
    NS = 10**9
    base = 1_700_000_000 * NS
    per_src = rows // n_srcs
    batch = 50_000
    out: dict = {"rows": rows, "srcs": n_srcs, "grow": "2->4"}
    try:
        engines = [Engine(spark, sh.shard_root(root, i)) for i in range(2)]
        router = sh.ShardRouter(engines)
        t0 = time.time()
        for j in range(n_srcs):
            tags = {"name": f"drill{j}", "ns": "prod"}
            for b0 in range(0, per_src, batch):
                n = min(batch, per_src - b0)
                recs = [
                    (base + (b0 + k) * 1000, f"drill {j}/{b0 + k} payload", {})
                    for k in range(n)
                ]
                router.write(tags, recs)
        out["ingest_sec"] = round(time.time() - t0, 1)
        for e in engines:
            e.close()

        def fingerprint():
            df = sh.read_shard_logs(spark, root).select("ts", "src", "seq")
            r = df.agg(
                F.count("*").alias("n"),
                # decimal sum: a long sum of 10M xxhash64 values
                # overflows under ANSI mode
                F.sum(
                    F.xxhash64("ts", "src", "seq").cast("decimal(38,0)")
                ).alias("h"),
            ).collect()[0]
            return r["n"], r["h"]

        before = fingerprint()
        engines = [Engine(spark, sh.shard_root(root, i)) for i in range(4)]
        dry = sh.rebalance_shards(engines, dry_run=True)
        out["planned_moves"] = len(dry["moves"])
        out["planned_bytes"] = dry["bytes_moved"]
        t0 = time.time()
        rep = sh.rebalance_shards(engines)
        out["move_wall_sec"] = round(time.time() - t0, 2)
        out["bytes_moved"] = rep["bytes_moved"]
        out["files_moved"] = rep["files_moved"]
        out["mb_per_sec"] = round(
            rep["bytes_moved"] / (1 << 20) / max(out["move_wall_sec"], 1e-9), 1
        )
        after = fingerprint()
        out["row_identity"] = before == after
        out["rows_before"], out["rows_after"] = before[0], after[0]
        # post-check: every src at its pure-hash home
        out["homed"] = all(
            sh.shard_of(src, 4) == i
            for i, e in enumerate(engines)
            for src in e._catalog
        )
        for e in engines:
            e.close()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "rebalance_drill.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
