"""Sharded multi-process ingest drill (round 13).

The single-process sustained writer is GIL-bound near ~600k rec/s
(tools/ingest_profile.py split timings: ~0.3 µs/row normalize +
~1.3 µs/row Arrow/parquet encode share one CPython interpreter). The
reference's "millions of records per second" README claim describes its
MULTI-NODE regime — logrange shards partitions across ingestor hosts.
This drill measures the PySpark-native analogue (logrange_spark/shard.py):

- N worker PROCESSES, each owning one shard store (the store flock
  enforces single-writer-per-shard), each running the exact pinned
  sustained workload shape per writer thread (2,500-row batches,
  live auto-compaction, same record payloads as bench.py's ingest
  block), with partition→shard assignment done by the real router
  hash (shard_for_tags) — not hand-placed.
- The parent releases all workers from a barrier AFTER their Spark
  sessions and engines are built (JVM startup is deploy cost, not
  ingest cost), times the drain wall, then opens the union query view
  (read_shard_logs) and verifies NOTHING was lost or doubled: total
  count, per-src row count == seq high-water (contiguity), and
  distinct (src, seq) == total.

Usage: python tools/ingest_shard_scale.py [n_shards] [batches_per_writer]
Writes shard_scale.json and prints one SHARD_SCALE json line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = 1_706_745_600_000_000_000
BATCH = 2_500
WRITERS = 4  # per process — the pinned bench shape


def _assign_tagsets(n_shards: int) -> list[list[dict]]:
    """WRITERS tag sets per shard, chosen by the REAL router hash over a
    generated partition-name stream (first-fit until every shard has
    its quota) — the honest form of 'a router sends each partition to
    its shard'."""
    from logrange_spark.shard import shard_for_tags

    per = [[] for _ in range(n_shards)]
    i = 0
    while any(len(p) < WRITERS for p in per):
        tags = {"name": f"part-{i:04d}"}
        s = shard_for_tags(tags, n_shards)
        if len(per[s]) < WRITERS:
            per[s].append(tags)
        i += 1
    return per


def _worker(idx: int, root: str, tagsets: list[dict], n_batches: int,
            barrier, q) -> None:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "6g"
    sys.path.insert(0, REPO)
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from logrange_spark import Engine, build_session
    from logrange_spark.shard import shard_root

    spark = build_session(app_name=f"shard-ingest-{idx}", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, shard_root(root, idx))

    # pre-barrier warm-up on a THROWAWAY store: first-use costs
    # (pyarrow parquet writer init, allocator growth, import tails)
    # are deploy cost, not steady-state ingest — the single-process
    # profile tool is warm the same way before its sustained drill
    wroot = tempfile.mkdtemp(prefix=f"lrshard-warm-{idx}-")
    weng = Engine(spark, wroot)
    for b in range(10):
        weng.write({"name": "warm"}, [
            (BASE + (b * BATCH + i) * 1000, f"warm {b}/{i} payload", {})
            for i in range(BATCH)
        ])
    weng.close()
    shutil.rmtree(wroot, ignore_errors=True)

    # pre-build every record OUTSIDE the timed region, exactly like the
    # pinned single-process protocol (ingest_profile.py): the drill
    # times Engine.write — in production records arrive off the wire,
    # their construction is not the engine's cost
    per_writer = [
        [
            (tags, [
                (BASE + (b * BATCH + i) * 1000,
                 f"sus {tags['name']}/{b}/{i} payload", {})
                for i in range(BATCH)
            ])
            for b in range(n_batches)
        ]
        for tags in tagsets
    ]

    def drain(batches):
        for tags, recs in batches:
            eng.write(tags, recs)

    barrier.wait()
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=WRITERS) as ex:
        list(ex.map(drain, per_writer))
    wall = time.perf_counter() - t0
    # report the drain wall BEFORE close/stop: engine close (waits for
    # in-flight compaction) and JVM teardown are lifecycle cost, not
    # ingest cost — the single-process protocol times the drain only
    q.put({"shard": idx, "rows": len(tagsets) * n_batches * BATCH,
           "wall_sec": round(wall, 3)})
    eng.close()
    spark.stop()


def main() -> int:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    root = tempfile.mkdtemp(prefix="lrspark-shards-")
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_shards + 1)
    q = ctx.Queue()
    per = _assign_tagsets(n_shards)
    procs = [
        ctx.Process(target=_worker,
                    args=(i, root, per[i], n_batches, barrier, q))
        for i in range(n_shards)
    ]
    for p in procs:
        p.start()

    # the parent IS the query tier: build its session while the worker
    # JVMs come up, then serve LQL tail reads over the union view for
    # the whole drain — on one box this CONTENDS with the writers
    # (deployed, the query node is separate hardware), so the measured
    # latencies are a worst-case bound
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "8g"
    import queue as _queue

    from pyspark.sql import functions as F

    from logrange_spark import build_session
    from logrange_spark.shard import ShardReader, read_shard_logs

    spark = build_session(app_name="shard-query-tier")
    spark.sparkContext.setLogLevel("ERROR")

    barrier.wait()  # every worker's JVM + engine is up
    t0 = time.perf_counter()
    reader = ShardReader(spark, root)
    probe = per[0][0]["name"]
    lat, results = [], []
    while len(results) < len(procs):
        try:
            results.append(q.get_nowait())
            continue
        except _queue.Empty:
            pass
        t = time.perf_counter()
        rows = reader.query(
            f"SELECT FROM {{name={probe}}} POSITION tail OFFSET -5 LIMIT 5"
        ).collect()
        lat.append(time.perf_counter() - t)
        del rows
    parent_wall = time.perf_counter() - t0
    for p in procs:
        p.join()
    lat.sort()
    live_query = {
        "n": len(lat),
        "p50_ms": round(lat[len(lat) // 2] * 1000, 1) if lat else None,
        "p99_ms": round(lat[int(len(lat) * 0.99)] * 1000, 1) if lat else None,
        "max_ms": round(lat[-1] * 1000, 1) if lat else None,
    }

    total = sum(r["rows"] for r in results)
    # all workers leave the same barrier together, so the aggregate
    # drain wall is the SLOWEST worker's drain (parent_wall additionally
    # carries queue latency and is reported as the sanity upper bound)
    wall = max(r["wall_sec"] for r in results)
    out = {
        "n_shards": n_shards,
        "writers_per_shard": WRITERS,
        "batch_rows": BATCH,
        "batches_per_writer": n_batches,
        "total_rows": total,
        "wall_sec": wall,
        "parent_wall_sec": round(parent_wall, 3),
        "records_per_sec": round(total / wall),
        "per_shard": sorted(results, key=lambda r: r["shard"]),
        "live_query_tail_during_drain": live_query,
    }

    # idle-box floor for the same tail read (writers done): the gap to
    # the live numbers is CPU contention — 1+N JVMs share one box here;
    # deployed, the query tier is separate hardware
    idle = []
    for _ in range(5):
        t = time.perf_counter()
        reader.query(
            f"SELECT FROM {{name={probe}}} POSITION tail OFFSET -5 LIMIT 5"
        ).collect()
        idle.append(time.perf_counter() - t)
    idle.sort()
    out["idle_query_tail_after_drain"] = {
        "n": len(idle),
        "p50_ms": round(idle[len(idle) // 2] * 1000, 1),
        "min_ms": round(idle[0] * 1000, 1),
    }

    # ---- read-side verification on the union view
    reader.close()
    logs = read_shard_logs(spark, root)
    n = logs.count()
    per_src = logs.groupBy("src").agg(
        F.count("*").alias("n"), F.max("seq").alias("mx"),
        F.count_distinct("seq").alias("nd"),
    ).collect()
    contiguous = all(r["n"] == r["mx"] == r["nd"] for r in per_src)
    expect_per_src = n_batches * BATCH
    out["verify"] = {
        "union_count": n,
        "count_matches": n == total,
        "n_srcs": len(per_src),
        "per_src_rows": expect_per_src,
        "seq_contiguous_all_srcs": contiguous
        and all(r["n"] == expect_per_src for r in per_src),
    }
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)

    # merge into the artifact keyed by shard count, so one file carries
    # the whole scaling curve across invocations
    path = os.path.join(REPO, "shard_scale.json")
    doc = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except ValueError:
            doc = {}
    runs = {r["n_shards"]: r for r in doc.get("runs", []) if "n_shards" in r}
    runs[n_shards] = out
    doc = {"runs": [runs[k] for k in sorted(runs)]}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("SHARD_SCALE " + json.dumps(out))
    return 0 if out["verify"]["count_matches"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
