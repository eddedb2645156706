"""Chunk-catalog scale measurement (round-8 verdict item #6).

Builds a synthetic catalog of ``$SPARK_GRAFT_CAT_CHUNKS`` chunks (default
100k across 200 srcs) in the Engine's on-disk format — sharded snapshot
plus a partially-replayed delta log — then measures what the 100 TB story
depends on:

- boot: full Engine construction time (snapshot shard load + log replay)
  and the driver RSS delta of holding the catalog;
- compaction stall: time of one _compact_chunk_log with a SMALL dirty
  set (the per-src sharding means this must be O(dirty), not O(catalog));
- SHOW PARTITIONS correctness over the synthetic catalog (count + record
  totals vs ground truth) and latency.

Prints one JSON line. No Spark job touches the catalog paths — only
SHOW PARTITIONS spins the session.
"""

from __future__ import annotations

import json
import os
import random
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHUNKS = int(os.environ.get("SPARK_GRAFT_CAT_CHUNKS", "100000"))
N_SRCS = int(os.environ.get("SPARK_GRAFT_CAT_SRCS", "200"))


def build(root: str) -> dict:
    """Write a synthetic sharded catalog + a 50k-line pending delta log."""
    from logrange_spark.model.schema import src_for_tag_line

    state = os.path.join(root, "state")
    shards = os.path.join(state, "chunks.d")
    os.makedirs(shards)
    rng = random.Random(7)
    base = 1_700_000_000_000_000_000
    per_src = N_CHUNKS // N_SRCS
    catalog, truth = {}, {}
    for s in range(N_SRCS):
        tagl = f"name=svc{s}"
        src = src_for_tag_line(tagl)
        catalog[src] = tagl
        d = {}
        for c in range(per_src):
            t0 = base + c * 3600 * 10**9
            d[f"batch-{s:04d}{c:06d}{'ab' * 12}.parquet"] = {
                "records": rng.randrange(1_000, 100_000),
                "size": rng.randrange(10**6, 10**8),
                "min_ts": t0,
                "max_ts": t0 + 3599 * 10**9,
            }
        truth[src] = d
        with open(os.path.join(shards, f"{src}.json"), "w") as f:
            json.dump(d, f)
        # describe_many intersects the catalog with the directory listing
        # (self-healing contract), so the chunk files must exist — empty
        # placeholders suffice: known names are never footer-read
        part_dir = os.path.join(root, "logs", f"src={src}")
        os.makedirs(part_dir)
        for name in d:
            os.close(os.open(os.path.join(part_dir, name),
                             os.O_CREAT | os.O_WRONLY, 0o644))
    with open(os.path.join(state, "catalog.json"), "w") as f:
        json.dump(catalog, f)
    # a pending log: half adds-overwriting-existing, half fresh adds —
    # the shape a crash leaves behind
    log_lines = []
    srcs = sorted(truth)
    for i in range(50_000):
        src = srcs[i % N_SRCS]
        name = f"log-{i:08d}.parquet"
        entry = {
            "records": 10, "size": 1000,
            "min_ts": base, "max_ts": base + 10**9,
        }
        truth[src][name] = entry
        log_lines.append(json.dumps({"src": src, "chunk": name, **entry}))
        os.close(os.open(os.path.join(root, "logs", f"src={src}", name),
                         os.O_CREAT | os.O_WRONLY, 0o644))
    with open(os.path.join(state, "chunks.jsonl"), "w") as f:
        f.write("\n".join(log_lines) + "\n")
    with open(os.path.join(state, "seq.json"), "w") as f:
        json.dump({}, f)
    return truth


def main() -> int:
    from logrange_spark import Engine, build_session

    root = tempfile.mkdtemp(prefix="lrspark-catscale-")
    out: dict = {"n_chunks": N_CHUNKS, "n_srcs": N_SRCS, "log_lines": 50_000}
    try:
        truth = build(root)
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # x100/sf0.1-scale entry point; library default is 8g
        spark = build_session(shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.time()
        eng = Engine(spark, root)
        out["boot_sec"] = round(time.time() - t0, 3)
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        out["catalog_rss_mb"] = round((rss1 - rss0) / 1024, 1)
        live = sum(len(v) for v in eng._chunk_stats.values())
        assert live == sum(len(v) for v in truth.values()), (live, "truth mismatch")
        out["live_chunks"] = live

        # all-dirty compaction first (the worst case / legacy migration —
        # the boot replay above marked every logged src dirty)
        with eng._write_lock:
            eng._dirty_srcs = set(eng._chunk_stats)
            t0 = time.time()
            eng._compact_chunk_log()
            out["compact_all_dirty_sec"] = round(time.time() - t0, 3)
        # steady-state compaction: only 2 srcs dirty — the per-src
        # sharding contract says this must be O(dirty), not O(catalog)
        some = sorted(truth)[:2]
        with eng._write_lock:
            eng._dirty_srcs = set(some)
            eng._chunk_log_lines = 1
            t0 = time.time()
            eng._compact_chunk_log()
            out["compact_small_dirty_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        parts = eng.execute("SHOW PARTITIONS").collect()
        out["show_partitions_sec"] = round(time.time() - t0, 3)
        got = {r["tag_line"]: r["records"] for r in parts}
        from logrange_spark.model.schema import src_for_tag_line

        want = {
            f"name=svc{s}": sum(
                e["records"] for e in truth[src_for_tag_line(f"name=svc{s}")].values()
            )
            for s in range(N_SRCS)
        }
        assert got == want, "SHOW PARTITIONS mismatch"
        out["show_partitions_ok"] = True

        # second boot after close(): log folded, replay-free
        eng.close()
        t0 = time.time()
        eng2 = Engine(spark, root)
        out["reboot_after_close_sec"] = round(time.time() - t0, 3)
        assert sum(len(v) for v in eng2._chunk_stats.values()) == live
        assert eng2._chunk_log_lines == 0
        eng2.close()
        spark.stop()
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
