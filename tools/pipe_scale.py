"""Pipe at store scale with a mid-stream kill/restart (VERDICT r12 #6).

Drains 10M rows from four source partitions through ONE pipe into its
destination partition, kills the streaming query mid-drain the way a
crash would land (stop + delete the newest checkpoint commit marker, so
Spark REDELIVERS the last batch on restart), restarts it, and verifies
exactly-once delivery: destination row count == source row count ==
distinct (provenance src, seq) pairs — nothing lost, nothing doubled.

MAX_FILES_PER_TRIGGER is lowered for the run so the drain spans enough
micro-batches for the kill to interrupt real work.

Writes ``pipe_scale.json`` at the repo root; prints one JSON line.

Usage: python tools/pipe_scale.py [--trigger N] [--no-kill]
  --trigger N   maxFilesPerTrigger (default 8 — many batches so the kill
                interrupts real work; use 64 for the production-shape
                throughput number)
  --no-kill     skip the crash/restart (pure throughput run)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STORE = os.environ.get("SPARK_GRAFT_PIPE_STORE", "/tmp/lrspark_scale/pipe10m")
N_SRC = 4
ROWS_PER_SRC = 2_500_000
BATCH = 5_000
BASE = 1_700_000_000 * 10**9


def load(engine) -> float:
    from concurrent.futures import ThreadPoolExecutor

    def one(p: int) -> None:
        tags = {"name": "psrc", "shard": str(p)}
        for b in range(ROWS_PER_SRC // BATCH):
            base = BASE + (b * BATCH) * 10**6
            engine.write(
                tags,
                [(base + i * 10**6, f"s{p} b{b} r{i} payload", {})
                 for i in range(BATCH)],
            )

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(one, range(N_SRC)))
    deadline = time.time() + 300
    while time.time() < deadline:
        with engine._write_lock:
            pending, engine._autocompact_pending = (
                set(engine._autocompact_pending), set())
        if pending:
            engine._maybe_autocompact(sorted(pending))
        if not pending and not engine._autocompact_running:
            break
        time.sleep(0.5)
    return time.time() - t0


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from logrange_spark import Engine, build_session
    from logrange_spark.pipes import service
    from logrange_spark.pipes.service import PROV_SEQ, PROV_SRC, start_pipe

    trigger = 8  # enough micro-batches for the kill to interrupt work
    if "--trigger" in sys.argv:
        trigger = int(sys.argv[sys.argv.index("--trigger") + 1])
    do_kill = "--no-kill" not in sys.argv
    service.MAX_FILES_PER_TRIGGER = trigger

    spark = build_session(app_name="pipe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(STORE):
        shutil.rmtree(STORE)
    os.makedirs(STORE, exist_ok=True)
    eng = Engine(spark, STORE)
    build_sec = load(eng)
    total_src = N_SRC * ROWS_PER_SRC

    from pyspark.sql import functions as F
    from logrange_spark.model.schema import src_for_tag_line
    from logrange_spark.model.tags import tag_line
    from logrange_spark.pipes.service import pipe_tags

    dest_src = src_for_tag_line(tag_line(pipe_tags("p10m")))
    dest_dir = os.path.join(STORE, "logs", f"src={dest_src}")

    def dest_count() -> int:
        if not os.path.isdir(dest_dir):
            return 0
        try:
            return spark.read.parquet(dest_dir).count()
        except Exception:
            return 0

    t_start = time.time()
    assert eng.execute("CREATE PIPE p10m FROM {name=psrc}")["status"] == "created"

    # ---- kill mid-drain: wait for real progress, then crash the query
    killed_at = None
    while do_kill:
        c = dest_count()
        if c >= total_src:
            break  # drained before we could kill (won't happen at 8 fpt)
        if c >= total_src // 4:
            killed_at = c
            q = eng._pipe_queries.pop("p10m")
            q.stop()
            # crash shape: offsets written, appends possibly landed, the
            # newest COMMIT marker lost → Spark redelivers that batch
            commits = os.path.join(eng.pipes_dir, "checkpoints", "p10m",
                                   "commits")
            live = sorted(
                (f for f in os.listdir(commits) if not f.startswith(".")),
                key=lambda f: int(f),
            )
            if live:
                os.remove(os.path.join(commits, live[-1]))
                crc = os.path.join(commits, f".{live[-1]}.crc")
                if os.path.exists(crc):
                    os.remove(crc)
            break
        time.sleep(1.0)

    if killed_at is not None:
        eng._pipe_queries["p10m"] = start_pipe(eng, eng._pipes["p10m"])

    # ---- drain to completion
    stable, last = 0, -1
    deadline = time.time() + 1800
    while time.time() < deadline:
        c = dest_count()
        if c == last and c >= total_src:
            stable += 1
            if stable >= 3:
                break
        else:
            stable = 0
        last = c
        time.sleep(2.0)
    drain_sec = time.time() - t_start

    dest = spark.read.parquet(dest_dir)
    n_dest = dest.count()
    n_pairs = (
        dest.select(
            F.col("fields").getItem(PROV_SRC).alias("s"),
            F.col("fields").getItem(PROV_SEQ).alias("q"),
        )
        .distinct()
        .count()
    )
    out = {
        "source_rows": total_src,
        "dest_rows": n_dest,
        "distinct_provenance_pairs": n_pairs,
        "exactly_once": bool(n_dest == total_src == n_pairs),
        "killed_and_restarted_at_rows": killed_at,
        "build_sec": round(build_sec, 1),
        "drain_sec": round(drain_sec, 1),
        "drain_rows_per_sec": round(total_src / drain_sec),
        "max_files_per_trigger": service.MAX_FILES_PER_TRIGGER,
    }
    suffix = "" if do_kill else "_nokill"
    with open(os.path.join(REPO, f"pipe_scale{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("PIPE_SCALE " + json.dumps(out))
    eng.close()
    spark.stop()
    return 0 if out["exactly_once"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
