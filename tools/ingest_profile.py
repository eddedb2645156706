"""Split-timing profile of the ingest write path (VERDICT r12 #7).

The sustained multi-writer bench (bench.py `_bench_ingest`) measures
~235k rec/s (r12) against the reference's "millions of records per
second" README claim. This tool attributes the cost: it times each
phase of `Engine.write` in isolation over the exact bench workload
shape (2,500-row batches, (ts, msg, {}) tuples), then runs the full
4-writer sustained drill for the end-to-end number.

Phases:
  normalize   — python/pyarrow row normalization (GIL-bound)
  seq_save    — seq high-water JSON persist (under the global lock)
  chunk_write — pyarrow table build + parquet write (releases the GIL)
  catalog     — chunk-stats record + chunk-log append (global lock)

Usage: python tools/ingest_profile.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = 1_706_745_600_000_000_000
BATCH = 2_500
N_BATCHES = 80


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from logrange_spark import Engine, build_session
    from logrange_spark.ingest.writer import normalize_batch

    spark = build_session(app_name="ingest-profile")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lrspark-ingest-prof-")
    eng = Engine(spark, root)

    def mkrecs(b: int):
        return [(BASE + (b * BATCH + i) * 1000, f"sus 0/{b}/{i} payload", {})
                for i in range(BATCH)]

    # ---- phase timings (single thread, no contention)
    recs = [mkrecs(b) for b in range(N_BATCHES)]
    tags = {"name": "prof"}

    t0 = time.perf_counter()
    batches = [normalize_batch(tags, None, r, eng.seq_state) for r in recs]
    t_norm = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(N_BATCHES):
        eng.seq_state.save()
    t_seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    stats = [eng._write_chunk_file(batches[0].src, b) for b in batches]
    t_chunk = time.perf_counter() - t0

    t0 = time.perf_counter()
    with eng._write_lock:
        eng._register_partition(batches[0].src, batches[0].tag_line)
        eng._record_chunks(batches[0].src, stats)
    t_cat = time.perf_counter() - t0

    n = N_BATCHES * BATCH
    phases = {
        "normalize_sec": round(t_norm, 3),
        "normalize_rows_per_sec": round(n / t_norm),
        "seq_save_sec": round(t_seq, 3),
        "chunk_write_sec": round(t_chunk, 3),
        "chunk_write_rows_per_sec": round(n / t_chunk),
        "catalog_sec": round(t_cat, 3),
        "single_thread_total_sec": round(t_norm + t_seq + t_chunk + t_cat, 3),
        "single_thread_rows_per_sec": round(
            n / (t_norm + t_seq + t_chunk + t_cat)
        ),
    }

    # ---- end-to-end sustained drill (the bench shape: 4 writers,
    # 80 batches each into their own source, autocompaction live)
    from concurrent.futures import ThreadPoolExecutor

    sus = []
    for w in range(4):
        for b in range(80):
            sus.append(({"name": f"sus{w}"},
                        [(BASE + (b * BATCH + i) * 1000,
                          f"sus {w}/{b}/{i} payload", {})
                         for i in range(BATCH)]))
    per_writer = [sus[w * 80:(w + 1) * 80] for w in range(4)]

    def drain(bs):
        for t, r in bs:
            eng.write(t, r)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(drain, per_writer))
    swall = time.perf_counter() - t0
    sus_n = sum(len(r) for _, r in sus)
    out = {
        "phases_single_thread": phases,
        "sustained_records": sus_n,
        "sustained_sec": round(swall, 3),
        "sustained_records_per_sec": round(sus_n / swall),
    }
    print("INGEST_PROFILE " + json.dumps(out))
    eng.close()
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
