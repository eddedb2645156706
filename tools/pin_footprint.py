"""Storage/spill footprint of the r16 localCheckpoint pins (VERDICT r16 #2).

The r16 optimization round's central device pins corpus-derived frames
(MinHash/SimHash signature tables, token arrays, the capstone's gated/
survivor/scored frames) in executor block storage via lazy
``localCheckpoint``. This tool measures what those pins actually hold,
per query, at the x10 dedup block's scale (and the capstone at sf0.1 /
optionally x10):

- ``pinned_mem_bytes`` / ``pinned_disk_bytes``: the block-manager bytes
  of every checkpoint RDD alive at the end of one noop-sink run (the
  DataFrame is held referenced until after the read, so lazy-checkpoint
  blocks are still registered);
- ``shuffle_write_bytes``: total shuffle bytes the same run wrote — the
  quantity each pin is traded against (a pin that exceeds the shuffles
  it removes should be revisited);
- ``spill_mem_bytes`` / ``spill_disk_bytes``: execution-memory spill in
  the run (heavy spill would mean the pins pressure execution memory).

Usage: python tools/pin_footprint.py [x10|sf] [query ...]
  x10 (default): dedup_near_duplicates, dedup_lsh_candidates,
  dedup_simhash64_pairs, semantic_dedup on the x10 corpus (the bench's
  own x10 block), plus training_pipeline/cc_pipeline at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

X10_ROWS = [
    "dedup_near_duplicates",
    "dedup_lsh_candidates",
    "dedup_simhash64_pairs",
    "semantic_dedup",
]
SF_ROWS = ["training_pipeline", "cc_pipeline", "dedup_simhash_pairs"]


def _stage_seq(spark, store):
    """All stages via AppStatusStore.stageList — Spark 4's signature is
    (statuses, details, withSummaries, quantiles, taskStatus); pass the
    explicit empty defaults (py4j cannot use Scala default args)."""
    jvm = spark._jvm
    empty = jvm.java.util.Collections.emptyList()
    quantiles = spark.sparkContext._gateway.new_array(jvm.double, 0)
    return store.stageList(empty, False, False, quantiles, empty)


def _stage_totals(spark, store, since_stage: int) -> dict:
    it = _stage_seq(spark, store).iterator()
    sw = sp_m = sp_d = 0
    n = 0
    while it.hasNext():
        s = it.next()
        if s.stageId() < since_stage:
            continue
        n += 1
        sw += s.shuffleWriteBytes()
        sp_m += s.memoryBytesSpilled()
        sp_d += s.diskBytesSpilled()
    return {
        "stages": n,
        "shuffle_write_bytes": sw,
        "spill_mem_bytes": sp_m,
        "spill_disk_bytes": sp_d,
    }


def _max_stage(spark, store) -> int:
    it = _stage_seq(spark, store).iterator()
    mx = -1
    while it.hasNext():
        mx = max(mx, it.next().stageId())
    return mx


def measure(spark, fn, sf_dir: str) -> dict:
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    store = spark._jsparkSession.sparkContext().statusStore()
    # warm (fixture build, codegen) — its checkpoint blocks are released
    # when the warm frame is GC'd below
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    import gc

    gc.collect()
    sc._jvm.System.gc()
    time.sleep(1.0)
    base_rdds = {
        i.id(): (i.memSize(), i.diskSize())
        for i in jsc.getRDDStorageInfo()
    }
    stage0 = _max_stage(spark, store) + 1
    t0 = time.time()
    df = fn(spark, sf_dir)  # hold the reference: pins stay registered
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 2)
    mem = disk = 0
    n_pins = 0
    for i in jsc.getRDDStorageInfo():
        if i.id() in base_rdds:
            continue
        n_pins += 1
        mem += i.memSize()
        disk += i.diskSize()
    out = {
        "wall_s": wall,
        "pinned_rdds": n_pins,
        "pinned_mem_bytes": mem,
        "pinned_disk_bytes": disk,
        **_stage_totals(spark, store, stage0),
    }
    del df
    gc.collect()
    return out


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    import bench  # noqa: F401  (path setup parity)
    import __spark_entry__ as entry_mod
    import scale_proof

    from logrange_spark import build_session

    spark = build_session(app_name="logrange-spark-pin-footprint")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    _x1, x10 = scale_proof.build(spark)

    out: dict = {"x10": {}, "sf0.1": {}}
    for name in X10_ROWS:
        fn = (
            scale_proof.EXTRA_QUERIES[name][0]
            if name in scale_proof.EXTRA_QUERIES
            else qs[name]
        )
        out["x10"][name] = measure(spark, fn, x10)
        print(name, json.dumps(out["x10"][name]), flush=True)
    for name in SF_ROWS:
        out["sf0.1"][name] = measure(spark, qs[name], sf_dir)
        print(name, json.dumps(out["sf0.1"][name]), flush=True)
    print("PIN_FOOTPRINT " + json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
