"""Streaming stateful dedup (applyInPandasWithState) — beyond-reference;
the reference's pipes keep no record state (pkg/pipe/worker.go:48-104)."""

import json
import os
import time


def test_stateful_dedupe_across_batches(spark, tmp_path):
    """Two files processed as separate micro-batches (maxFilesPerTrigger=1):
    a key admitted in batch 0 must be suppressed in batch 1 via the state
    store, and within a batch only the first occurrence survives."""
    from logrange_spark.streaming.stateful import stateful_dedupe

    src_dir = tmp_path / "dedup_in"
    src_dir.mkdir()
    b0 = [
        {"k": "a", "v": 1},
        {"k": "a", "v": 2},  # within-batch duplicate → dropped
        {"k": "b", "v": 3},
    ]
    b1 = [
        {"k": "a", "v": 4},  # cross-batch duplicate → dropped by state
        {"k": "c", "v": 5},
    ]
    (src_dir / "0.json").write_text("\n".join(json.dumps(r) for r in b0))
    (src_dir / "1.json").write_text("\n".join(json.dumps(r) for r in b1))
    # the file source orders batches by modification time — pin it so
    # batch 0 really is 0.json
    os.utime(src_dir / "0.json", (time.time() - 60, time.time() - 60))

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    q = (
        stateful_dedupe(stream, ["k"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert got == {"a": 1, "b": 3, "c": 5}
