"""SparkSession helpers with scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "logrange-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create a SparkSession with the engine's default tuning.

    Defaults are chosen to hold at cluster scale: AQE on (runtime
    coalescing + skew-join handling), generous broadcast threshold for the
    dimension tables, UTC session time so timestamp rendering is
    deterministic, and Arrow enabled for the few pandas-UDF paths.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet TIMESTAMP(NANOS) → LongType epoch-ns (matches the log
        # schema's ts; Spark otherwise refuses nanosecond parquet columns)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # a concurrent TRUNCATE may delete chunk files between a query's
        # planning and execution; readers skip them instead of failing
        # (the reference serializes this with journal refcounts —
        # pkg/partition/partition.go; stateless readers just tolerate it)
        .config("spark.sql.files.ignoreMissingFiles", "true")
        # FAIR job scheduling: the engine runs maintenance (background
        # auto-compaction, pipe micro-batches) concurrently with
        # interactive reads in ONE SparkContext; under the default FIFO
        # scheduler a 1-task tail-follow probe queues behind a 32-task
        # compaction stage (measured: multi-second follow p99 spikes at
        # a busy 10M-row store). FAIR round-robins task slots across
        # jobs, so tiny reads land while big jobs run — on a cluster
        # this is the same knob that keeps ad-hoc queries responsive
        # next to ETL. Sequential single-job workloads are unaffected.
        .config("spark.scheduler.mode", "FAIR")
        # local[32] runs 32 concurrent tasks inside ONE driver JVM, so
        # this heap is the whole cluster's executor memory. The LIBRARY
        # default stays a conservative 8g so build_session starts on any
        # reasonable host; memory-hungry entry points (bench.py, the
        # tools/ x100 sweeps — where 8g = 0.25 GB/task starved KN
        # order-5 aggregation and broadcast reads in round 12) export
        # SPARK_GRAFT_DRIVER_MEM=24g themselves instead of baking a
        # 128 GiB-sandbox assumption into every downstream session.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
