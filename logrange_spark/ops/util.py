"""Shared helpers for the ops package."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Ensure enough partitions for CPU-bound expansion stages.

    Small inputs (a single parquet file, a collected dimension) arrive as
    1-2 partitions and would serialize an explode/hash stage onto one
    core. Repartition those up to the cluster's default parallelism.

    The input width is probed via ``inputFiles()`` — pure scan metadata,
    no ``.rdd`` conversion (which would force physical planning outside
    AQE). At scale a parquet input has ≥ parallelism files and this is a
    no-op — no shuffle on the 100 TB path. (A few-huge-files input may
    get one unneeded shuffle; Spark would have split those files anyway.
    Non-file inputs — in-memory test frames — report 0 files and are
    repartitioned, which is always cheap for them.)
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0
    if width * min_factor <= target:
        return df.repartition(target)
    return df
