"""Shared helpers for the ops package."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Ensure enough partitions for CPU-bound expansion stages.

    Small inputs (a single parquet file, a collected dimension) arrive as
    1-2 partitions and would serialize an explode/hash stage onto one
    core. Repartition those up to the cluster's default parallelism. At
    scale the input already has ≥ parallelism partitions and this is a
    no-op — no shuffle is added on the 100 TB path.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
