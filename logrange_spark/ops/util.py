"""Shared helpers for the ops package."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, min_factor: int = 2, by: str | None = None) -> DataFrame:
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

    ``by`` names a well-distributed key column to HASH-repartition on
    instead of round-robin: keyless ``repartition(n)`` first pays a
    local sort of the input (sortBeforeRepartition, guide §2.5 — the
    retry-determinism sort), which is measurable on wide rows feeding
    cheap consumers (lineitem aggregate A/B: 0.92 → 0.55 s min-of-6
    interleaved); a hash partitioning on a high-cardinality key is
    deterministic under retry by construction and skips the sort.
    Callers must pick a key with far more distinct values than
    partitions (guide §2.5). Value-identical either way — only row
    placement changes.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0
    if width * min_factor <= target:
        if by is not None:
            return df.repartition(target, F.col(by))
        return df.repartition(target)
    return df


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Skew-busting equi-join: spread a hot key over ``salts`` shuffle
    partitions.

    Left rows get a deterministic salt from their full row content
    (xxhash64 — reproducible, no RNG); right rows are replicated once per
    salt. The join key becomes (key, salt), so a key that dominated one
    shuffle partition now lands on ``salts`` of them, at the cost of a
    ``salts``× blow-up of the (small) right side.

    AQE's skew-join split (on by default in build_session) handles most
    cases at runtime; use this when AQE can't — a stateful/streaming
    stage, or a skewed key known in advance. Result is identical to a
    plain ``left.join(right, on, how)`` for inner/left-flavored joins
    ONLY: right/full joins would emit each unmatched right row once per
    salt replica, so they are rejected outright.
    """
    # normalize like Spark's JoinType does (case-insensitive, underscores
    # stripped) so every Spark-valid left-flavored spelling passes
    if how.lower().replace("_", "") not in (
        "inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"
    ):
        raise ValueError(
            f"salted_join supports inner/left-flavored joins only, got {how!r}: "
            "unmatched right rows would be replicated once per salt"
        )
    if salts < 2:
        return left.join(right, on, how)
    l_s = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts))
    )
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return l_s.join(r_s, [on, "__salt"], how).drop("__salt")


def persist_bucketed(
    spark, df, name: str, path: str, n_buckets: int, key: str | list[str]
):
    """One write-time shuffle into a ``key``-bucketed catalog table;
    subsequent joins on ``key`` read co-located buckets with no Exchange
    (the write-once-shuffle-never pattern, plan-asserted in
    tests/test_bucketing.py). Shared by the ANN corpus tables, the
    incremental-dedup LSH tables and the persisted KN model. A LIST key
    buckets by the composite — co-partition requires the bucket spec to
    cover ALL of a join's keys (requireAllClusterKeysForCoPartition), so
    pass exactly the join's key set."""
    keys = [key] if isinstance(key, str) else list(key)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return spark.table(name)
