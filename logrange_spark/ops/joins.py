"""Temporal join operators: as-of join and keyed range (interval) join.

The reference engine has no joins at all (the full LQL grammar is
/root/reference/pkg/lql/parser.go:91-198; the execution surface is
cursor + fiterator + mixer only — see SURVEY.md §2.8). These are
beyond-reference operators that large-scale event/training-data
pipelines need constantly (enrich each event with the latest preceding
state; correlate events within a time window).

Scale design
- ``asof_join`` is union + ONE window pass: both sides shuffle once on
  the key columns, a per-key sort lets ``last(..., ignorenulls=True)``
  carry the latest preceding right row to every left row.  The naive
  formulation (equi-join, then per-left-row argmax) shuffles the big
  side twice and explodes on hot keys; the window form keeps O(1)
  running state per key and AQE can split a skewed key's partition
  because rows stay (key, time)-sorted.  No Python UDFs — the whole
  plan is whole-stage-codegen'd.
- ``range_join`` keeps the equality part of the condition in the join
  keys (hash / sort-merge join) and leaves only the interval predicate
  as a residual filter, so Spark never falls back to a broadcast
  nested-loop cross product.  For the key-less case, block both sides
  into coarse time buckets first (each right row duplicated into the
  neighbouring bucket) and join on the bucket id — same residual trick.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join", "range_join_buckets"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    values: Sequence[str] = (),
    tolerance: int | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_ts <= left_ts`` and equal ``on`` keys (backward as-of,
    exact matches allowed — pandas ``merge_asof`` semantics).

    Unmatched left rows keep NULL value columns.  ``tolerance`` (same
    unit as the ts columns) drops matches older than
    ``left_ts - tolerance``.  ``tie_break`` names a right column that
    deterministically orders right rows sharing (key, ts) — the largest
    wins; without it ties are resolved arbitrarily.

    Returns all left columns plus one ``asof_<v>`` column per requested
    right value column.
    """
    on = list(on)
    values = list(values)
    bad = [c for c in on + [left_ts] if c not in left.columns]
    if bad:
        raise ValueError(f"left side missing columns {bad}")

    # Right rows carry their payload in one struct so a single
    # last(ignorenulls) can't mix fields from different source rows
    # (and a legitimately-NULL value field doesn't fall through to an
    # older row).
    rrow = F.struct(
        F.col(right_ts).cast("long").alias("__rts"),
        *[F.col(v).alias(v) for v in values],
    )
    rrow_type = right.select(rrow.alias("x")).schema["x"].dataType

    tie = (
        F.col(tie_break).cast("long")
        if tie_break is not None
        else F.lit(0).cast("long")
    )
    r = right.select(
        *on,
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        rrow.alias("__rrow"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in on],
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )

    # __side orders right rows before left at equal ts => exact matches
    # visible; __tie makes duplicate (key, ts) right rows deterministic.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__rrow", ignorenulls=True).over(w)
    if tolerance is not None:
        matched = F.when(
            matched["__rts"] >= F.col("__ts") - F.lit(int(tolerance)), matched
        )

    out = (
        l.unionByName(r.select(*l.columns))
        .withColumn("__m", matched)
        .where(F.col("__side") == 1)
    )
    return out.select(
        *left.columns,
        *[F.col("__m")[v].alias(f"asof_{v}") for v in values],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: int = 0,
    upper: int = 0,
    how: str = "left",
) -> DataFrame:
    """Join right rows whose ``right_ts`` lies in
    ``[left_ts + lower, left_ts + upper)`` for equal ``on`` keys.

    The equality keys ride the join condition first so Catalyst plans a
    hash / sort-merge join and evaluates the interval as a residual —
    never a nested-loop cross join.  Caller aggregates afterwards.
    """
    on = list(on)
    lts = F.col(f"__l.{left_ts}").cast("long")
    rts = F.col(f"__r.{right_ts}").cast("long")
    cond: Column = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    cond = cond & (rts >= lts + F.lit(int(lower))) & (rts < lts + F.lit(int(upper)))
    return left.alias("__l").join(right.alias("__r"), cond, how)


MIN_BUCKET = 1024
"""Smallest safe _floordiv divisor: an epoch-ns long near 2^60 has a
double ulp of ~2^8.6 ≈ 390, so the double division's error stays below
the 0.5 that ``round`` tolerates only when the divisor exceeds ~2·ulp.
1024 gives margin; sub-µs bucket widths make no sense for log data."""


def _floordiv(col: Column, b: int) -> Column:
    """Floor division on longs, negative-safe. ``pmod`` makes the
    numerator an exact multiple of ``b``, so the double division is
    within 1 ulp of an integer and ``round`` recovers it exactly —
    naive ``floor(x/b)`` on epoch-ns longs (> 2^53) silently loses
    precision, and ``cast("long")`` truncates toward zero. Callers must
    keep ``b >= MIN_BUCKET`` (enforced at the public entry points)."""
    q = col.cast("long")
    return F.round((q - F.pmod(q, F.lit(b))) / F.lit(b)).cast("long")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: int = 0,
    upper: int = 0,
    bucket: int | None = None,
) -> DataFrame:
    """Key-less interval join at scale: right rows with ``right_ts`` in
    ``[left_ts + lower, left_ts + upper)`` — no equality key available.

    A naive formulation is a nested-loop cross join (O(|L|·|R|), and on
    Spark a single-task BroadcastNestedLoopJoin). Instead, block time
    into fixed buckets of width ``bucket`` (default: the interval span):
    each left row keys by its own bucket; each right row is duplicated
    into every bucket its match-window overlaps (≤ 2 copies when
    ``bucket >= span``). The join becomes an equi-join on the bucket id
    with the interval as residual — a plain shuffled hash join that
    scales out, at the cost of ~2× duplication of the right side.

    Returns the joined frame aliased ``__l`` / ``__r`` (inner join: a
    pair appears exactly once because the left bucket is unique).
    """
    span = int(upper) - int(lower)
    if span <= 0:
        raise ValueError("upper must be > lower")
    b = int(bucket) if bucket is not None else max(span, MIN_BUCKET)
    if b < MIN_BUCKET:
        raise ValueError(
            f"bucket width {b} ns is below the {MIN_BUCKET} ns minimum — "
            "_floordiv loses float precision on epoch-ns longs below that"
        )

    lts = F.col(left_ts).cast("long")
    rts = F.col(right_ts).cast("long")
    # matching left rows have lts in (rts - upper, rts - lower]
    l_b = left.withColumn("__bkt", _floordiv(lts, b))
    r_b = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                _floordiv(rts - F.lit(int(upper)) + F.lit(1), b),
                _floordiv(rts - F.lit(int(lower)), b),
            )
        ),
    )
    lts_j = F.col(f"__l.{left_ts}").cast("long")
    rts_j = F.col(f"__r.{right_ts}").cast("long")
    cond = (
        (F.col("__l.__bkt") == F.col("__r.__bkt"))
        & (rts_j >= lts_j + F.lit(int(lower)))
        & (rts_j < lts_j + F.lit(int(upper)))
    )
    return l_b.alias("__l").join(r_b.alias("__r"), cond, "inner")
