"""Event-time streaming operators beyond the reference's pipe surface.

logrange pipes are position-ordered filtered replication with no event-time
semantics (reference: pkg/pipe/ — no watermarks, windows, or state). This
module adds the event-time operators a log/training-data pipeline needs,
built on Spark's native streaming primitives so the same code runs in batch
(oracle-checkable) and as a Structured Streaming query:

- ``sessionize``  — gap-based session windows via ``F.session_window``;
  in streaming, pair with ``withWatermark`` before the groupBy.
- ``windowed_counts`` — tumbling/sliding event-time windows with an
  optional watermark: the late-data contract (events later than the
  watermark are dropped; windows finalize once the watermark passes
  their end, so append-mode sinks emit each window exactly once).
- ``stateful.stateful_dedupe`` — custom stateful operator via
  ``applyInPandasWithState`` over ``groupBy(key)``: cross-batch exact
  dedup with optional state TTL. The template for any state machine
  ``session_window`` can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "t",
    gap: str = DEFAULT_GAP,
) -> DataFrame:
    """Per-key gap sessions: events closer than ``gap`` merge into one
    session. ``ts_col`` must be a TimestampType column.

    Returns (key, start_us, end_us, n_events) where start/end are the
    first/last event times in the session as epoch-µs longs. One shuffle
    on the key — at 100 TB this partitions by user across executors, and
    in streaming mode Spark keeps per-session state with watermark
    eviction instead of re-scanning.
    """
    return (
        events.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap).alias("_w")
        )
        .agg(
            F.unix_micros(F.min(ts_col)).alias("start_us"),
            F.unix_micros(F.max(ts_col)).alias("end_us"),
            F.count("*").alias("n_events"),
        )
        .select(key_col, "start_us", "end_us", "n_events")
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "t",
    window: str = "1 hour",
    slide: str | None = None,
    key_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) event-time window
    counts, optionally keyed. ``ts_col`` must be TimestampType.

    With ``watermark`` set and run as a streaming query in append mode,
    this carries Spark's late-data contract: events older than
    (max event time − watermark) are dropped, and a window row is
    emitted exactly once — when the watermark passes its end. In batch
    the same plan is a plain windowed aggregation (oracle-checkable).
    One shuffle on (window, key); map-side partial aggregation applies,
    so at 100 TB the shuffle carries one row per (window, key) per task,
    not per event.

    Returns (key?, window_start_us, window_end_us, n).
    """
    src = events.withWatermark(ts_col, watermark) if watermark else events
    win = F.window(F.col(ts_col), window, slide or window).alias("_w")
    keys = ([F.col(key_col)] if key_col else []) + [win]
    out = src.groupBy(*keys).agg(F.count("*").alias("n"))
    cols = ([F.col(key_col)] if key_col else []) + [
        F.unix_micros(F.col("_w.start")).alias("window_start_us"),
        F.unix_micros(F.col("_w.end")).alias("window_end_us"),
        F.col("n"),
    ]
    return out.select(*cols)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "t",
    right_ts: str = "rt",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each left event pairs with right
    events of the same key whose time lies in
    ``[left_ts - lower, left_ts + upper]``.

    Both sides carry a watermark, which is what makes this runnable as a
    STREAMING query in append mode: the event-time range constraint plus
    the watermarks let Spark bound the join state (buffered rows are
    evicted once the watermark passes their possible-match interval),
    instead of holding both streams forever — the state-bounding contract
    batch ``ops/joins.range_join`` doesn't need but a continuous pipeline
    must have. The same plan runs in batch (watermarks are no-ops), so
    the join semantics are oracle-checkable.
    """
    l = left.withWatermark(left_ts, watermark).alias("__sl")
    r = right.withWatermark(right_ts, watermark).alias("__sr")
    cond = (
        (F.col(f"__sl.{key}") == F.col(f"__sr.{key}"))
        & (
            F.col(f"__sr.{right_ts}")
            >= F.col(f"__sl.{left_ts}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"__sr.{right_ts}")
            <= F.col(f"__sl.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    # drop the right-side key so the joined frame exposes one
    # unambiguous key column
    return l.join(r, cond).drop(F.col(f"__sr.{key}"))
