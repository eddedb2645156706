"""Event-time streaming operators beyond the reference's pipe surface.

logrange pipes are position-ordered filtered replication with no event-time
semantics (reference: pkg/pipe/ — no watermarks, windows, or state). This
module adds the event-time operators a log/training-data pipeline needs,
built on Spark's native streaming primitives so the same code runs in batch
(oracle-checkable) and as a Structured Streaming query:

- ``sessionize``  — gap-based session windows via ``F.session_window``;
  in streaming, pair with ``withWatermark`` before the groupBy.
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
