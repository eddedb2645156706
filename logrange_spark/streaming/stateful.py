"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's pipes are stateless filtered replication (reference:
pkg/pipe/worker.go:48-104 — no state beyond the cursor position), so
anything here is beyond-reference. The first operator large ingest
pipelines ask for is **streaming exact deduplication**: drop every
record whose key was already admitted, across micro-batches, with a
state TTL so the key space doesn't grow unboundedly.

Scale design
- State lives in the Spark state store, partitioned by the group key —
  the same hash shuffle the groupBy already pays, no extra exchange.
- TTL (processing-time timeout) bounds state size: at 100 TB/day you
  keep hours of keys, not the full history; pair with a periodic batch
  `dedup.exact_duplicates` sweep for the long tail.
- Arrow batches carry the rows into Python; per group we emit at most
  one row, so the Python-side work is O(groups), not O(rows).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stateful_dedupe"]


def stateful_dedupe(
    df: DataFrame, key_cols: list[str], ttl_ms: int | None = None
) -> DataFrame:
    """Keep only the first record per key, across micro-batches.

    Works on a streaming DataFrame: ``groupBy(key)`` routes each key to
    a stable state-store partition; the per-key state is a single "seen"
    marker. Within a batch the first row (arrival order) wins —
    deterministic for ordered sources; later batches emit nothing for a
    seen key.

    ``ttl_ms`` expires a key's marker after that much processing time,
    bounding state size on continuous triggers. Leave it ``None`` for
    drain-style runs (``trigger(availableNow=True)``): Spark keeps an
    available-now query alive, running empty batches, until every
    ProcessingTimeTimeout has fired — a 1 h TTL would spin the "finite"
    run for an hour (measured: 457 empty batches in 4 min).
    """
    out_schema = df.schema
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )

    def fn(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        emitted = False
        for pdf in pdfs:
            if seen or emitted or len(pdf) == 0:
                continue
            yield pdf.iloc[[0]]
            emitted = True
        if not seen:
            state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen INT",
        outputMode="append",
        timeoutConf=timeout_conf,
    )
