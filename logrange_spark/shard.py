"""Sharded ingest tier: N writer processes, one store each, one query view.

The single-process writer tops out near ~600k rec/s because row
normalization and Arrow/parquet encoding share one CPython GIL
(SCALE.md "Sustained ingest", tools/ingest_profile.py) — the same
reason the reference scales ingest with multiple ingestor NODES rather
than threads (logrange is a multi-node system: api/ingestor.go writes
route to partition-owning hosts). The Spark-native analogue is a
sharded STORE:

- **Write side**: partitions (srcs) hash-route to one of N shard
  stores (``shard_of``); each shard is owned by ONE engine process
  (the store flock enforces it), so every per-shard invariant —
  atomic seq reservation, visible-in-seq-order commits, catalog
  consistency, auto-compaction — holds exactly as in the single-store
  engine, with zero cross-process coordination. Routing is pure
  hashing: no coordinator, no shared state, linear scaling until the
  disk saturates.
- **Read side**: a shard store is just a parquet logs tree, so the
  query tier reads the UNION of shard trees (``read_shard_logs``) —
  one DataFrame with the standard log schema, every pushdown
  (src pruning, ts min/max, column pruning) intact per shard. A
  tag-routed query touches exactly one shard's files; a fan-out query
  scans all shards in parallel tasks.

The cross-shard ordering contract is the same as the single store's
cross-SRC contract: seq orders within a src (and srcs never span
shards); cross-src/cross-shard reads order by (ts, src, seq) exactly
as compiler/select.py already does. Measured end to end by
tools/ingest_shard_scale.py (SCALE.md round-13 ingest section).
"""

from __future__ import annotations

import hashlib
import os
from typing import TYPE_CHECKING

from .model.schema import src_for_tag_line
from .model.tags import parse_tags, tag_line

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

    from .engine import Engine


def shard_of(src: str, n_shards: int) -> int:
    """Stable shard index for a partition id (md5 of the src string —
    NOT Python's salted hash(); must agree across processes/restarts)."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    return int.from_bytes(hashlib.md5(src.encode()).digest()[:8], "big") % n_shards


def shard_for_tags(tags: str | dict, n_shards: int) -> int:
    """Shard index for a write's tag set (routes exactly like the
    engine derives src from tags, so router and engine always agree)."""
    tmap = (
        parse_tags(tags)
        if isinstance(tags, str)
        else {str(k): str(v) for k, v in tags.items()}
    )
    return shard_of(src_for_tag_line(tag_line(tmap)), n_shards)


def shard_root(root: str, i: int) -> str:
    return os.path.join(root, f"shard-{i:03d}")


def shard_roots(root: str) -> list[str]:
    """Existing shard store roots under ``root``, index order."""
    if not os.path.isdir(root):
        return []
    return [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if d.startswith("shard-") and os.path.isdir(os.path.join(root, d))
    ]


class ShardRouter:
    """Write-side router over per-shard Engines.

    In production each shard engine lives in its OWN process (the GIL
    is the point); this class is the in-process form used by tests and
    by single-process callers that only need the routing semantics.
    ``engines[i]`` must own ``shard_root(root, i)``.
    """

    def __init__(self, engines: list["Engine"]):
        if not engines:
            raise ValueError("need at least one engine")
        self.engines = engines

    def write(self, tags: str | dict, events: list,
              fields: dict | None = None) -> dict:
        i = shard_for_tags(tags, len(self.engines))
        out = self.engines[i].write(tags, events, fields)
        out["shard"] = i
        return out


def read_shard_logs(spark: "SparkSession", root: str) -> "DataFrame":
    """One DataFrame over every shard store's logs (standard log
    schema incl. the ``src`` partition column). Each shard tree is read
    with its own partition discovery and the union is by name, so
    src-pruning/ts-pushdown work per shard exactly as for one store;
    the union adds no shuffle (it concatenates scan tasks)."""
    from functools import reduce

    roots = shard_roots(root)
    if not roots:
        raise FileNotFoundError(f"no shard-* stores under {root!r}")
    parts = []
    for r in roots:
        logs = os.path.join(r, "logs")
        parts.append(
            spark.read.option("basePath", logs).parquet(logs)
        )
    return reduce(lambda a, b: a.unionByName(b), parts)
