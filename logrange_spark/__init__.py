"""logrange-spark: a PySpark-native log analytics engine.

Re-expresses the capabilities of logrange/logrange (LQL queries, streaming
pipes, partition admin) Spark-first, plus a large-scale training-data
toolkit (dedup, similarity search, text analysis).
"""

from .engine import Engine
from .lql.parser import parse_lql, parse_source, parse_where
from .session import build_session
from .shard import ShardReader, ShardRouter, resolve_shard, shard_for_tags

__all__ = [
    "Engine", "parse_lql", "parse_source", "parse_where", "build_session",
    "ShardReader", "ShardRouter", "resolve_shard", "shard_for_tags",
]
