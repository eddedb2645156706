"""Canonical log schema.

One table holds everything (reference stores one record type, LogEvent —
pkg/model/logevent.go:25-35; partition identity is the tag set —
pkg/model/tag/tags.go). Columns:

    ts        long     epoch nanoseconds (reference ts is int64 ns)
    msg       string   message body
    fields    map<string,string>  per-record metadata
    tags      map<string,string>  partition identity (denormalized)
    tag_line  string   canonical sorted "k=v,..." partition identity
    src       string   physical partition key: stable hash of tag_line
    seq       long     ingest-monotonic sequence within src

Total order / cursor key is (ts, src, seq) — replaces the reference's
journal positions (pkg/cursor/cursor.go:391-442) with a value-based cursor
that any executor can evaluate, which is what makes pagination stateless
and scale-free.

At 100 TB the physical layout is: parquet partitioned by ``src`` (hashed
tag_line keeps directory names safe and bounds cardinality) and, within a
partition, files roughly time-ordered so parquet min/max stats give
time-range pruning for free.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import types as T

LOG_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType(), False),
        T.StructField("msg", T.StringType(), True),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("tag_line", T.StringType(), True),
        T.StructField("src", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
    ]
)

LOG_COLUMNS = [f.name for f in LOG_SCHEMA.fields]

# Schema for readStream over the logs directory. Column order matters:
# the physical parquet files hold the data columns (everything but the
# partition key ``src``) in LOG_SCHEMA order, and Spark's streaming file
# source emits data columns first with partition columns appended LAST.
# ForeachBatchSink then renames the batch's output attributes to the
# user-provided schema POSITIONALLY — with ``src`` mid-schema the column
# named ``src`` would carry ``seq``'s values and vice versa (observed on
# Spark 4.1: batch_df arrived as src:bigint/seq:string with crossed
# values). Keeping ``src`` last makes the positional rename the identity.
STREAM_SCHEMA = T.StructType(
    [f for f in LOG_SCHEMA.fields if f.name != "src"]
    + [LOG_SCHEMA["src"]]
)

# stable total order for cursors/pagination
ORDER_COLUMNS = ["ts", "src", "seq"]


def src_for_tag_line(tag_line: str) -> str:
    """Stable short id for a tag_line — the physical partition directory key."""
    return hashlib.md5(tag_line.encode("utf-8")).hexdigest()[:16]
