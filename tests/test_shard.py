"""Sharded ingest tier (logrange_spark/shard.py): routing determinism,
per-shard engine ownership, and the union query view."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from logrange_spark import Engine
from logrange_spark import shard as sh

NS = 10**9
BASE = 1_700_000_000 * NS


def test_shard_of_deterministic_and_spread():
    srcs = [f"src-{i}" for i in range(200)]
    a = [sh.shard_of(s, 4) for s in srcs]
    b = [sh.shard_of(s, 4) for s in srcs]
    assert a == b
    assert set(a) == {0, 1, 2, 3}  # all shards used at 200 srcs
    # n=1 routes everything to shard 0
    assert {sh.shard_of(s, 1) for s in srcs} == {0}
    with pytest.raises(ValueError):
        sh.shard_of("x", 0)


def test_shard_for_tags_matches_engine_src(spark):
    """Router and engine must derive the same src from the same tags —
    otherwise a query for a tag set would look in the wrong shard."""
    root = tempfile.mkdtemp(prefix="lrshard-")
    try:
        e = Engine(spark, sh.shard_root(root, 0))
        out = e.write({"name": "web", "ns": "prod"},
                      [(BASE, "m", {})])
        assert sh.shard_of(out["src"], 4) == sh.shard_for_tags(
            {"name": "web", "ns": "prod"}, 4
        )
        # tag-order independence (tag_line canonicalizes)
        assert sh.shard_for_tags(
            {"ns": "prod", "name": "web"}, 4
        ) == sh.shard_for_tags({"name": "web", "ns": "prod"}, 4)
        e.close()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.fixture()
def sharded(spark):
    root = tempfile.mkdtemp(prefix="lrshard-")
    engines = [Engine(spark, sh.shard_root(root, i)) for i in range(2)]
    yield root, sh.ShardRouter(engines)
    for e in engines:
        e.close()
    shutil.rmtree(root, ignore_errors=True)


def test_router_round_trip_and_union_view(spark, sharded):
    root, router = sharded
    tagsets = [{"name": f"app{i}"} for i in range(6)]
    per_src = {}
    for t in tagsets:
        for batch in range(2):
            out = router.write(
                t,
                [(BASE + (batch * 10 + j) * NS, f"{t['name']} m{batch}-{j}",
                  {"b": str(batch)}) for j in range(10)],
            )
            assert out["shard"] == sh.shard_for_tags(t, 2)
            per_src[out["src"]] = out["last_seq"]
    # both shards actually hold data (6 srcs at 2 shards)
    assert all(len(e._catalog) > 0 for e in router.engines)

    logs = sh.read_shard_logs(spark, root)
    assert logs.count() == 6 * 2 * 10
    # per-src seq is contiguous 1..n within its owning shard
    got = {
        r["src"]: (r["n"], r["mx"])
        for r in logs.groupBy("src")
        .agg(F.count("*").alias("n"), F.max("seq").alias("mx"))
        .collect()
    }
    for src, last in per_src.items():
        assert got[src] == (20, 20) and last == 20
    # src-pruned read returns exactly one partition's rows
    one = next(iter(per_src))
    assert logs.where(F.col("src") == one).count() == 20
    # cross-shard global ordering by (ts, src, seq) is a plain sort
    first = logs.orderBy("ts", "src", "seq").limit(6).collect()
    assert [r["ts"] for r in first] == [BASE] * 6


def test_read_shard_logs_missing(spark):
    with pytest.raises(FileNotFoundError):
        sh.read_shard_logs(spark, "/nonexistent-shard-root")
