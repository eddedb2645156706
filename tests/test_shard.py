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
    with pytest.raises(FileNotFoundError):
        sh.ShardReader(spark, "/nonexistent-shard-root")


# ------------------------------------------------------------ query tier
def _writes():
    """Deterministic multi-partition workload, applied identically to
    the sharded router and to a single-store engine — src ids derive
    from tag lines and seq from write order, so every LQL answer must
    be IDENTICAL row-for-row across the two layouts."""
    out = []
    for i in range(5):
        tags = {"name": f"app{i}", "ns": "prod" if i % 2 == 0 else "dev"}
        for batch in range(2):
            out.append((tags, [
                (BASE + (i * 100 + batch * 50 + j) * NS,
                 f"msg {i}/{batch}/{j} {'ERROR' if j % 4 == 0 else 'ok'}",
                 {"n": str(j)})
                for j in range(25)
            ]))
    return out


LQLS = [
    "SELECT FROM {ns=prod} WHERE msg CONTAINS 'ERROR' LIMIT 10000",
    "SELECT LIMIT 40",
    "SELECT POSITION tail OFFSET -25 LIMIT 25",  # tail across shards
    f'SELECT RANGE ["{BASE + 120 * NS}":"{BASE + 300 * NS}"] LIMIT 10000',
    "SELECT FROM name=app3 OR name=app0 WHERE fields:n < '2' LIMIT 10000",
]


@pytest.fixture()
def twin_stores(spark):
    """(sharded root + live writers closed, single-store engine) with
    identical content."""
    sroot = tempfile.mkdtemp(prefix="lrshard-q-")
    eroot = tempfile.mkdtemp(prefix="lrsingle-q-")
    engines = [Engine(spark, sh.shard_root(sroot, i)) for i in range(2)]
    router = sh.ShardRouter(engines)
    single = Engine(spark, eroot)
    for tags, recs in _writes():
        router.write(tags, recs)
        single.write(tags, recs)
    yield sroot, engines, single
    for e in engines:
        e.close()
    single.close()
    shutil.rmtree(sroot, ignore_errors=True)
    shutil.rmtree(eroot, ignore_errors=True)


def test_shard_reader_lql_equals_single_store(spark, twin_stores):
    sroot, engines, single = twin_stores
    # the reader opens read-only WHILE the writer engines still own
    # their shards (no flock conflict)
    reader = sh.ShardReader(spark, sroot)
    for lql in LQLS:
        got = [tuple(r) for r in reader.query(lql).collect()]
        want = [tuple(r) for r in single.query(lql).collect()]
        assert got == want and len(got) > 0, lql
    # sql() over the union view
    n = reader.sql("SELECT count(*) AS n FROM logs").collect()[0]["n"]
    assert n == 5 * 2 * 25


def test_shard_reader_cursor_paging_equals_single_store(spark, twin_stores):
    sroot, _, single = twin_stores
    reader = sh.ShardReader(spark, sroot)
    # page forward from the global start in 30-row pages, both layouts
    from logrange_spark.compiler.select import CursorToken

    def pages(q):
        tok, out = None, []
        for _ in range(12):  # 250 rows / 30-row pages + slack
            lql = (
                "SELECT LIMIT 30"
                if tok is None
                else f"SELECT POSITION '{tok}' LIMIT 30"
            )
            rows = q(lql).collect()
            if not rows:
                break
            out.extend(tuple(r) for r in rows)
            last = rows[-1]
            tok = CursorToken(last["ts"], last["src"], last["seq"]).encode()
        return out

    got, want = pages(reader.query), pages(single.query)
    assert got == want and len(got) == 250


def test_shard_reader_show_partitions_global_pagination(spark, twin_stores):
    sroot, _, single = twin_stores
    from logrange_spark.lql import ast

    reader = sh.ShardReader(spark, sroot)
    stmt = ast.ShowPartitions(None, 0, None)
    got = [tuple(r) for r in reader.show_partitions(stmt).collect()]
    want = [tuple(r) for r in single.show_partitions(stmt).collect()]
    assert got == want and len(got) == 5
    # global limit, not per-shard
    stmt2 = ast.ShowPartitions(None, 1, 2)
    got2 = [tuple(r) for r in reader.show_partitions(stmt2).collect()]
    assert got2 == want[1:3]


def test_shard_reader_is_read_only(spark, twin_stores):
    sroot, _, _ = twin_stores
    reader = sh.ShardReader(spark, sroot)
    e = reader.engines[0]
    with pytest.raises(RuntimeError, match="read_only"):
        e.write({"name": "x"}, [(BASE, "m", {})])
    with pytest.raises(RuntimeError, match="read_only"):
        e.compact()
    from logrange_spark.lql.parser import parse_lql

    with pytest.raises(RuntimeError, match="read_only"):
        e.truncate(parse_lql("TRUNCATE MAXSIZE 0"))


def test_shard_reader_auto_refresh_per_query(spark, twin_stores):
    """The query tier must see committed writes WITHOUT an explicit
    refresh(): every query checks the shard state-file fingerprint."""
    sroot, engines, _ = twin_stores
    reader = sh.ShardReader(spark, sroot)
    before = reader.query("SELECT LIMIT 10000").count()
    sh.ShardRouter(engines).write(
        {"name": "auto"}, [(BASE + 20_000 * NS, "auto row", {})]
    )
    assert reader.query("SELECT LIMIT 10000").count() == before + 1


def test_shard_reader_serves_http(spark, twin_stores):
    """The HTTP server runs unmodified over a ShardReader: query with
    cursor pos, execute SHOW PARTITIONS, WaitNewData observes a write
    from a shard's (separate) writer engine, and mutations are refused."""
    import json as _json
    import threading
    import urllib.request

    from logrange_spark.server import Server

    sroot, engines, _ = twin_stores
    reader = sh.ShardReader(spark, sroot, poll_s=0.1)
    srv = Server(reader).start()
    url = f"http://127.0.0.1:{srv.port}"

    def post(path, body, expect_err=False):
        req = urllib.request.Request(
            url + path, data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as r:
                return _json.loads(r.read())
        except urllib.error.HTTPError as e:
            if not expect_err:
                raise
            return {"status": e.code, **_json.loads(e.read() or b"{}")}

    try:
        res = post("/api/v1/query",
                   {"query": "SELECT FROM {ns=prod} LIMIT 40"})
        assert len(res["events"]) == 40 and res["err"] is None
        nxt = res["nextQueryRequest"]
        res2 = post("/api/v1/query", nxt)
        assert len(res2["events"]) > 0
        # cursor continues, no overlap
        assert res2["events"][0] != res["events"][0]

        out = post("/api/v1/execute", {"query": "SHOW PARTITIONS"})
        assert len(out["output"].splitlines()) == 1 + 5

        # WaitNewData across processes: tail + waitTimeout, then a write
        # through the shard's WRITER engine lands while the server waits
        def later():
            sh.ShardRouter(engines).write(
                {"name": "live"}, [(BASE + 30_000 * NS, "live row", {})]
            )

        t = threading.Timer(0.6, later)
        t.start()
        res3 = post("/api/v1/query", {
            "query": "SELECT FROM {name=live} POSITION tail LIMIT 10",
            "waitTimeout": 10,
        })
        t.join()
        assert [e["message"] for e in res3["events"]] == ["live row"]

        # mutations are refused by the read-only tier
        ref = post("/api/v1/write", {
            "tags": "{name=x}",
            "events": [{"timestamp": BASE, "message": "m"}],
        }, expect_err=True)
        assert ref["status"] in (400, 500)
        assert "read-only query tier" in ref["err"]
        ref2 = post("/api/v1/execute",
                    {"query": "TRUNCATE MAXSIZE 0"}, expect_err=True)
        assert ref2["status"] == 400 and "read-only" in ref2["err"]
    finally:
        srv.stop()


def test_incremental_refresh_read_only(spark):
    """Engine.refresh_read_only applies only appended chunk-log records
    (bookmark advance), survives torn tails, and invalidates when the
    writer compacts the log in place."""
    root = tempfile.mkdtemp(prefix="lrinc-")
    try:
        w = Engine(spark, root)
        w.write({"name": "a"}, [(BASE, "m0", {})])
        r = Engine(spark, root, read_only=True)
        assert sum(len(v) for v in r._chunk_stats.values()) == 1
        # appended state arrives incrementally
        w.write({"name": "a"}, [(BASE + NS, "m1", {})])
        w.write({"name": "b"}, [(BASE + 2 * NS, "m2", {})])
        assert r.refresh_read_only() is True
        assert sum(len(v) for v in r._chunk_stats.values()) == 3
        assert set(r._catalog) == set(w._catalog)
        # no change -> no-op True, bookmark stable
        off = r._chunk_log_offset
        assert r.refresh_read_only() is True and r._chunk_log_offset == off
        # torn tail: a partial line is NOT consumed
        with open(w._chunk_log_path, "ab") as f:
            f.write(b'{"src": "x", "chunk": "c", "op": "ad')
        assert r.refresh_read_only() is True
        assert r._chunk_log_offset == off
        with open(w._chunk_log_path, "r+b") as f:
            f.truncate(off)
        # in-place compaction invalidates the bookmark
        with w._write_lock:
            w._compact_chunk_log()
        w.write({"name": "a"}, [(BASE + 3 * NS, "m3", {})])
        assert r.refresh_read_only() is False
        r.close()
        w.close()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_shard_reader_sees_writes_after_log_compaction(spark, twin_stores):
    """ShardReader.refresh falls back to a full re-open for a shard
    whose chunk log was compacted underneath."""
    sroot, engines, _ = twin_stores
    reader = sh.ShardReader(spark, sroot)
    before = reader.query("SELECT LIMIT 10000").count()
    for e in engines:
        with e._write_lock:
            e._compact_chunk_log()
    sh.ShardRouter(engines).write(
        {"name": "postcompact"}, [(BASE + 40_000 * NS, "pc", {})]
    )
    assert reader.query("SELECT LIMIT 10000").count() == before + 1
    got = reader.query("SELECT FROM {name=postcompact} LIMIT 5").collect()
    assert [r["msg"] for r in got] == ["pc"]


def test_shard_reader_refresh_sees_new_writes(spark, twin_stores):
    sroot, engines, _ = twin_stores
    reader = sh.ShardReader(spark, sroot)
    before = reader.query("SELECT LIMIT 10000").count()
    router = sh.ShardRouter(engines)
    router.write({"name": "late"}, [(BASE + 10_000 * NS, "late row", {})])
    # catalog/pruning snapshots predate the write; refresh re-opens
    reader.refresh()
    after = reader.query("SELECT LIMIT 10000").count()
    assert after == before + 1
    got = reader.query("SELECT FROM {name=late} LIMIT 10").collect()
    assert len(got) == 1 and got[0]["msg"] == "late row"

def test_shard_reader_describe_partition(spark, twin_stores):
    """Delegated to the owning shard; unknown partitions get the
    single-store empty-info answer (never masked by a cross-shard
    exception sweep)."""
    sroot, _, single = twin_stores
    from logrange_spark.lql.parser import parse_lql

    reader = sh.ShardReader(spark, sroot)
    stmt = parse_lql("DESCRIBE PARTITION {name=app1,ns=dev}")
    got = reader.describe_partition(stmt)
    want = single.describe_partition(stmt)

    def stable(info):  # chunk file NAMES are store-local uuids
        return {
            **{k: v for k, v in info.items() if k != "chunks"},
            "chunks": sorted(
                tuple(sorted((k, v) for k, v in c.items() if k != "chunk"))
                for c in info["chunks"]
            ),
        }

    assert stable(got) == stable(want) and got["records"] == 50
    stmt2 = parse_lql("DESCRIBE PARTITION {name=nope}")
    got2 = reader.describe_partition(stmt2)
    assert got2["records"] == 0 and got2["chunks"] == []


def test_shard_reader_pipe_statements(spark, twin_stores):
    """SHOW PIPES / DESCRIBE PIPE work read-only over the persisted
    per-shard definitions; pipe lifecycle is cleanly refused (the
    server surfaces the RuntimeError as a 400, not an AttributeError
    500)."""
    sroot, engines, _ = twin_stores
    # persist a definition exactly as the writer process does
    engines[0]._pipes["p1"] = {
        "name": "p1", "source": "", "where": "msg CONTAINS 'ERROR'",
    }
    engines[0]._save_pipes()
    reader = sh.ShardReader(spark, sroot)
    names = [r["name"] for r in reader.execute("SHOW PIPES").collect()]
    assert names == ["p1"]
    d = reader.execute("DESCRIBE PIPE p1")
    assert d["where"] == "msg CONTAINS 'ERROR'"
    # liveness is writer-process state the read-only tier can't observe
    assert d["active"] is None and d["source_srcs"] is None
    with pytest.raises(ValueError, match="does not exist"):
        reader.execute("DESCRIBE PIPE nosuch")
    from logrange_spark.lql import ast

    with pytest.raises(RuntimeError, match="read-only"):
        reader.create_pipe(ast.CreatePipe("p2", None, None))
    with pytest.raises(RuntimeError, match="read-only"):
        reader.delete_pipe("p1")
    with pytest.raises(RuntimeError, match="read-only"):
        reader.execute("CREATE PIPE p3")


def test_read_only_open_races_log_creation(spark, twin_stores, monkeypatch):
    """Regression: a writer creating chunks.jsonl between the replay
    block's exists() check and the bookmark line used to raise
    NameError (good_offset unbound) in the read-only open path. The
    bookmark must come from the replay, never from a re-stat."""
    import os as _os

    sroot, engines, _ = twin_stores
    root0 = engines[0].root
    log_path = engines[0]._chunk_log_path
    real_exists = _os.path.exists
    state = {"calls": 0}

    def racy_exists(p):
        if _os.fspath(p) == log_path:
            state["calls"] += 1
            if state["calls"] == 1:
                return False  # "writer hasn't created it yet"
        return real_exists(p)

    monkeypatch.setattr("os.path.exists", racy_exists)
    e = Engine(spark, root0, read_only=True)
    monkeypatch.undo()
    # replay was skipped, so the bookmark starts at 0 ...
    assert e._chunk_log_offset == 0
    # ... and the next refresh replays the whole log from there
    assert e.refresh_read_only() is True
    assert e._chunk_log_offset > 0
    assert e._chunk_count == sum(
        len(v) for v in engines[0]._chunk_stats.values()
    )
    e.close()
