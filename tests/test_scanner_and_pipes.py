"""Collector scan → store, pipes (streaming), forwarder sink tests."""

from __future__ import annotations

import os
import socketserver
import threading
import time

import pytest

from logrange_spark.forward import ConsoleSink, SyslogConfig, SyslogSink, start_forwarder
from logrange_spark.ingest.scanner import ScanSchema, collect_into, scan

from .conftest import BASE_TS, NS


@pytest.fixture()
def log_dir(tmp_path):
    d = tmp_path / "logs" / "host-01"
    d.mkdir(parents=True)
    (d / "app.log").write_text(
        "2024-01-01 10:00:00 start of app\n"
        "2024-01-01 10:00:01 ERROR disk is full\n"
        "2024-01-01 10:00:02 recovered\n"
    )
    (d / "db.log").write_text("2024-01-01 11:00:00 db checkpoint\n")
    return str(tmp_path / "logs")


def test_scan_batch(spark, log_dir):
    schema = ScanSchema(
        path_glob=f"{log_dir}/*/*.log",
        parser="text",
        path_regex=r"(?P<host>host-\d+)/(?P<file>[a-z]+)\.log",
        static_tags={"env": "test"},
    )
    df = scan(spark, schema)
    rows = df.collect()
    assert len(rows) == 4
    app = [r for r in rows if r["tags"]["file"] == "app"]
    assert len(app) == 3
    assert app[0]["tags"] == {"env": "test", "host": "host-01", "file": "app"}
    assert app[0]["tag_line"] == "env=test,file=app,host=host-01"
    # detected timestamps
    assert any(r["ts"] == 1704103200 * NS for r in rows)  # 2024-01-01 10:00:00


def test_cli_collect_once(spark, log_dir, tmp_path, capsys):
    """`collect --once` (cmd/lr collect analogue) ingests existing files
    into a store root that a normal engine can then query."""
    from logrange_spark import Engine
    from logrange_spark.cli import main

    root = str(tmp_path / "store")
    rc = main([
        "collect", "--root", root, "--glob", f"{log_dir}/*/*.log",
        "--path-regex", r"(?P<file>[a-z]+)\.log", "--once",
    ])
    assert rc == 0 and "collected" in capsys.readouterr().out
    # note: cmd_collect stopped its session; build a fresh engine on the
    # same root with the test session to read what it wrote
    e = Engine(spark, root)
    rows = e.query("SELECT FROM {file=app} LIMIT 10").collect()
    assert len(rows) == 3


def test_scan_exclude_matchers(spark, log_dir):
    """ExcludeMatchers parity: files matching an exclude regex are
    skipped; bad patterns fail fast (pkg/scanner/config.go:110-113)."""
    schema = ScanSchema(
        path_glob=f"{log_dir}/*/*.log",
        parser="text",
        exclude_regexes=(r"db\.log$",),
    )
    rows = scan(spark, schema).collect()
    assert len(rows) == 3  # db.log's single line excluded
    assert all("db" not in r["msg"] for r in rows)
    import re as _re

    with pytest.raises(_re.error):
        scan(spark, ScanSchema(path_glob=f"{log_dir}/*/*.log",
                               exclude_regexes=("[bad",))).collect()


def test_collect_into_engine(engine, log_dir):
    schema = ScanSchema(
        path_glob=f"{log_dir}/*/*.log",
        parser="text",
        path_regex=r"(?P<host>host-\d+)/(?P<file>[a-z]+)\.log",
    )
    collect_into(engine, schema)
    rows = engine.query("SELECT FROM {file=app} WHERE msg CONTAINS 'ERROR' LIMIT 10").collect()
    assert len(rows) == 1
    assert "disk is full" in rows[0]["msg"]
    # seq assigned monotonically per src
    all_app = engine.query("SELECT FROM {file=app} LIMIT 10").collect()
    assert [r["seq"] for r in all_app] == [1, 2, 3]


def _wait(pred, timeout=30.0, step=0.5):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(step)
    return False


def test_pipe_end_to_end(loaded_engine):
    res = loaded_engine.execute("CREATE PIPE errs FROM {name=app1} WHERE msg CONTAINS 'ERROR'")
    assert res["status"] == "created"
    assert [r["name"] for r in loaded_engine.execute("SHOW PIPES").collect()] == ["errs"]

    def piped():
        try:
            return (
                loaded_engine.query('SELECT FROM {logrange.pipe=errs} LIMIT 100').count() == 10
            )
        except Exception:
            return False

    assert _wait(piped), "pipe did not materialize filtered records"
    rows = loaded_engine.query('SELECT FROM {logrange.pipe=errs} LIMIT 100').collect()
    assert all("ERROR" in r["msg"] for r in rows)
    # source tags became fields (T4 enrichment)
    assert rows[0]["fields"]["name"] == "app1"
    assert rows[0]["fields"]["ns"] == "system"
    # new writes flow through continuously
    loaded_engine.write(
        {"name": "app1", "ns": "system"},
        [(BASE_TS + 2000 * NS, "late ERROR arrives", {})],
    )
    assert _wait(
        lambda: loaded_engine.query('SELECT FROM {logrange.pipe=errs} LIMIT 100').count() == 11
    ), "pipe did not pick up new data"
    # T4 enrichment collision: a record whose field key equals a source tag
    # key must flow through (no DUPLICATE_MAP_KEY crash) and the record's
    # own field wins (reference first-match, pkg/model/field/field.go:143-157)
    loaded_engine.write(
        {"name": "app1", "ns": "system"},
        [(BASE_TS + 3000 * NS, "colliding ERROR record", {"name": "record-wins"})],
    )
    assert _wait(
        lambda: loaded_engine.query('SELECT FROM {logrange.pipe=errs} LIMIT 100').count() == 12
    ), "pipe crashed or stalled on tag/field key collision"
    collided = [
        r
        for r in loaded_engine.query('SELECT FROM {logrange.pipe=errs} LIMIT 100').collect()
        if "colliding" in r["msg"]
    ]
    assert collided[0]["fields"]["name"] == "record-wins"
    assert collided[0]["fields"]["ns"] == "system"  # non-clashing tag still folded in
    assert loaded_engine.execute("DELETE PIPE errs")["status"] == "deleted"


def test_pipe_restart_after_crash_is_duplicate_free(engine):
    """Exactly-once across crash/restart (beyond the reference's
    at-least-once, pkg/pipe/worker.go:48-104). Crash simulation: the
    batch LANDED in the destination but the checkpoint commit marker was
    lost — on restart Spark redelivers that batch, and the provenance
    anti-join must drop every already-landed row."""
    from logrange_spark.pipes.service import PROV_SEQ, PROV_SRC, start_pipe

    engine.write(
        {"name": "xo"}, [(BASE_TS + i * NS, f"event {i}", {}) for i in range(6)]
    )
    assert engine.execute("CREATE PIPE xo FROM {name=xo}")["status"] == "created"

    def piped():
        try:
            return engine.query("SELECT FROM {logrange.pipe=xo} LIMIT 1000").collect()
        except Exception:
            return []

    assert _wait(lambda: len(piped()) == 6), "pipe did not materialize"

    # Crash simulation: rewind the checkpoint to "batch 0's offsets were
    # written, its append landed, but its commit marker didn't". Spark
    # only ever redelivers the LATEST offsets batch, and the pipe's own
    # output files echo back as a trailing all-filtered empty batch — so
    # deleting just the newest commit replays that empty echo (verified:
    # zero appends), which is why the rewind must drop the later offsets
    # too. Without the provenance dedup this replay lands 12 rows.
    engine._pipe_queries.pop("xo").stop()
    ckpt = os.path.join(engine.pipes_dir, "checkpoints", "xo")
    for sub, keep in (("offsets", {"0"}), ("commits", set())):
        d = os.path.join(ckpt, sub)
        for f in list(os.listdir(d)):
            # strip hadoop checksum sidecar decoration (".<name>.crc")
            name = f[1:-4] if f.startswith(".") and f.endswith(".crc") else f
            if name not in keep:
                os.remove(os.path.join(d, f))

    engine._pipe_queries["xo"] = start_pipe(engine, engine._pipes["xo"])
    # a fresh write proves the restarted pipe is live (and gives the
    # redelivered batch time to be processed first)
    engine.write({"name": "xo"}, [(BASE_TS + 100 * NS, "late event", {})])
    assert _wait(
        lambda: any("late" in r["msg"] for r in piped())
    ), "restarted pipe did not pick up new data"

    rows = piped()
    pairs = [(r["fields"][PROV_SRC], r["fields"][PROV_SEQ]) for r in rows]
    assert len(pairs) == len(set(pairs)), f"duplicate redelivery: {sorted(pairs)}"
    assert len(pairs) == 7
    assert engine.execute("DELETE PIPE xo")["status"] == "deleted"


class _Collector(socketserver.StreamRequestHandler):
    def handle(self):
        for line in self.rfile:
            self.server.lines.append(line.decode("utf-8").rstrip("\n"))


def test_syslog_forwarder(loaded_engine):
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Collector)
    srv.lines = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    q = start_forwarder(
        loaded_engine,
        "to-syslog",
        'SELECT "{vars:level}|{msg}" FROM {name=app2}',
        SyslogSink(SyslogConfig(port=port)),
    )
    try:
        assert _wait(lambda: len(srv.lines) >= 20), f"got {len(srv.lines)} lines"
        assert any("warn|app2 msg 0" in l for l in srv.lines)
        assert all(l.startswith("<134>") for l in srv.lines)
    finally:
        q.stop()
        srv.shutdown()


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


def test_syslog_udp_sink(spark):
    class _UdpCollector(socketserver.DatagramRequestHandler):
        def handle(self):
            self.server.lines.append(self.rfile.read().decode("utf-8"))

    srv = socketserver.ThreadingUDPServer(("127.0.0.1", 0), _UdpCollector)
    srv.lines = []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink = SyslogSink(SyslogConfig(port=srv.server_address[1], protocol="udp"))
        sink(_lines_df(spark, ["udp one", "udp two"]), 0)
        assert _wait(lambda: len(srv.lines) >= 2), f"got {len(srv.lines)}"
        assert all(l.startswith("<134>") for l in srv.lines)
        assert {l.split(": ", 1)[1] for l in srv.lines} == {"udp one", "udp two"}
    finally:
        srv.shutdown()


def test_syslog_udp_oversized_line_truncates_not_raises(spark):
    """A line that would exceed the 65507-byte UDP payload ceiling must be
    clamped with an explicit marker, not kill the batch with EMSGSIZE."""
    class _UdpCollector(socketserver.DatagramRequestHandler):
        def handle(self):
            self.server.lines.append(self.rfile.read().decode("utf-8"))

    srv = socketserver.ThreadingUDPServer(("127.0.0.1", 0), _UdpCollector)
    srv.max_packet_size = 65536
    srv.lines = []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink = SyslogSink(
            SyslogConfig(port=srv.server_address[1], protocol="udp",
                         line_len_limit=0)  # no framing-level truncation
        )
        sink(_lines_df(spark, ["x" * 70_000]), 0)
        assert _wait(lambda: len(srv.lines) >= 1), "datagram never arrived"
        assert srv.lines[0].endswith("...[truncated]")
        assert len(srv.lines[0].encode()) <= 65000
    finally:
        srv.shutdown()


def test_syslog_tls_sink(spark, tmp_path):
    import ssl
    import subprocess

    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", str(key),
         "-out", str(cert), "-days", "2", "-nodes", "-subj", "/CN=127.0.0.1",
         "-addext", "subjectAltName=IP:127.0.0.1"],
        check=True, capture_output=True,
    )
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Collector)
    srv.lines = []
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(cert), str(key))
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink = SyslogSink(
            SyslogConfig(port=srv.server_address[1], protocol="tls",
                         root_ca_file=str(cert), framing="rfc5424")
        )
        sink(_lines_df(spark, ["tls secret"]), 0)
        assert _wait(lambda: len(srv.lines) >= 1), f"got {len(srv.lines)}"
        # reference RFC5424 framing: <pri>1 time host tag - - - msg
        assert srv.lines[0].startswith("<134>1 ")
        assert srv.lines[0].endswith(" - - - tls secret")
    finally:
        srv.shutdown()


def test_syslog_frame_truncation_and_config_check(spark):
    from logrange_spark.forward import _frame

    cfg = SyslogConfig(replace_newline=True, line_len_limit=10)
    assert _frame("a\nb\nc", cfg) == "abc"
    assert _frame("x" * 25, cfg) == "x" * 10 + "... [truncated]"
    with pytest.raises(ValueError, match="unknown protocol"):
        SyslogSink(SyslogConfig(protocol="carrier-pigeon"))
    with pytest.raises(ValueError, match="root_ca_file"):
        SyslogSink(SyslogConfig(protocol="tcp", root_ca_file="/x.pem"))


def test_windowed_counts_streaming_drops_late_data(spark, tmp_path):
    """windowed_counts with a watermark, streamed in append mode:
    a window is emitted exactly once when the watermark passes its end,
    and events arriving later than the watermark are dropped — Spark's
    late-data contract, which the reference's pipes (position-ordered,
    no event time) cannot express."""
    import json as _json

    from pyspark.sql import functions as F

    from logrange_spark.streaming import windowed_counts

    src_dir = tmp_path / "win_in"
    src_dir.mkdir()
    checkpoint = str(tmp_path / "win_ckpt")

    def emit(name, rows):
        (src_dir / name).write_text("\n".join(_json.dumps(r) for r in rows))

    def run_wave(_name):
        stream = (
            spark.readStream.schema("t string")
            .json(str(src_dir))
            .select(F.to_timestamp("t").alias("t"))
        )
        emitted: list = []
        q = (
            windowed_counts(stream, ts_col="t", window="1 hour", watermark="1 hour")
            .writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(lambda bdf, _bid: emitted.extend(bdf.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(emitted, key=lambda r: r["window_start_us"])

    base_us = 1_704_067_200 * 10**6  # 2024-01-01 00:00:00 UTC

    # wave 1: two events in the 00:00-01:00 window, plus one at 05:00
    # that advances the watermark to 04:00 — finalizing that window
    emit("b0.json", [{"t": "2024-01-01 00:05:00"}, {"t": "2024-01-01 00:15:00"},
                     {"t": "2024-01-01 05:00:00"}])
    got = run_wave("win_out_w1")
    assert [(r["window_start_us"], r["n"]) for r in got] == [(base_us, 2)]

    # wave 2 (same checkpoint → watermark 04:00 persisted): a late event
    # for the already-finalized window arrives — behind the watermark, so
    # it is DROPPED: no new row, no re-emission of the window
    emit("b1.json", [{"t": "2024-01-01 00:20:00"}])
    got = run_wave("win_out_w2")
    assert got == []


def test_sessionize_streaming(spark, tmp_path):
    """sessionize runs as a Structured Streaming query: file source →
    watermark → session_window aggregation → memory sink (complete mode)."""
    import json

    from pyspark.sql import functions as F

    from logrange_spark.streaming import sessionize

    src_dir = tmp_path / "stream_in"
    src_dir.mkdir()
    rows = [
        {"user_id": 1, "t": "2024-01-01 00:00:00"},
        {"user_id": 1, "t": "2024-01-01 00:10:00"},
        {"user_id": 1, "t": "2024-01-01 01:00:00"},
        {"user_id": 2, "t": "2024-01-01 02:00:00"},
    ]
    (src_dir / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("user_id long, t string")
        .json(str(src_dir))
        .select("user_id", F.to_timestamp("t").alias("t"))
        .withWatermark("t", "2 hours")
    )
    q = (
        sessionize(stream, key_col="user_id", ts_col="t")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_out").collect()
    per_user = {}
    for r in got:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_syslog_udp_truncation_keeps_valid_utf8(spark):
    """The clamp must cut on a codepoint boundary: a multi-byte char
    split at the byte limit would emit an invalid-UTF-8 datagram."""
    class _UdpCollector(socketserver.DatagramRequestHandler):
        def handle(self):
            # strict decode: raises (and drops the line) on invalid UTF-8
            self.server.lines.append(self.rfile.read().decode("utf-8"))

    srv = socketserver.ThreadingUDPServer(("127.0.0.1", 0), _UdpCollector)
    srv.max_packet_size = 65536
    srv.lines = []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink = SyslogSink(
            SyslogConfig(port=srv.server_address[1], protocol="udp",
                         line_len_limit=0)
        )
        sink(_lines_df(spark, ["é" * 40_000]), 0)  # 80k bytes of 2-byte chars
        assert _wait(lambda: len(srv.lines) >= 1), "datagram never arrived"
        assert srv.lines[0].endswith("...[truncated]")
    finally:
        srv.shutdown()


def test_pipe_created_before_any_data_delivers(engine):
    """Regression: a pipe whose source directory is EMPTY at stream start
    must still deliver once data arrives. Two distinct Spark 4.1 failure
    modes are covered (see pipes/service.py): higher-order-function
    lambdas in the STREAMING plan die in IncrementalExecution re-analysis
    on the first non-empty batch after an empty start
    (PLAN_VALIDATION_FAILED_RULE_IN_BATCH), and the raw foreachBatch
    handoff renames columns positionally, crossing src/seq when the
    partition column isn't last in the schema."""
    assert (
        engine.execute("CREATE PIPE fresh FROM {name=cold} WHERE msg CONTAINS 'hit'")[
            "status"
        ]
        == "created"
    )
    # first write happens AFTER the stream started on an empty dir
    engine.write(
        {"name": "cold", "ns": "t"},
        [(BASE_TS, "hit one", {"k": "v"}), (BASE_TS + NS, "miss", {})],
    )

    def piped():
        try:
            return engine.query("SELECT FROM {logrange.pipe=fresh} LIMIT 10").collect()
        except Exception:
            return []

    assert _wait(lambda: len(piped()) == 1), "empty-start pipe never delivered"
    (r,) = piped()
    assert r["msg"] == "hit one"
    # columns are not crossed: src is the destination hash (string), seq long
    assert isinstance(r["src"], str) and r["seq"] == 1
    # enrichment folded source tags into fields; record field preserved
    assert r["fields"]["name"] == "cold"
    assert r["fields"]["ns"] == "t"
    assert r["fields"]["k"] == "v"


def test_forwarder_started_before_any_data_delivers(engine):
    """Same empty-start regression for the forwarder path: compile_format
    uses the higher-order F.transform, so the format projection must not
    sit in the streaming plan."""
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Collector)
    srv.lines = []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    q = start_forwarder(
        engine,
        "cold-fwd",
        'SELECT "{vars:level}|{msg}" FROM {name=coldfwd}',
        SyslogSink(SyslogConfig(port=port)),
    )
    try:
        engine.write(
            {"name": "coldfwd"},
            [(BASE_TS + i * NS, f"fwd msg {i}", {"level": "warn"}) for i in range(3)],
        )
        assert _wait(lambda: len(srv.lines) >= 3), f"got {len(srv.lines)} lines"
        assert any("warn|fwd msg 0" in l for l in srv.lines)
    finally:
        q.stop()
        srv.shutdown()


def test_pipe_prunes_source_partitions_and_widens_on_birth(engine):
    """Tag-pruned pipes read only matching partition dirs (brace-glob
    source), and the birth of a NEW matching partition restarts the pipe
    onto the widened glob with no records lost or duplicated."""
    from logrange_spark.lql.parser import parse_source

    engine.write({"name": "pp", "host": "h1"}, [(BASE_TS, "first part", {})])
    engine.write({"name": "unrelated"}, [(BASE_TS, "noise", {})])
    assert engine.execute("CREATE PIPE pp FROM {name=pp}")["status"] == "created"

    want = set(engine.resolve_sources(parse_source("{name=pp}"), cap=False))
    assert engine._pipe_srcs["pp"] == want and len(want) == 1

    def msgs():
        try:
            return sorted(
                r["msg"]
                for r in engine.query("SELECT FROM {logrange.pipe=pp} LIMIT 100").collect()
            )
        except Exception:
            return []

    assert _wait(lambda: msgs() == ["first part"]), msgs()

    # a second partition (different tag_line, same matching name tag) is
    # born AFTER the pipe started: the rescan must widen the source glob
    engine.write({"name": "pp", "host": "h2"}, [(BASE_TS + NS, "second part", {})])
    assert _wait(lambda: msgs() == ["first part", "second part"], timeout=45), msgs()
    assert len(engine._pipe_srcs["pp"]) == 2
    # noise partition stays outside the pruned set
    assert set(engine.resolve_sources(parse_source("{name=unrelated}"), cap=False)).isdisjoint(
        engine._pipe_srcs["pp"]
    )


def test_pipe_survives_source_compaction_without_duplicates(engine):
    """compact() rewrites a source partition's files under NEW names; a
    running pipe's file source re-lists them as unseen and re-delivers.
    The per-source high-water mark marks those batches suspicious and the
    provenance anti-join drops every already-delivered record — the
    destination must stay duplicate-free while new data keeps flowing."""
    from logrange_spark.pipes.service import PROV_SEQ, PROV_SRC

    for i in range(3):
        engine.write({"name": "cc"}, [(BASE_TS + i * NS, f"pre {i}", {})])
    assert engine.execute("CREATE PIPE cc FROM {name=cc}")["status"] == "created"

    def delivered():
        try:
            return engine.query("SELECT FROM {logrange.pipe=cc} LIMIT 100").collect()
        except Exception:
            return []

    assert _wait(lambda: len(delivered()) == 3), [r["msg"] for r in delivered()]

    # 3 small files -> 1: every source record re-appears under a new name
    from logrange_spark.lql.parser import parse_source

    rep = engine.compact(parse_source("{name=cc}"))
    assert rep and next(iter(rep.values()))["files_before"] == 3

    engine.write({"name": "cc"}, [(BASE_TS + 10 * NS, "post compact", {})])
    assert _wait(lambda: len(delivered()) == 4, timeout=45), [
        r["msg"] for r in delivered()
    ]
    # give any pending re-delivery batches time to (incorrectly) land
    time.sleep(4)
    rows = delivered()
    assert len(rows) == 4, sorted(r["msg"] for r in rows)
    prov = [(r["fields"][PROV_SRC], r["fields"][PROV_SEQ]) for r in rows]
    assert len(set(prov)) == 4, prov


def test_forwarder_prunes_and_widens_on_partition_birth(engine):
    """Forwarders get the same source pruning as pipes: the stream reads
    only partitions matching the FROM condition, and the birth of a new
    matching partition relaunches the query onto the widened glob (the
    caller's ForwarderHandle stays valid across the internal restart)."""
    engine.write({"name": "fw", "host": "h1"}, [(BASE_TS, "from h1", {"level": "x"})])
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Collector)
    srv.lines = []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    h = start_forwarder(
        engine,
        "fw-widen",
        'SELECT "{msg}" FROM {name=fw}',
        SyslogSink(SyslogConfig(port=srv.server_address[1])),
    )
    try:
        assert _wait(lambda: any("from h1" in l for l in srv.lines)), srv.lines
        assert engine._forwarder_srcs["fw-widen"] and len(engine._forwarder_srcs["fw-widen"]) == 1
        # new matching partition born after the forwarder started
        engine.write({"name": "fw", "host": "h2"}, [(BASE_TS + NS, "from h2", {"level": "x"})])
        assert _wait(lambda: any("from h2" in l for l in srv.lines), timeout=45), srv.lines
        assert len(engine._forwarder_srcs["fw-widen"]) == 2
    finally:
        h.stop()
        srv.shutdown()


def test_stream_interval_join_bounded_state(spark, tmp_path):
    """Watermarked stream-stream interval join in append mode: matches
    within the interval are emitted; a right event arriving after the
    watermark passed its interval is dropped (bounded state), and the
    same code gives identical pairs in batch (the oracle)."""
    import json as _json

    from pyspark.sql import functions as F

    from logrange_spark.streaming import stream_interval_join

    ldir, rdir = tmp_path / "sj_l", tmp_path / "sj_r"
    ldir.mkdir(), rdir.mkdir()
    ckpt = str(tmp_path / "sj_ckpt")

    def emit(d, name, rows):
        (d / name).write_text("\n".join(_json.dumps(x) for x in rows))

    def streams():
        ls = (
            spark.readStream.schema("k long, t string").json(str(ldir))
            .select("k", F.to_timestamp("t").alias("t"))
        )
        rs = (
            spark.readStream.schema("k long, rt string").json(str(rdir))
            .select("k", F.to_timestamp("rt").alias("rt"))
        )
        return stream_interval_join(
            ls, rs, key="k", lower="0 seconds", upper="10 minutes",
            watermark="10 minutes",
        ).select("k", "t", "rt")

    got: list = []

    def run_wave():
        q = (
            streams()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(lambda b, _id: got.extend(b.collect()))
            .start()
        )
        q.awaitTermination(120)

    # wave 1: one in-interval match (k=1), one out-of-interval right (k=2)
    emit(ldir, "l1.json", [
        {"k": 1, "t": "2024-01-01 10:00:00"},
        {"k": 2, "t": "2024-01-01 10:00:00"},
    ])
    emit(rdir, "r1.json", [
        {"k": 1, "rt": "2024-01-01 10:05:00"},   # within 10 min → match
        {"k": 2, "rt": "2024-01-01 11:00:00"},   # outside interval → no match
    ])
    run_wave()
    # wave 2: advance both watermarks well past wave 1
    emit(ldir, "l2.json", [{"k": 9, "t": "2024-01-01 13:00:00"}])
    emit(rdir, "r2.json", [{"k": 9, "rt": "2024-01-01 13:01:00"}])
    run_wave()
    # wave 3: a right event for k=1 arriving AFTER the watermark passed
    # its interval — bounded state means the left row is gone: no match
    emit(rdir, "r3.json", [{"k": 1, "rt": "2024-01-01 10:06:00"}])
    run_wave()

    pairs = sorted((r["k"], str(r["t"]), str(r["rt"])) for r in got)
    assert pairs == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:05:00"),
        (9, "2024-01-01 13:00:00", "2024-01-01 13:01:00"),
    ], pairs

    # batch twin: the same function over static frames matches DuckDB
    import duckdb

    lb = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:00:00")], "k long, t string"
    ).select("k", F.to_timestamp("t").alias("t"))
    rb = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00"), (2, "2024-01-01 11:00:00")], "k long, rt string"
    ).select("k", F.to_timestamp("rt").alias("rt"))
    s_rows = sorted(
        (r["k"], str(r["t"]), str(r["rt"]))
        for r in stream_interval_join(
            lb, rb, key="k", lower="0 seconds", upper="10 minutes"
        ).select("k", "t", "rt").collect()
    )
    d_rows = sorted(
        (k, str(t), str(rt))
        for k, t, rt in duckdb.sql(
            """
            SELECT l.k, l.t, r.rt
            FROM (VALUES (1, TIMESTAMP '2024-01-01 10:00:00'),
                         (2, TIMESTAMP '2024-01-01 10:00:00')) l(k, t)
            JOIN (VALUES (1, TIMESTAMP '2024-01-01 10:05:00'),
                         (2, TIMESTAMP '2024-01-01 11:00:00')) r(k, rt)
            ON l.k = r.k AND r.rt >= l.t AND r.rt <= l.t + INTERVAL 10 MINUTE
            """
        ).fetchall()
    )
    assert s_rows == d_rows == [(1, "2024-01-01 10:00:00", "2024-01-01 10:05:00")]


def test_pipe_duplicate_free_under_write_compact_truncate_storm(engine):
    """A live pipe consumes a source hammered by concurrent writer,
    compactor (small-file mode), and truncator threads. Invariants when
    the dust settles: the pipe never crashed, the destination holds ZERO
    duplicate provenance pairs (compaction re-lists files under new
    names; truncation deletes them mid-listing), and every source row
    that SURVIVED the storm was delivered at least once (rows truncated
    before the 1s trigger could list them may legitimately be absent)."""
    import threading as _th
    import time as _t

    from logrange_spark.lql.parser import parse_source
    from logrange_spark.pipes.service import PROV_SEQ, PROV_SRC

    assert engine.execute("CREATE PIPE storm FROM {name=ps}")["status"] == "created"

    total_batches, per = 12, 10
    stop = _th.Event()
    errors: list = []

    def writer():
        try:
            for b in range(total_batches):
                engine.write(
                    {"name": "ps"},
                    [(BASE_TS + (b * per + i) * NS, f"s{b}.{i}", {}) for i in range(per)],
                )
                _t.sleep(0.15)
        except Exception as e:
            errors.append(e)
        finally:
            stop.set()

    def compactor():
        try:
            while not stop.is_set():
                engine.compact(parse_source("{name=ps}"), target_file_bytes=1 << 20,
                               small_file_bytes=1 << 20)
                _t.sleep(0.3)
        except Exception as e:
            errors.append(e)

    def truncator():
        k = 0
        try:
            while not stop.is_set():
                k += 1
                cut = BASE_TS + min(k * per, total_batches * per // 2) * NS
                engine.execute(f'TRUNCATE {{name=ps}} MINSIZE 1 BEFORE "{cut}"')
                _t.sleep(0.25)
        except Exception as e:
            errors.append(e)

    threads = [_th.Thread(target=writer), _th.Thread(target=compactor), _th.Thread(target=truncator)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads) and not errors, errors

    surviving = {
        r["seq"] for r in engine.query("SELECT FROM {name=ps} LIMIT 10000").collect()
    }
    assert surviving, "source vanished"

    def delivered():
        try:
            return engine.query("SELECT FROM {logrange.pipe=storm} LIMIT 10000").collect()
        except Exception:
            return []

    # every surviving source row eventually delivered
    assert _wait(
        lambda: {int(r["fields"][PROV_SEQ]) for r in delivered()} >= surviving,
        timeout=60,
    ), (sorted(surviving - {int(r["fields"][PROV_SEQ]) for r in delivered()})[:10])
    # and exactly once, storm-wide
    _t.sleep(3)  # let any trailing re-delivery batches land (wrongly)
    prov = [(r["fields"][PROV_SRC], r["fields"][PROV_SEQ]) for r in delivered()]
    assert len(prov) == len(set(prov)), "duplicate delivery under storm"
    # the supervisor left a live query behind (transient mid-storm read
    # races may have killed earlier incarnations — that's its job)
    assert engine._pipe_queries["storm"].isActive


def test_supervisor_restarts_pipe_after_induced_failure(engine):
    """Deterministic supervisor check (the storm test covers the organic
    race): swap the live query entry for a stub that reports a crash;
    the supervisor must replace it with a live query on the same
    checkpoint, and delivery must resume without duplicating anything
    delivered before the "crash"."""
    import time as _t

    engine.write({"name": "sv"}, [(BASE_TS, "before", {})])
    assert engine.execute("CREATE PIPE sv FROM {name=sv}")["status"] == "created"

    def delivered():
        try:
            return sorted(
                r["msg"]
                for r in engine.query("SELECT FROM {logrange.pipe=sv} LIMIT 100").collect()
            )
        except Exception:
            return []

    assert _wait(lambda: delivered() == ["before"]), delivered()

    real = engine._pipe_queries["sv"]
    real.stop()

    class _DeadQuery:
        isActive = False

        @staticmethod
        def exception():
            return RuntimeError("induced crash")

        @staticmethod
        def stop():
            pass

    with engine._pipes_lock:
        engine._pipe_queries["sv"] = _DeadQuery()

    # the supervisor polls every ~2s; it must swap in a live query
    assert _wait(
        lambda: engine._pipe_queries["sv"] is not None
        and not isinstance(engine._pipe_queries["sv"], _DeadQuery)
        and engine._pipe_queries["sv"].isActive,
        timeout=20,
    ), "supervisor never replaced the dead query"

    # and delivery resumes, exactly-once (no duplicate of 'before')
    engine.write({"name": "sv"}, [(BASE_TS + NS, "after", {})])
    assert _wait(lambda: delivered() == ["after", "before"], timeout=45), delivered()


def test_redelivery_of_source_first_seen_in_later_batch_is_deduped(
    engine, monkeypatch
):
    """Regression for the per-source seeding hole: after a restart, the
    first batch seeds the high-water map only with the sources it
    contains; a LATER batch carrying redelivered rows of a different
    source must still be treated as suspicious (source absent from the
    map), not fast-pathed into duplicate delivery. One-file batches force
    the two sources' redeliveries into separate batches."""
    import time as _t

    from logrange_spark.pipes import service as psvc
    from logrange_spark.pipes.service import PROV_SEQ, PROV_SRC

    monkeypatch.setattr(psvc, "MAX_FILES_PER_TRIGGER", 1)

    engine.write({"name": "ra", "g": "1"}, [(BASE_TS, "a0", {})])
    engine.write({"name": "ra", "g": "2"}, [(BASE_TS + NS, "b0", {})])
    assert engine.execute("CREATE PIPE ra FROM {name=ra}")["status"] == "created"

    def delivered():
        try:
            return engine.query("SELECT FROM {logrange.pipe=ra} LIMIT 100").collect()
        except Exception:
            return []

    assert _wait(lambda: len(delivered()) == 2), [r["msg"] for r in delivered()]

    # force FULL redelivery of both sources in separate one-file batches:
    # stop the pipe, wipe its checkpoint, restart — everything re-lists
    import shutil as _sh

    with engine._pipes_lock:
        engine._pipe_queries.pop("ra").stop()
    _sh.rmtree(engine.pipes_dir + "/checkpoints/ra", ignore_errors=True)
    with engine._pipes_lock:
        engine._pipe_queries["ra"] = psvc.start_pipe(engine, engine._pipes["ra"])

    # add a fresh record so we can detect the restarted pipe caught up
    engine.write({"name": "ra", "g": "2"}, [(BASE_TS + 2 * NS, "b1", {})])
    assert _wait(
        lambda: sorted(r["msg"] for r in delivered()) == ["a0", "b0", "b1"],
        timeout=45,
    ), sorted(r["msg"] for r in delivered())
    _t.sleep(3)  # window for any wrongly fast-pathed duplicate to land
    prov = [(r["fields"][PROV_SRC], r["fields"][PROV_SEQ]) for r in delivered()]
    assert len(prov) == len(set(prov)) == 3, prov


def test_same_source_redelivery_split_across_batches_is_deduped(
    engine, monkeypatch
):
    """Regression for the suspicious-path seeding hole: when an
    anti-join drops EVERY row of a redelivered batch, the high-water
    mark must be seeded from the DESTINATION's max delivered seq, not
    the batch's own max. Otherwise redelivered seqs 0..k seed hw=k
    while dest already holds 0..N, and the next redelivered batch
    (seqs k+1.., min > k) fast-paths into duplicate delivery. One-file
    batches split one source's redelivery across ascending-seq batches."""
    import shutil as _sh
    import time as _t

    from logrange_spark.pipes import service as psvc
    from logrange_spark.pipes.service import PROV_SEQ, PROV_SRC

    monkeypatch.setattr(psvc, "MAX_FILES_PER_TRIGGER", 1)

    # three writes → three parquet files in ONE source, ascending seqs
    for i in range(3):
        engine.write({"name": "rs"}, [(BASE_TS + i * NS, f"m{i}", {})])
    assert engine.execute("CREATE PIPE rs FROM {name=rs}")["status"] == "created"

    def delivered():
        try:
            return engine.query("SELECT FROM {logrange.pipe=rs} LIMIT 100").collect()
        except Exception:
            return []

    assert _wait(lambda: len(delivered()) == 3), [r["msg"] for r in delivered()]

    # full redelivery: wipe the checkpoint so every file re-lists, one
    # file per batch — batch1 (seq 0) all-dropped, batch2 (seq 1) has
    # min seq 1 > a batch-seeded hw of 0 and would fast-path pre-fix
    with engine._pipes_lock:
        engine._pipe_queries.pop("rs").stop()
    _sh.rmtree(engine.pipes_dir + "/checkpoints/rs", ignore_errors=True)
    with engine._pipes_lock:
        engine._pipe_queries["rs"] = psvc.start_pipe(engine, engine._pipes["rs"])

    engine.write({"name": "rs"}, [(BASE_TS + 10 * NS, "fresh", {})])
    assert _wait(
        lambda: sorted(r["msg"] for r in delivered()) == ["fresh", "m0", "m1", "m2"],
        timeout=45,
    ), sorted(r["msg"] for r in delivered())
    _t.sleep(3)  # window for any wrongly fast-pathed duplicate to land
    prov = [(r["fields"][PROV_SRC], r["fields"][PROV_SEQ]) for r in delivered()]
    assert len(prov) == len(set(prov)) == 4, prov
    assert engine.execute("DELETE PIPE rs")["status"] == "deleted"
