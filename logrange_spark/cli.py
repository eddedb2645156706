"""`lr`-style command line interface (reference: cmd/lr, client/shell).

Subcommands:

    serve   --root DIR [--host H] [--port P]  run engine + HTTP server
            [--shards]  serve the read-only query tier over DIR's
                        shard-* stores (writers stay separate processes)
    query   'LQL'  [--server URL] [--follow]  run a SELECT, print events
    exec    'LQL'  [--server URL]             run an admin statement
    write   --tags 'k=v,...' [--fields ...]   read "message" lines on stdin
    shell   [--server URL]                    interactive prompt
    collect --root DIR --glob PAT [...]       collector: files → store
    forward --root DIR --query LQL --sink ... forwarder: store → syslog
    rebalance --root DIR [--shards N] [--dry-run]   offline shard rebalance
    truncate 'TRUNCATE ...' --root DIR [--shards N] sharded retention

query/exec/write/shell talk to a running server over HTTP; collect and
forward run an embedded engine against --root, mirroring the reference's
three `lr` modes (cmd/lr/main.go:66-70: collector, forwarder, shell).
"""

from __future__ import annotations

import argparse
import sys
import time

from .client import Client

DEFAULT_SERVER = "http://127.0.0.1:9966"


def _print_events(events: list[dict]) -> None:
    for ev in events:
        tags = f" {{{ev['tags']}}}" if ev["tags"] else ""
        fields = f" [{ev['fields']}]" if ev["fields"] else ""
        print(f"{ev['timestamp']}{tags}{fields} {ev['message']}")


def cmd_serve(args) -> int:
    from .engine import Engine
    from .server import Server
    from .session import build_session

    spark = build_session(app_name="logrange-spark-server")
    spark.sparkContext.setLogLevel("WARN")
    if getattr(args, "shards", False):
        from .shard import ShardReader

        engine = ShardReader(spark, args.root)
    else:
        engine = Engine(spark, args.root)
    srv = Server(engine, host=args.host, port=args.port).start()
    print(f"serving {args.root} on http://{args.host}:{srv.port}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        return 0
    finally:
        srv.stop()
        engine.close()
        spark.stop()


def cmd_query(args) -> int:
    c = Client(args.server)
    if args.follow:
        # clamp into the server's accepted range; with --wait 0 the server
        # answers instantly, so idle pacing happens client-side below
        wait = min(max(args.wait, 0), 60)
        res = c.query(args.lql, wait_timeout=wait)
        while True:
            _print_events(res["events"])
            if wait == 0 and not res["events"]:
                time.sleep(0.5)  # don't busy-spin the server
            res = c.query({**res["nextQueryRequest"], "waitTimeout": wait})
    for page in c.pages(args.lql, limit=args.limit):
        _print_events(page)
    return 0


def cmd_exec(args) -> int:
    print(Client(args.server).execute(args.lql))
    return 0


def cmd_write(args) -> int:
    c = Client(args.server)
    events = [{"message": line.rstrip("\n")} for line in sys.stdin if line.strip()]
    res = c.write(args.tags, events, fields=args.fields or None)
    print(f"wrote {res.get('records', 0)} records to {res.get('tag_line')}")
    return 0


def _embedded_engine(root: str, app: str):
    """Engine + session for daemon modes. build_session's getOrCreate may
    hand back a session someone else owns (tests, a notebook); the
    returned stop() only stops sessions this call actually created —
    but ALWAYS closes the engine: the store flock is held by the open
    LOCK fd, and leaving release to garbage collection makes a
    subsequent same-process open race the collector (a background
    rescan thread keeps the engine alive for seconds after the command
    returns — observed as a flaky 'store already owned' failure)."""
    from pyspark.sql import SparkSession

    from .engine import Engine
    from .session import build_session

    pre_existing = SparkSession.getActiveSession() is not None
    spark = build_session(app_name=app)
    spark.sparkContext.setLogLevel("WARN")
    engine = Engine(spark, root)

    def stop():
        try:
            engine.close()
        except Exception:
            pass
        if not pre_existing:
            spark.stop()

    return engine, spark, stop


def cmd_collect(args) -> int:
    """Collector mode (reference: cmd/lr collect → client/collector):
    scan files into the store; --once ingests what exists and exits."""
    from .ingest.scanner import ScanSchema, collect_into
    from .model.tags import parse_tags

    engine, spark, stop = _embedded_engine(args.root, "logrange-spark-collect")
    schema = ScanSchema(
        path_glob=args.glob,
        parser=args.parser,
        path_regex=args.path_regex or None,
        static_tags=parse_tags(args.tags) if args.tags else {},
        exclude_regexes=tuple(args.exclude or ()),
    )
    try:
        if args.once:
            collect_into(engine, schema)
            print("collected", flush=True)
            return 0
        q = collect_into(engine, schema, streaming=True)
        print(f"collecting {args.glob} into {args.root}", flush=True)
        q.awaitTermination()
        return 0
    except KeyboardInterrupt:
        return 0
    finally:
        stop()


def cmd_forward(args) -> int:
    """Forwarder mode (reference: cmd/lr forward → client/forwarder):
    continuously export matching records to a syslog sink."""
    from .forward import SyslogConfig, SyslogSink, start_forwarder

    engine, spark, stop = _embedded_engine(args.root, "logrange-spark-forward")
    host, _, port = args.sink.partition(":")
    cfg = SyslogConfig(
        host=host or "127.0.0.1",
        port=int(port or 514),
        protocol=args.protocol,
        root_ca_file=args.root_ca or "",
        framing=args.framing,
    )
    try:
        q = start_forwarder(engine, args.name, args.query, SyslogSink(cfg))
        print(f"forwarding {args.query!r} to {args.protocol}://{cfg.host}:{cfg.port}", flush=True)
        q.awaitTermination()
        return 0
    except KeyboardInterrupt:
        return 0
    finally:
        stop()


def _embedded_shard_engines(root: str, app: str, n: int | None):
    """Shard-tier analogue of ``_embedded_engine``: opens engines[i] over
    shard_root(root, i) for i in 0..n-1 (n defaults to the existing
    shard-* count; pass a LARGER n to grow the store). Same
    session-ownership rule: stop() closes every engine always, stops
    the session only if this call created it."""
    from pyspark.sql import SparkSession

    from . import shard as sh
    from .engine import Engine
    from .session import build_session

    roots = sh.shard_roots(root)
    count = n or len(roots)
    if count <= 0:
        raise SystemExit(f"no shard-* stores under {root!r} (pass --shards N)")
    if count < len(roots):
        # an admin job over a SUBSET of the shards is never right:
        # truncate's global MAXDBSIZE order would budget against half
        # the store, and rebalance would re-home srcs mod the wrong N
        raise SystemExit(
            f"--shards {count} is smaller than the {len(roots)} existing "
            "shard-* stores — refusing to run over a partial store"
        )
    pre_existing = SparkSession.getActiveSession() is not None
    spark = build_session(app_name=app)
    spark.sparkContext.setLogLevel("WARN")
    engines = [Engine(spark, sh.shard_root(root, i)) for i in range(count)]

    def stop():
        try:
            for e in engines:
                e.close()
        finally:
            if not pre_existing:
                spark.stop()

    return engines, spark, stop


def cmd_rebalance(args) -> int:
    """Offline shard rebalance (shard.rebalance_shards): move every
    mis-homed src to its pure-hash home under the current (or grown)
    shard count. Requires exclusive store ownership — the per-shard
    flocks refuse if writer processes are still up."""
    import json as _json

    from . import shard as sh

    engines, _spark, stop = _embedded_shard_engines(
        args.root, "logrange-spark-rebalance", args.shards
    )
    try:
        print(_json.dumps(sh.rebalance_shards(engines, dry_run=args.dry_run)))
        return 0
    finally:
        stop()


def cmd_maintain(args) -> int:
    """Periodic corpus-global maintenance over a streamed curation
    corpus (streaming/maintenance.maintain_cc_corpus): repeated-span
    removal + benchmark decontamination over the accumulated
    ``{path}_docs``, atomic rewrite, fingerprint-index refresh. The
    ingest stream must be STOPPED while this runs."""
    import json as _json

    from . import build_session
    from .streaming.maintenance import maintain_cc_corpus

    spark = build_session(app_name="logrange-spark-maintain")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        bench = (
            spark.read.parquet(args.benchmark) if args.benchmark else None
        )
        report = maintain_cc_corpus(
            spark, args.name, args.path, benchmark=bench,
            contam_max=args.contam_max, ngram=args.ngram,
            max_hamming=args.max_hamming, n_buckets=args.n_buckets,
        )
        print(_json.dumps(report))
        return 0
    finally:
        spark.stop()


def cmd_truncate(args) -> int:
    """Sharded retention: run one TRUNCATE statement across every shard
    store (MAXDBSIZE as the global oldest-first order). For a single
    store, use `exec 'TRUNCATE ...'` against a running server."""
    import json as _json

    from . import shard as sh

    engines, _spark, stop = _embedded_shard_engines(
        args.root, "logrange-spark-truncate", args.shards
    )
    try:
        rep = sh.ShardRouter(engines).truncate(args.lql)
        print(_json.dumps(rep))
        return 0
    finally:
        stop()


def cmd_shell(args) -> int:
    c = Client(args.server)
    print(f"connected to {args.server} — LQL statements; 'exit' to quit")
    while True:
        try:
            line = input("lr> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not line:
            continue
        if line.lower() in ("exit", "quit"):
            return 0
        if line.lower().startswith("help"):
            # reference shell help (client/shell/command.go:92-190)
            print(
                "commands:\n"
                "  SELECT ...            query records (pages of 100)\n"
                "  SHOW PARTITIONS|PIPES list partitions / pipes\n"
                "  DESCRIBE ...          partition / pipe details\n"
                "  CREATE|DELETE PIPE    manage pipes\n"
                "  TRUNCATE ...          retention (DRYRUN to preview)\n"
                "  help | exit | quit"
            )
            continue
        try:
            if line.upper().startswith("SELECT"):
                for page in c.pages(line, limit=100):
                    _print_events(page)
            else:
                print(c.execute(line))
        except Exception as e:
            print(f"error: {e}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="logrange-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("serve", help="run engine + HTTP server")
    s.add_argument("--root", required=True)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=9966)
    s.add_argument("--shards", action="store_true",
                   help="serve the read-only query tier over the "
                        "shard-* stores under --root")
    s.set_defaults(fn=cmd_serve)

    q = sub.add_parser("query", help="run a SELECT")
    q.add_argument("lql")
    q.add_argument("--server", default=DEFAULT_SERVER)
    q.add_argument("--limit", type=int, default=1000)
    q.add_argument("--follow", action="store_true")
    q.add_argument("--wait", type=int, default=30)
    q.set_defaults(fn=cmd_query)

    e = sub.add_parser("exec", help="run an admin statement")
    e.add_argument("lql")
    e.add_argument("--server", default=DEFAULT_SERVER)
    e.set_defaults(fn=cmd_exec)

    w = sub.add_parser("write", help="write stdin lines as records")
    w.add_argument("--tags", required=True)
    w.add_argument("--fields", default="")
    w.add_argument("--server", default=DEFAULT_SERVER)
    w.set_defaults(fn=cmd_write)

    sh = sub.add_parser("shell", help="interactive prompt")
    sh.add_argument("--server", default=DEFAULT_SERVER)
    sh.set_defaults(fn=cmd_shell)

    co = sub.add_parser("collect", help="collector: scan files into the store")
    co.add_argument("--root", required=True)
    co.add_argument("--glob", required=True)
    co.add_argument("--parser", default="text", choices=["pure", "text", "k8json", "logfmt"])
    co.add_argument("--path-regex", default="")
    co.add_argument("--tags", default="")
    co.add_argument("--exclude", action="append")
    co.add_argument("--once", action="store_true")
    co.set_defaults(fn=cmd_collect)

    fw = sub.add_parser("forward", help="forwarder: export records to syslog")
    fw.add_argument("--root", required=True)
    fw.add_argument("--query", required=True)
    fw.add_argument("--name", default="cli-forwarder")
    fw.add_argument("--sink", required=True, help="host:port")
    fw.add_argument("--protocol", default="tcp", choices=["tcp", "udp", "tls"])
    fw.add_argument("--root-ca", default="")
    fw.add_argument("--framing", default="rfc3164", choices=["rfc3164", "rfc5424"])
    fw.set_defaults(fn=cmd_forward)

    rb = sub.add_parser(
        "rebalance",
        help="offline shard rebalance: move srcs to their hash homes",
    )
    rb.add_argument("--root", required=True, help="directory of shard-* stores")
    rb.add_argument("--shards", type=int, default=None,
                    help="shard count (default: existing; larger = grow)")
    rb.add_argument("--dry-run", action="store_true")
    rb.set_defaults(fn=cmd_rebalance)

    mt = sub.add_parser(
        "maintain",
        help="corpus maintenance: span removal + decontamination over a "
             "streamed corpus (stream must be stopped)",
    )
    mt.add_argument("--name", required=True,
                    help="index table prefix (the stream's name)")
    mt.add_argument("--path", required=True,
                    help="corpus path prefix (the stream's path)")
    mt.add_argument("--benchmark", default="",
                    help="parquet path of the eval set to decontaminate "
                         "against (omit to skip decontamination)")
    mt.add_argument("--contam-max", type=float, default=0.5)
    mt.add_argument("--ngram", type=int, default=8)
    mt.add_argument("--max-hamming", type=int, default=3,
                    help="must match the bootstrap value")
    mt.add_argument("--n-buckets", type=int, default=64,
                    help="must match the bootstrap value")
    mt.set_defaults(fn=cmd_maintain)

    tr = sub.add_parser(
        "truncate", help="sharded retention: TRUNCATE across shard stores"
    )
    tr.add_argument("lql", help="TRUNCATE statement (quote it)")
    tr.add_argument("--root", required=True, help="directory of shard-* stores")
    tr.add_argument("--shards", type=int, default=None)
    tr.set_defaults(fn=cmd_truncate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
