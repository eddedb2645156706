"""`lr`-style command line interface (reference: cmd/lr, client/shell).

Subcommands:

    serve  --root DIR [--host H] [--port P]   run engine + HTTP server
    query  'LQL'  [--server URL] [--follow]   run a SELECT, print events
    exec   'LQL'  [--server URL]              run an admin statement
    write  --tags 'k=v,...' [--fields ...]    read "message" lines on stdin
    shell  [--server URL]                     interactive prompt

Everything but ``serve`` talks to a running server over HTTP — the
analogue of the reference's client mode (cmd/lr/main.go). ``serve``
starts a local Spark session and blocks.
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
        engine.stop_pipes()
        spark.stop()


def cmd_query(args) -> int:
    c = Client(args.server)
    if args.follow:
        res = c.query(args.lql, wait_timeout=args.wait)
        while True:
            _print_events(res["events"])
            res = c.query({**res["nextQueryRequest"], "waitTimeout": args.wait})
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

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
