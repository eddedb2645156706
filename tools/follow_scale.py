"""Tail-follow latency at store scale (VERDICT r12 #5).

Builds (or reuses) a 10M-row / 20-partition engine store, then measures
the `tail -f` path the way a live consumer sees it:

- TAIL attach: time to seed the end-of-stream cursor (`tail_cursor`) —
  one catalog-pruned tail-1 probe.
- write→yield visibility through a live `engine.follow` consumer, 30
  single-record probes, in TWO regimes:
  * quiet — only the followed partition receives writes;
  * noisy — a background writer lands ~20 writes/s on OTHER partitions,
    so every one of those wakes the follower. Round 13's seq-high-water
    fast path answers those wakeups from the chunk catalog in
    microseconds (zero Spark jobs); before it, each one paid a full
    plan-build + pruned scan, which is exactly what pushed p99 to
    2.47 s at this store size in round 12.

Writes ``follow_scale.json`` at the repo root; bench.py merges it into
bench_detail.json ("follow_at_scale") so the number travels with the
round's bench artifact.

Usage: python tools/follow_scale.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STORE = os.environ.get(
    "SPARK_GRAFT_FOLLOW_STORE", "/tmp/lrspark_scale/engine10m_seq"
)
N_PARTS = 20
ROWS_PER_PART = 500_000
BATCH = 5_000
BASE = 1_700_000_000 * 10**9


def build_store(engine) -> float:
    from concurrent.futures import ThreadPoolExecutor

    def load(p: int) -> None:
        tags = {"name": f"store{p:02d}"}
        for b in range(ROWS_PER_PART // BATCH):
            base = BASE + (b * BATCH) * 10**6
            engine.write(
                tags,
                [(base + i * 10**6, f"p{p} b{b} r{i} payload xyzzy", {})
                 for i in range(BATCH)],
            )

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(load, range(N_PARTS)))
    # drain autocompaction so the measurement sees a settled store
    deadline = time.time() + 300
    while time.time() < deadline:
        with engine._write_lock:
            pending, engine._autocompact_pending = (
                set(engine._autocompact_pending), set())
        if pending:
            engine._maybe_autocompact(sorted(pending))
        if not pending and not engine._autocompact_running:
            break
        time.sleep(0.5)
    return time.time() - t0


def _pct(vals, p):
    if not vals:
        return float("nan")
    s = sorted(vals)
    return round(s[min(len(s) - 1, int(p * len(s)))], 1)


def measure_follow(engine, label: str, noisy: bool) -> dict:
    n_follow = 30
    received: dict[str, float] = {}
    write_ts: dict[str, float] = {}
    stop = threading.Event()

    def _noise() -> None:
        i = 0
        while not stop.is_set():
            engine.write({"name": f"store{(i % (N_PARTS - 1)) + 1:02d}"},
                         [(time.time_ns(), f"noise {i}", {})])
            i += 1
            time.sleep(0.05)

    def _tail() -> None:
        for batch in engine.follow(
            "SELECT FROM {name=store00} POSITION tail", wait_timeout_s=20.0
        ):
            now = time.time()
            for r in batch:
                if r["msg"].startswith("follow probe"):
                    received.setdefault(r["msg"], now)
            if len(received) >= n_follow:
                return

    th = threading.Thread(target=_tail, daemon=True)
    th.start()
    time.sleep(2.0)  # follower seeds its tail cursor + first scan
    noise_th = None
    if noisy:
        noise_th = threading.Thread(target=_noise, daemon=True)
        noise_th.start()
        time.sleep(0.5)
    for i in range(n_follow):
        msg = f"follow probe {label} {i}"
        write_ts[msg] = time.time()
        # wall-clock ts: strictly increasing across runs on a REUSED
        # store, so every probe sorts after the seeded tail cursor
        engine.write({"name": "store00"}, [(time.time_ns(), msg, {})])
        time.sleep(0.25)
    th.join(timeout=90)
    stop.set()
    if noise_th:
        noise_th.join(timeout=5)
    lats = [(received[m] - write_ts[m]) * 1000.0
            for m in write_ts if m in received]
    return {
        "regime": label,
        "samples": len(lats),
        "p50_ms": _pct(lats, 0.50),
        "p99_ms": _pct(lats, 0.99),
        "max_ms": _pct(lats, 1.0),
    }


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from logrange_spark import Engine, build_session

    spark = build_session(app_name="follow-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rebuild = "--rebuild" in sys.argv or not os.path.isdir(STORE)
    if rebuild and os.path.isdir(STORE):
        import shutil
        shutil.rmtree(STORE)
    os.makedirs(STORE, exist_ok=True)
    eng = Engine(spark, STORE)
    build_sec = build_store(eng) if rebuild else None

    total = eng.logs().count()
    n_files = sum(
        1 for _, _, files in os.walk(os.path.join(STORE, "logs"))
        for f in files if f.endswith(".parquet")
    )

    # TAIL attach: seed the end-of-stream cursor 20x
    from logrange_spark.lql.parser import parse_lql

    stmt = parse_lql("SELECT FROM {name=store00} POSITION tail")
    eng.tail_cursor(stmt)  # untimed warm pass (the pinned bench protocol)
    attach = []
    for _ in range(20):
        t0 = time.time()
        eng.tail_cursor(stmt)
        attach.append((time.time() - t0) * 1000.0)

    quiet = measure_follow(eng, "quiet", noisy=False)
    noisy = measure_follow(eng, "noisy", noisy=True)

    out = {
        "store_rows": total,
        "store_partitions": N_PARTS,
        "store_files": n_files,
        "build_sec": round(build_sec, 1) if build_sec else "reused",
        "tail_attach_ms_p50": _pct(attach, 0.50),
        "tail_attach_ms_p99": _pct(attach, 0.99),
        "follow": [quiet, noisy],
    }
    with open(os.path.join(REPO, "follow_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("FOLLOW_SCALE " + json.dumps(out))
    eng.close()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
