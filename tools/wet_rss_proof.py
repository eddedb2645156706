"""Peak-RSS proof for the WARC/WET splitter's per-task memory bound.

Synthesizes a .warc.gz at CommonCrawl's design point (~1 GB
DECOMPRESSED; docstring claim in ingest/wet.py), then measures the
high-water RSS (``ru_maxrss``) of a fresh subprocess that emulates one
executor task: the compressed bytes arrive fully in memory (that is
what Spark's binaryFile source delivers — unavoidable), and the
splitter drains ``_wet_batches`` one emitted frame at a time.

Two modes, each its own subprocess so high-water marks don't mix:
- ``stream``  — the shipped path: incremental ``gzip.GzipFile`` decode,
  one-record-resident splitter, frames emitted every _EMIT_ROWS /
  _EMIT_BYTES. Expected peak ≈ gz bytes + O(one emission frame).
- ``eager``   — the pre-round-12 behavior reconstructed for contrast:
  full ``gzip.decompress`` + every record of the file accumulated into
  ONE pandas frame. Expected peak ≈ gz + decompressed + full frame.

Usage:  python tools/wet_rss_proof.py [--mb 1024] [--mode driver]
Result lands in SCALE.md (WARC/WET memory-bound row).
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import random
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WORDS = (
    "the quick brown fox jumps over a lazy dog while seventeen "
    "crawlers index boundless pages of text for training corpora "
).split()


def synthesize(path: str, target_mb: int) -> tuple[int, int]:
    """Write a WET-shaped .warc.gz whose DECOMPRESSED size is
    ~target_mb; ~10 KB of pseudo-text per conversion record (CommonCrawl
    median-ish). Returns (n_records, decompressed_bytes)."""
    rng = random.Random(12)
    target = target_mb << 20
    written = 0
    n = 0
    with gzip.open(path, "wb", compresslevel=1) as gz:
        info = b"software: rss-proof"
        gz.write(
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: %d\r\n\r\n"
            % len(info) + info + b"\r\n\r\n"
        )
        while written < target:
            body = (" ".join(rng.choices(WORDS, k=1600))).encode()
            hdr = (
                f"WARC/1.0\r\nWARC-Type: conversion\r\n"
                f"WARC-Target-URI: http://host{n % 997}.example/p/{n}\r\n"
                f"WARC-Date: 2020-01-01T00:00:00Z\r\n"
                f"WARC-Record-ID: <urn:uuid:{n}>\r\n"
                f"WARC-Block-Digest: sha1:{n:040x}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            gz.write(hdr + body + b"\r\n\r\n")
            written += len(hdr) + len(body) + 4
            n += 1
    return n, written


def run_task(mode: str, path: str) -> None:
    """Child process: emulate one executor task and print a JSON line
    with rows parsed, wall seconds, and peak RSS in MB."""
    import pandas as pd

    from logrange_spark.ingest import wet

    with open(path, "rb") as f:
        content = f.read()  # what binaryFile hands the task
    batch = pd.DataFrame({"path": [path], "content": [content]})
    t0 = time.monotonic()
    rows = 0
    if mode == "stream":
        for frame in wet._wet_batches(iter([batch])):
            rows += len(frame)  # drain; Arrow would serialize-and-free
    else:  # eager: the pre-round-12 shape, for contrast
        buf = gzip.decompress(content)
        out = []
        for off, h, body in wet._iter_records(buf):
            if h.get("warc-type") != "conversion":
                continue
            out.append((path, off, h.get("warc-record-id"),
                        h.get("warc-target-uri"), h.get("warc-date"),
                        h.get("warc-block-digest"), len(body),
                        body.decode("utf-8", errors="replace")))
        frame = pd.DataFrame(out, columns=[f.name for f in wet.WET_SCHEMA])
        rows = len(frame)
    wall = time.monotonic() - t0
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(json.dumps({
        "mode": mode, "rows": rows, "wall_sec": round(wall, 2),
        "peak_rss_mb": round(peak_kb / 1024, 1),
        "gz_mb": round(len(content) / 2**20, 1),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=1024,
                    help="decompressed target size in MiB")
    ap.add_argument("--mode", default="driver",
                    choices=["driver", "stream", "eager"])
    ap.add_argument("--path", default="/tmp/wet_rss_proof.warc.gz")
    args = ap.parse_args()
    if args.mode != "driver":
        run_task(args.mode, args.path)
        return
    n, dec = synthesize(args.path, args.mb)
    gz_mb = os.path.getsize(args.path) / 2**20
    print(json.dumps({"records": n, "decompressed_mb": args.mb,
                      "gz_mb": round(gz_mb, 1)}))
    for mode in ("stream", "eager"):
        r = subprocess.run(
            [sys.executable, __file__, "--mode", mode,
             "--path", args.path],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            sys.stdout.write(json.dumps(
                {"mode": mode, "error": r.stderr.strip()[-400:]}) + "\n")


if __name__ == "__main__":
    main()
