"""Headline benchmark: runs the engine's flagship queries end-to-end.

Reads ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced with a noop-format write so the full plan executes
(scan → shuffle → result) without driver-side collect overhead.

Each headline query runs ``$SPARK_GRAFT_BENCH_RUNS`` (default 3) times and
the reported per-query number is the MIN of the warm runs — environment
noise (a contended sandbox) showed up as ±2× swings on identical code in
rounds 3/4, and min-of-n is the standard way to recover the true cost of a
deterministic computation under noise. The raw per-run timings are also
emitted (``"runs"``) so a regression can be told apart from one noisy run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


# Pinned driver-measured per-query seconds from the previous rounds'
# BENCH_r{N}.json (min-of-3 warm, sf0.1, local[32]) — emitted as a delta
# column so a hardening round can't silently re-inflate a query family
# (the round-7 dedup regression was only visible by diffing two files).
PREV_ROUNDS = {
    "r06": {
        "lql_contains": 0.411, "lql_tail": 0.451, "lql_format": 0.404,
        "show_partitions": 0.29, "pricing_summary": 1.23,
        "revenue_by_segment": 1.278, "revenue_by_nation": 1.386,
        "top_orders_per_customer": 0.348, "events_hourly": 0.52,
        "dedup_exact": 0.251, "dedup_lsh_candidates": 1.433,
        "dedup_near_duplicates": 1.591, "dedup_simhash_pairs": 2.324,
        "text_stats": 0.819, "text_top_words": 0.294,
        "ann_cosine_topk": 0.535, "ann_bucketed_topk": 0.611,
        "dedup_embedding": 0.997, "parse_k8json": 1.49,
        "events_sessions": 0.459, "events_asof": 0.397,
        "events_range_join": 0.356, "training_pipeline": 1.743,
    },
    "r07": {
        "lql_contains": 0.401, "lql_tail": 0.391, "lql_format": 0.402,
        "show_partitions": 0.295, "pricing_summary": 1.122,
        "revenue_by_segment": 1.187, "revenue_by_nation": 1.382,
        "top_orders_per_customer": 0.35, "events_hourly": 0.472,
        "dedup_exact": 0.242, "dedup_lsh_candidates": 2.452,
        "dedup_near_duplicates": 2.169, "dedup_simhash_pairs": 3.158,
        "text_stats": 0.823, "text_top_words": 0.301,
        "ann_cosine_topk": 0.56, "ann_bucketed_topk": 0.604,
        "dedup_embedding": 1.711, "parse_k8json": 1.761,
        "events_sessions": 0.47, "events_asof": 0.466,
        "events_range_join": 0.443, "training_pipeline": 2.97,
    },
    # r08 driver numbers RECONSTRUCTED as r07 x (1 + delta_vs_prev.r07)
    # from BENCH_r08.json's captured tail (its head was truncated) —
    # each number carries up to ~0.1% rounding error from the 3-decimal
    # deltas (flagged as "r08~" in the emitted delta keys); the
    # run-triples visible in that tail match these minima exactly.
    "r08~": {
        "lql_contains": 0.446, "lql_tail": 0.516, "lql_format": 0.427,
        "show_partitions": 0.33, "pricing_summary": 1.418,
        "revenue_by_segment": 1.31, "revenue_by_nation": 1.502,
        "top_orders_per_customer": 0.402, "events_hourly": 0.497,
        "dedup_exact": 0.294, "dedup_lsh_candidates": 1.935,
        "dedup_near_duplicates": 1.904, "dedup_simhash_pairs": 2.567,
        "text_stats": 0.509, "text_top_words": 0.285,
        "ann_cosine_topk": 0.556, "ann_bucketed_topk": 0.568,
        "dedup_embedding": 1.16, "parse_k8json": 1.607,
        "events_sessions": 0.417, "events_asof": 0.372,
        "events_range_join": 0.394, "training_pipeline": 1.935,
    },
    # r10/r11 driver-measured minima, verbatim from BENCH_r{10,11}.json
    # "parsed". NOISE FLOOR: r10 → r11 moved −10.1% total with ZERO code
    # change between the runs — that swing is the measured ambient
    # variance of this protocol (min-of-3-warm on a shared sandbox), so
    # any single-round delta under ~10% is NOT signal; read the medians
    # and the multi-round trend instead.
    "r10": {
        "lql_contains": 0.207, "lql_tail": 0.224, "lql_format": 0.252,
        "show_partitions": 0.204, "pricing_summary": 1.173,
        "revenue_by_segment": 1.165, "revenue_by_nation": 1.323,
        "top_orders_per_customer": 0.339, "events_hourly": 0.403,
        "dedup_exact": 0.225, "dedup_lsh_candidates": 1.623,
        "dedup_near_duplicates": 1.702, "dedup_simhash_pairs": 2.187,
        "text_stats": 0.494, "text_top_words": 0.336,
        "ann_cosine_topk": 0.604, "ann_bucketed_topk": 0.628,
        "dedup_embedding": 1.153, "parse_k8json": 1.351,
        "events_sessions": 0.359, "events_asof": 0.308,
        "events_range_join": 0.319, "training_pipeline": 1.953,
    },
    "r11": {
        "lql_contains": 0.186, "lql_tail": 0.209, "lql_format": 0.231,
        "show_partitions": 0.167, "pricing_summary": 1.058,
        "revenue_by_segment": 1.011, "revenue_by_nation": 1.223,
        "top_orders_per_customer": 0.301, "events_hourly": 0.38,
        "dedup_exact": 0.205, "dedup_lsh_candidates": 1.531,
        "dedup_near_duplicates": 1.54, "dedup_simhash_pairs": 2.034,
        "text_stats": 0.444, "text_top_words": 0.242,
        "ann_cosine_topk": 0.414, "ann_bucketed_topk": 0.424,
        "dedup_embedding": 0.976, "parse_k8json": 1.27,
        "events_sessions": 0.365, "events_asof": 0.316,
        "events_range_join": 0.309, "training_pipeline": 1.818,
    },
    # r12 driver-measured minima, verbatim from BENCH_r12.json "parsed"
    # (protocol: min-of-3 warm, sf0.1, local[32], 24g driver heap)
    "r12": {
        "lql_contains": 0.25, "lql_tail": 0.291, "lql_format": 0.317,
        "show_partitions": 0.239, "pricing_summary": 1.372,
        "revenue_by_segment": 1.319, "revenue_by_nation": 1.366,
        "top_orders_per_customer": 0.32, "events_hourly": 0.424,
        "dedup_exact": 0.217, "dedup_lsh_candidates": 1.637,
        "dedup_near_duplicates": 1.492, "dedup_simhash_pairs": 2.228,
        "text_stats": 0.496, "text_top_words": 0.267,
        "ann_cosine_topk": 0.463, "ann_bucketed_topk": 0.499,
        "dedup_embedding": 1.181, "parse_k8json": 1.552,
        "events_sessions": 0.397, "events_asof": 0.374,
        "events_range_join": 0.344, "training_pipeline": 2.008,
    },
    # r13 driver-measured minima, verbatim from BENCH_r13.json "parsed"
    # (first round with the 29-query flagship set; cc_pipeline at r13 ran
    # 5 of the 11 stages the r14 capstone composes — its delta vs this
    # pin is added WORK, attributed in SCALE.md "Round 14")
    "r13": {
        "lql_contains": 0.186, "lql_tail": 0.206, "lql_format": 0.223,
        "show_partitions": 0.166, "pricing_summary": 0.912,
        "revenue_by_segment": 0.953, "revenue_by_nation": 1.364,
        "top_orders_per_customer": 0.36, "events_hourly": 0.427,
        "dedup_exact": 0.232, "dedup_lsh_candidates": 2.332,
        "dedup_near_duplicates": 2.429, "dedup_simhash_pairs": 3.858,
        "text_stats": 0.499, "text_top_words": 0.24,
        "ann_cosine_topk": 0.419, "ann_bucketed_topk": 0.436,
        "dedup_embedding": 1.219, "parse_k8json": 1.488,
        "events_sessions": 0.372, "events_asof": 0.352,
        "events_range_join": 0.396, "training_pipeline": 2.72,
        "gopher_stats": 0.49, "lang_predict": 1.769,
        "kn_bigram_ppl": 1.022, "wet_documents": 0.58,
        "cc_pipeline": 7.327, "url_dedup": 0.376,
    },
    # r14 driver-measured minima, verbatim from BENCH_r14.json "parsed".
    # Read WITH the r14 verdict's load context: the artifact's own
    # median/min gap was 37%% and the same-code same-day spread 38.8-50.2 s
    # — r15's calibration probe exists precisely because these pins were
    # taken under unmeasured contention.
    "r14": {
        "lql_contains": 0.241, "lql_tail": 0.243, "lql_format": 0.261,
        "show_partitions": 0.194, "pricing_summary": 1.169, "revenue_by_segment": 1.305,
        "revenue_by_nation": 1.489, "top_orders_per_customer": 0.333, "events_hourly": 0.427,
        "dedup_exact": 0.231, "dedup_lsh_candidates": 2.521, "dedup_near_duplicates": 3.033,
        "dedup_simhash_pairs": 4.89, "text_stats": 0.481, "text_top_words": 0.327,
        "ann_cosine_topk": 0.533, "ann_bucketed_topk": 0.518, "dedup_embedding": 1.012,
        "parse_k8json": 1.249, "events_sessions": 0.378, "events_asof": 0.405,
        "events_range_join": 0.426, "training_pipeline": 3.292, "gopher_stats": 0.696,
        "lang_predict": 2.86, "kn_bigram_ppl": 2.428, "wet_documents": 1.254,
        "cc_pipeline": 18.352, "url_dedup": 0.528, "quality_signals": 3.34,
    },
    # r09 driver-measured minima, verbatim from BENCH_r09.json "parsed"
    "r09": {
        "lql_contains": 0.336, "lql_tail": 0.388, "lql_format": 0.387,
        "show_partitions": 0.299, "pricing_summary": 1.148,
        "revenue_by_segment": 1.181, "revenue_by_nation": 1.342,
        "top_orders_per_customer": 0.347, "events_hourly": 0.454,
        "dedup_exact": 0.238, "dedup_lsh_candidates": 1.716,
        "dedup_near_duplicates": 2.078, "dedup_simhash_pairs": 2.561,
        "text_stats": 0.54, "text_top_words": 0.293,
        "ann_cosine_topk": 0.569, "ann_bucketed_topk": 0.538,
        "dedup_embedding": 1.157, "parse_k8json": 1.53,
        "events_sessions": 0.455, "events_asof": 0.435,
        "events_range_join": 0.4, "training_pipeline": 2.395,
    },
}

HEADLINE = [
    "lql_contains",
    "lql_tail",
    "lql_format",
    "show_partitions",
    "pricing_summary",
    "revenue_by_segment",
    "revenue_by_nation",
    "top_orders_per_customer",
    "events_hourly",
    "dedup_exact",
    "dedup_lsh_candidates",
    "dedup_near_duplicates",
    "dedup_simhash_pairs",
    "text_stats",
    "text_top_words",
    "ann_cosine_topk",
    "ann_bucketed_topk",
    "dedup_embedding",
    "parse_k8json",
    "events_sessions",
    "events_asof",
    "events_range_join",
    "training_pipeline",
    # round-13 flagship additions (VERDICT r12 #3): the r10-r12 flagship
    # surface must regress VISIBLY in BENCH_r{N}, not only in SCALE.md
    # one-offs. The original 23 stay for round-over-round continuity;
    # delta_total_vs_prev sums only over each prior round's own set, so
    # totals remain comparable.
    "gopher_stats",
    "lang_predict",
    "kn_bigram_ppl",
    "wet_documents",
    "cc_pipeline",
    # round-13 addition: the URL stage (ops/url.py) — normalize + keep-
    # best dedup, the RefinedWeb first-pass representative
    "url_dedup",
    # round-14 addition: the one-pass Dolma-style attribute row — the
    # new flagship surface must regress visibly in BENCH (r12 rule)
    "quality_signals",
    # round-16 addition (VERDICT r15 #5): the 64-bit simhash row IS the
    # declared 100 TB fingerprint path since r12 — it benches in
    # HEADLINE per the r12 flagship-visibility rule; the 16-bit
    # dedup_simhash_pairs row stays for round-over-round continuity
    "dedup_simhash64_pairs",
]

# Apples-to-apples DuckDB comparison rule (VERDICT r15 #3): the total
# ratio mixes rows where DuckDB finishes in 8-100 ms — there Spark's
# fixed ~0.2 s/job session overhead IS the measurement (it amortizes at
# real scale) — with compute-bound rows where both engines do real work.
# The COMPUTE-BOUND subset keeps rows whose DuckDB side is >= this
# floor, and excludes cc_pipeline: its twin starts from the documents
# table and skips the WARC/gzip/HTML decode that dominates the Spark
# side, so the two sides don't run the same work. Both ratios publish
# on the parsed line; BASELINE.md states the rule.
DUCK_COMPUTE_FLOOR_SEC = 0.3
DUCK_NON_COMPARABLE = {"cc_pipeline"}


# Calibration references: min-of-6 of each probe, pinned on the
# QUIETEST window observed in round 15 — the run whose legacy-23 total
# landed at 1.009x the r13 pins (BENCH artifact of 2026-08-16 16:55;
# the same run re-pinned wet_documents to 0.91x and lang_predict to
# 1.19x r13, closing the r14 attribution gap as load, not code).
# Future rounds divide their probe minima by these to get LOAD
# FACTORS: a probe at 2x ref says the sandbox was ~2x contended, and
# per-query deltas of that size are ambient, not code.
CAL_REF_SEC = 0.094
# The cached-frame probe measures CPU contention ONLY — a disk/IO
# burst (observed mid-r15: shuffle-heavy rows 2-3x slow while the
# probe read 0.93x) is invisible to it. The shuffle probe below reads
# orders UNCACHED and shuffles it, so its wall moves with disk + spill
# contention too; both refs pinned on the same quiet window.
CAL_SHUFFLE_REF_SEC = 0.139

DUCK_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings"]


def _calibration_probe(spark, sf_dir: str, n: int) -> list[float]:
    """Fixed ambient-load probes, returned as (cpu_runs, shuffle_runs):
    a 32-bucket sum/avg/count over a CACHED lineitem projection (pure
    executor CPU — moves only with CPU contention) and an UNCACHED
    orders scan + 64-bucket shuffle agg (moves with disk and shuffle-
    spill contention too; the r15 mid-round incident showed a pure-CPU
    probe reading 0.93x while an IO burst ran shuffle-heavy rows
    2-3x slow)."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .cache()
    )
    df.count()  # materialize untimed
    runs = []
    for _ in range(n):
        t0 = time.time()
        (
            df.groupBy((F.col("l_partkey") % 32).alias("b"))
            .agg(
                F.sum("l_quantity").alias("s"),
                F.avg("l_extendedprice").alias("a"),
                F.count("*").alias("n"),
            )
            .write.format("noop").mode("overwrite").save()
        )
        runs.append(round(time.time() - t0, 3))
    df.unpersist()
    shuffle_runs = []
    for _ in range(n):
        t0 = time.time()
        (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .groupBy((F.col("o_custkey") % 64).alias("b"))
            .agg(F.sum("o_totalprice").alias("s"), F.count("*").alias("n"))
            .write.format("noop").mode("overwrite").save()
        )
        shuffle_runs.append(round(time.time() - t0, 3))
    return runs, shuffle_runs


def _bench_duckdb(entry_mod, sf_dir: str, n_runs: int) -> dict:
    """DuckDB wall time for every headline query's oracle twin, same
    machine, same min-of-n-warm discipline — the absolute single-node
    referent the 'within 2x of BASELINE' bar lacked (the reference
    publishes README claims, not numbers; VERDICT r14 #6).

    Read the ratios with two caveats: (1) the twins are CORRECTNESS
    oracles — several are deliberately window-function-shaped where the
    Spark plan is a hash aggregate; (2) at sf0.1 Spark pays a fixed
    ~0.2 s per-job overhead that dominates sub-second rows, flattering
    an in-process engine. The ratio is a referent, not a grade; the
    scale story lives in dedup_x10 / SCALE.md."""
    import duckdb

    allsql = {**entry_mod._RETIRED_ORACLES, **entry_mod.oracle_sql()}
    con = duckdb.connect()
    for t in DUCK_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in HEADLINE:
        sql = allsql.get(name)
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            con.execute(sql).fetchall()
            runs.append(round(time.time() - t0, 3))
        queries[name] = min(runs)
        raw[name] = runs
    con.close()
    return {
        "queries": queries,
        "runs": raw,
        "total": round(sum(queries.values()), 3),
    }


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from logrange_spark import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # The benchmark heap is part of the pinned protocol: the library
    # default is a conservative 8g (session.py), but the r12 numbers were
    # taken at 24g and the round-13 8g-vs-24g A/B (bench_detail.json
    # "heap_ab") showed the heap itself moves fixed-overhead-dominated
    # queries, so the round-over-round basis is declared here and
    # recorded in the protocol block.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    heap = os.environ["SPARK_GRAFT_DRIVER_MEM"]

    spark = build_session(app_name="logrange-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: initialize codegen, parquet reader, shuffle and the
    # noop sink so the first timed query doesn't absorb JVM startup cost
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.groupBy("n_regionkey").count().write.format("noop").mode("overwrite").save()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # headline membership is stable across rounds for comparability —
    # rows rotated out of the 50-entry ORACLE registry (lql_format,
    # top_orders_per_customer in round 8) still bench here
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    # untimed warm pass over every headline query: the per-query run
    # triples show first runs absorbing plan-build + scan-cache cold
    # costs (e.g. dedup_lsh_candidates [5.03, 2.42, 1.88] in round 10's
    # A/B) — warming once lets min-of-n converge to the true cost even
    # under a contended sandbox. Disable with SPARK_GRAFT_BENCH_WARM=0.
    warm = os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0"
    if warm:
        for name in HEADLINE:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    cal_start, cal_sh_start = _calibration_probe(spark, sf_dir, max(3, n_runs))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    total = 0.0
    total_median = 0.0
    for name in HEADLINE:
        fn = qs[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        raw_runs[name] = runs
        best = min(runs)
        timings[name] = best
        total += best
        srt = sorted(runs)
        med = srt[len(runs) // 2] if len(runs) % 2 else (
            (srt[len(runs) // 2 - 1] + srt[len(runs) // 2]) / 2
        )
        med = round(med, 3)  # uniform formatting for any n_runs
        medians[name] = med
        total_median += med
    cal_end, cal_sh_end = _calibration_probe(spark, sf_dir, max(3, n_runs))
    cal_min = min(cal_start + cal_end)
    cal_sh_min = min(cal_sh_start + cal_sh_end)
    # r17 (VERDICT r16 #3): publish a load-normalized total NEXT TO the
    # raw one, so cross-round comparisons made across load regimes can
    # be read against the calibration pair without re-deriving it (the
    # r15→r16 comparison's 0.82 raw geomean was a 1.5-1.7× host-load
    # artifact; the probes measured it but the headline number hid it).
    # Normalizer: the shuffle probe's load factor — it moves with CPU
    # AND disk/shuffle contention (the cpu probe alone missed the r15
    # IO burst). Raw totals remain the official protocol number;
    # additions only.
    cal_norm_factor = max(1.0, round(cal_sh_min / CAL_SHUFFLE_REF_SEC, 2))
    calibration = {
        "start_runs": cal_start,
        "end_runs": cal_end,
        "min_sec": cal_min,
        "ref_sec": CAL_REF_SEC,
        "load_factor": round(cal_min / CAL_REF_SEC, 2),
        "shuffle_start_runs": cal_sh_start,
        "shuffle_end_runs": cal_sh_end,
        "shuffle_min_sec": cal_sh_min,
        "shuffle_ref_sec": CAL_SHUFFLE_REF_SEC,
        "shuffle_load_factor": round(cal_sh_min / CAL_SHUFFLE_REF_SEC, 2),
    }

    # DuckDB comparator (VERDICT r14 #6): absolute single-node referent
    # for every headline row, same trial discipline. Skippable with
    # SPARK_GRAFT_BENCH_DUCKDB=0 (adds ~60 s at sf0.1).
    duck = None
    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0":
        duck = _bench_duckdb(entry_mod, sf_dir, n_runs)
        duck["ratio"] = {
            n: round(timings[n] / duck["queries"][n], 2)
            for n in duck["queries"]
            if duck["queries"][n] > 0
        }
        # compute-bound subset (the official apples-to-apples reading —
        # see DUCK_COMPUTE_FLOOR_SEC above and BASELINE.md)
        comp = [
            n
            for n, v in duck["queries"].items()
            if v >= DUCK_COMPUTE_FLOOR_SEC and n not in DUCK_NON_COMPARABLE
        ]
        duck["compute_bound"] = {
            "rule": (
                f"duckdb_sec >= {DUCK_COMPUTE_FLOOR_SEC}"
                f", excluding {sorted(DUCK_NON_COMPARABLE)}"
            ),
            "queries": comp,
            "duckdb_sec": round(sum(duck["queries"][n] for n in comp), 3),
            "spark_sec": round(sum(timings[n] for n in comp), 3),
        }
        duck["compute_bound"]["ratio"] = (
            round(
                duck["compute_bound"]["spark_sec"]
                / duck["compute_bound"]["duckdb_sec"],
                2,
            )
            if duck["compute_bound"]["duckdb_sec"] > 0
            else None
        )

    # x10 dedup-family block (VERDICT r13 #7): the broadcast-audit merge
    # hints trade sf0.1 latency for scale safety, and the justification
    # lives at x10 — measure it IN the round artifact so the next plan
    # change shows its x10 effect here, not only in a hand-run sweep.
    # Runs BEFORE the ingest bench: its engine leaves background threads
    # (autocompaction, follow waiters) that inflate co-resident timings.
    # Disable with SPARK_GRAFT_BENCH_X10=0.
    dedup_x10 = None
    if os.environ.get("SPARK_GRAFT_BENCH_X10", "1") != "0":
        dedup_x10 = _bench_dedup_x10(spark, qs, n_runs)

    ingest = _bench_ingest(spark)

    # per-query delta vs the pinned prior-round driver numbers (negative
    # = faster than that round); regressions are visible in-file instead
    # of requiring a diff of two BENCH_r{N}.json files
    deltas = {
        rnd: {
            name: round((timings[name] - prev[name]) / prev[name], 3)
            for name in HEADLINE
            if name in prev and prev[name] > 0
        }
        for rnd, prev in PREV_ROUNDS.items()
    }

    # Full detail (per-run triples, full per-query delta blocks, ingest
    # breakdown) goes to a sidecar file AND an earlier stdout line; the
    # LAST stdout line is a compact summary that fits the driver's ~2 KB
    # tail-capture window (BENCH_r08.json came back `parsed: null`
    # because the single line had outgrown it).
    # pinned protocol descriptor: the comparison basis must travel WITH
    # the number — r11 measured a −10.1% total swing on zero code change
    # under this exact protocol, so every consumer needs (warm, n_runs,
    # agg) plus the median to tell regression from ambient load
    protocol = {"warm": warm, "n_runs": n_runs, "agg": "min",
                "noise_floor_pct": 10.1, "heap": heap,
                "calibration": calibration}
    # the round-13 heap A/B (tools/heap_ab.py) travels with the bench
    # artifact so the regression attribution is readable in one file
    heap_ab = None
    ab_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "heap_ab.json"
    )
    if os.path.exists(ab_path):
        with open(ab_path) as f:
            heap_ab = json.load(f)
    # ... as does the 10M-row-store tail-follow measurement
    # (tools/follow_scale.py — too heavy to rebuild per bench run)
    follow_at_scale = None
    fs_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "follow_scale.json"
    )
    if os.path.exists(fs_path):
        with open(fs_path) as f:
            follow_at_scale = json.load(f)
    detail = {
        "metric": "headline_query_wall_time",
        "value": round(total, 3),
        "value_median": round(total_median, 3),
        "total_cal_normalized": round(total / cal_norm_factor, 3),
        "cal_norm_factor": cal_norm_factor,
        "unit": "sec",
        "protocol": protocol,
        "queries": timings,
        "queries_median": medians,
        "runs": raw_runs,
        "n_runs": n_runs,
        "sf": sf,
        "delta_vs_prev": deltas,
        "ingest": ingest,
        "duckdb": duck,
        "dedup_x10": dedup_x10,
        "heap_ab": heap_ab,
        "follow_at_scale": follow_at_scale,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print("BENCH_DETAIL " + json.dumps(detail))

    # total-vs-prior-round ratios (computed over the queries each round
    # pins, so totals are comparable) keep regressions visible in-file
    # without 23-entry delta maps on the parsed line
    delta_total = {
        rnd: round(
            (sum(timings[n] for n in prev if n in timings) - sum(prev.values()))
            / sum(prev.values()),
            3,
        )
        for rnd, prev in PREV_ROUNDS.items()
    }
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 3),
                "value_median": round(total_median, 3),
                # load-normalized companion (never replaces "value"):
                # total ÷ max(1, shuffle_load_factor) — see the r17
                # note at the calibration block
                "total_cal_normalized": round(total / cal_norm_factor, 3),
                "cal_norm_factor": cal_norm_factor,
                "unit": "sec",
                "protocol": protocol,
                "queries": timings,
                "n_runs": n_runs,
                "sf": sf,
                "delta_total_vs_prev": delta_total,
                "duckdb_total_sec": duck["total"] if duck else None,
                "spark_vs_duckdb_total_ratio": (
                    round(total / duck["total"], 2) if duck else None
                ),
                # the official apples-to-apples reading (VERDICT r15 #3):
                # rows where DuckDB does >= 0.3 s of real work, minus the
                # decode-asymmetric cc_pipeline — see BASELINE.md
                "spark_vs_duckdb_compute_ratio": (
                    duck["compute_bound"]["ratio"] if duck else None
                ),
                "duckdb_compute_sec": (
                    duck["compute_bound"]["duckdb_sec"] if duck else None
                ),
                "spark_compute_sec": (
                    duck["compute_bound"]["spark_sec"] if duck else None
                ),
                "dedup_x10_sec": (
                    {n: v["sec"] for n, v in dedup_x10["queries"].items()}
                    if dedup_x10
                    else None
                ),
                "ingest_records_per_sec": ingest["records_per_sec"],
                "ingest_sustained_records_per_sec": ingest[
                    "sustained_records_per_sec"
                ],
                "detail": "bench_detail.json",
            }
        )
    )
    spark.stop()
    return 0


# the dedup plans whose scale safety the round-13/14 merge hints buy;
# measured at 10x documents so the artifact carries the design point
X10_DEDUP = [
    "dedup_near_duplicates",
    "dedup_lsh_candidates",
    "dedup_simhash64_pairs",
    "semantic_dedup",
]


def _bench_dedup_x10(spark, qs, n_runs: int) -> dict:
    """Min-of-n warm wall times for the dedup family at the 10x corpus
    (tools/scale_proof.py's replicated layout, built once under /tmp and
    reused). These rows justify the merge-hinted (never-broadcast)
    plans: a broadcast variant wins at sf0.1 and loses (or OOMs) here.

    Where scale_proof defines a DESIGN-POINT variant, that one is
    measured — the registry queries pin sf0.01-oracle parameters that
    are degenerate at x10 (semantic_dedup's registry row holds eps=0.3
    and k=16 centroids, which makes ~95% of the x10 corpus one dense
    ε-graph — the true answer, but a different workload than the
    eps=0.97 / occupancy-scaled-k SemDeDup shape the scale claims are
    about)."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    )
    import scale_proof

    _x1, x10 = scale_proof.build(spark)
    out: dict = {"scale": "x10_documents", "queries": {}}
    for name in X10_DEDUP:
        fn = (
            scale_proof.EXTRA_QUERIES[name][0]
            if name in scale_proof.EXTRA_QUERIES
            else qs[name]
        )
        fn(spark, x10).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            fn(spark, x10).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out["queries"][name] = {"sec": min(runs), "runs": runs}
    return out


def _bench_ingest(spark) -> dict:
    """Write-path throughput + read-after-write latency, mirroring the
    reference's two README performance claims (reference README.md:8-10:
    'millions of records per second', 'within milliseconds after it is
    written'). Writes 100k records across 4 sources through the full
    Engine.write path (normalize, seq reservation, chunk files, catalog),
    then measures write→query visibility latency on single records."""
    import shutil
    import statistics
    import tempfile

    from logrange_spark import Engine

    root = tempfile.mkdtemp(prefix="lrspark-bench-ingest-")
    try:
        eng = Engine(spark, root)
        base = 1_706_745_600_000_000_000
        batches = []
        for b in range(20):
            tags = {"name": f"app{b % 4}", "host": f"h{b % 2}"}
            recs = [
                (base + (b * 5000 + i) * 1000, f"record {b}/{i} payload xyzzy", {"n": str(i)})
                for i in range(5000)
            ]
            batches.append((tags, recs))
        t0 = time.time()
        for tags, recs in batches:
            eng.write(tags, recs)
        wall = time.time() - t0
        n = sum(len(r) for _, r in batches)

        # concurrent writers (the collector-fleet shape): per-src locks
        # serialize only same-source writers, so distinct sources land in
        # parallel — pyarrow releases the GIL during the actual write
        from concurrent.futures import ThreadPoolExecutor

        cbatches = []
        for b in range(20):
            tags = {"name": f"conc{b % 4}"}
            recs = [
                (base + (b * 5000 + i) * 1000, f"conc {b}/{i} payload", {})
                for i in range(5000)
            ]
            cbatches.append((tags, recs))
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=4) as ex:
            list(ex.map(lambda tr: eng.write(tr[0], tr[1]), cbatches))
        cwall = time.time() - t0

        # sustained multi-writer run: 4 writer threads, 80 batches each
        # into their own source — enough files per source to cross the
        # auto-compaction threshold (AUTO_COMPACT_FILES=64) several
        # times, so steady-state throughput includes live background
        # compaction, catalog upserts and chunk-log appends — the shape
        # a long-running collector fleet produces, vs the single burst
        # above. Also reports the post-settle file count: bounded by
        # compaction, not linear in batches written.
        sus_batches = []
        for w in range(4):
            for b in range(80):
                tags = {"name": f"sus{w}"}
                recs = [
                    (base + (b * 2500 + i) * 1000, f"sus {w}/{b}/{i} payload", {})
                    for i in range(2500)
                ]
                sus_batches.append((tags, recs))
        per_writer = [sus_batches[w * 80:(w + 1) * 80] for w in range(4)]

        def drain(batches):
            for tags, recs in batches:
                eng.write(tags, recs)

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=4) as ex:
            list(ex.map(drain, per_writer))
        swall = time.time() - t0
        sus_n = sum(len(r) for _, r in sus_batches)
        # drain compaction fully (claim any still-pending srcs, then wait
        # for running ones) so the latency probes below measure a quiet
        # engine, not a probe racing a just-triggered background compact
        deadline = time.time() + 60
        while time.time() < deadline:
            with eng._write_lock:
                pending, eng._autocompact_pending = (
                    set(eng._autocompact_pending),
                    set(),
                )
            if pending:
                eng._maybe_autocompact(sorted(pending))
            if not pending and not eng._autocompact_running:
                break
            time.sleep(0.2)
        sus_files = sum(
            1
            for _, _, files in os.walk(os.path.join(root, "logs"))
            for f in files
            if f.endswith(".parquet")
        )

        # write→query round trip on a single record. Read-your-writes is
        # synchronous in this engine (write returns after the chunk file +
        # catalog commit, and any later query sees it), so the latency
        # here is dominated by the fixed cost of ONE Spark query job —
        # amortized away at real query sizes, reported for honesty.
        lat = []
        for i in range(5):
            t0 = time.time()
            eng.write({"name": "lat"}, [(base + i * 1000, f"latency probe {i}", {})])
            assert (
                eng.query(
                    f"SELECT FROM {{name=lat}} WHERE msg CONTAINS 'probe {i}' LIMIT 1"
                ).count()
                == 1
            )
            lat.append((time.time() - t0) * 1000.0)

        # tail-follow (tail -f) latency: engine.follow blocks on the
        # write condition and re-scans only when a write lands — the
        # reference claims new data is queryable "within milliseconds"
        # (README.md:10). Measure write→yield per record through a live
        # follower; the floor is one pruned Spark scan per wakeup.
        import threading

        n_follow = 30
        received: dict[str, float] = {}
        write_ts: dict[str, float] = {}

        def _tail() -> None:
            for batch in eng.follow(
                "SELECT FROM {name=follow}", wait_timeout_s=15.0
            ):
                now = time.time()
                for r in batch:
                    received.setdefault(r["msg"], now)
                if len(received) >= n_follow:
                    return

        th = threading.Thread(target=_tail, daemon=True)
        th.start()
        time.sleep(1.0)  # follower runs its first (empty) scan
        for i in range(n_follow):
            msg = f"follow probe {i}"
            write_ts[msg] = time.time()
            eng.write(
                {"name": "follow"}, [(base + (200_000 + i) * 1000, msg, {})]
            )
            time.sleep(0.05)
        th.join(timeout=60)
        flats = sorted(
            (received[m] - write_ts[m]) * 1000.0
            for m in write_ts
            if m in received
        )

        def _pct(p: float) -> float:
            if not flats:
                return float("nan")
            return round(flats[min(len(flats) - 1, int(p * len(flats)))], 1)

        return {
            "records": n,
            "sec": round(wall, 3),
            "records_per_sec": round(n / wall),
            "concurrent_records_per_sec": round(n / cwall),
            "sustained_records": sus_n,
            "sustained_records_per_sec": round(sus_n / swall),
            "sustained_files_after_autocompact": sus_files,
            "sustained_batches_written": len(sus_batches),
            "write_plus_query_roundtrip_ms_median": round(statistics.median(lat), 1),
            "follow_visibility_ms_p50": _pct(0.50),
            "follow_visibility_ms_p99": _pct(0.99),
            "follow_samples": len(flats),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
