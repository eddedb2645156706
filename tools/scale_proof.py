"""Scale proof: EVERY headline query must scale ~linearly in rows.

Builds an sf1-equivalent corpus (10x each sf0.1 table) and times all 23
headline benchmark queries at 1x vs 10x. The claim under test is the
VERDICT's: every pair-finding path is blocked (LSH bands / simhash bands /
occupancy-bounded sign buckets / time buckets), every window sort is
partitioned, and every join is either broadcast or key-partitioned — so
wall time should grow ~linearly with rows. A quadratic path would show
~100x wall growth at 10x rows.

Replication transforms (each preserves the workload's *shape* so the true
answer scales linearly — the benchmark is scaled, not degenerate):

- documents: 10 replicas with a per-replica Caesar shift on the text
  (``F.translate``). Token structure, lengths and within-replica duplicate
  structure are preserved exactly; tokens differ ACROSS replicas, so the
  near-dup pair count scales 10x, not 100x.
- embeddings: per-replica deterministic SIGN FLIP of coordinates (a
  diagonal ±1 orthogonal transform) — preserves norms and ALL
  intra-replica inner products exactly; a vector's images under two
  different masks have cosine ≈ a ±-weighted mean of its squared
  coordinates, E=0 and σ≈1/√dim, so cross-replica pairs sit far below
  any semantic threshold. (The earlier CYCLIC-SHIFT transform violated
  this file's own design rule: adjacent-dim correlation made replica k
  and k±1 images near-duplicates, so the x10 corpus was ~90% chained
  semantic dups and semantic_dedup's true pair volume grew ~10x faster
  than rows — degenerate, not scaled.) Replica 0 is the identity so the
  fixed vec_id<10 query set is untouched.
- lineitem/orders/customer: key-space translation — l_orderkey/o_orderkey
  bumped by k*n_orders, o_custkey/c_custkey by k*n_cust. Join fan-out per
  key is unchanged; per-customer order counts are unchanged (the
  top_orders window sees 10x groups of the same size, not 10x-deep
  groups).
- events: event_id/user_id translated AND ts shifted by k*(span+1day).
  Disjoint users keep sessions/funnel/asof per-user work constant;
  disjoint time ranges keep the KEY-LESS corr/range time-bucket joins
  linear (overlapping replicas would make clicks-near-each-error a
  genuine 100x workload — that growth would be the data's fault, not the
  plan's).
- region/nation/supplier/part: symlinked unchanged — dimensions stay
  small at 100 TB; scaling them would misrepresent the workload.

Each query runs 3x warm per scale on ``local[32]``; reported seconds are
the min. Plans are asserted free of ``CartesianProduct`` /
``BroadcastNestedLoopJoin`` at both scales.

Usage:  python tools/scale_proof.py   (prints one JSON line per scale)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# v2: embeddings replication changed from cyclic shift to sign flips
# (see the replication notes above) — new dir so stale x10 data from
# the old generator can never be reused
WORK = "/tmp/lrspark-scale-v2"
REPLICAS = 10
ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"

# driving table per headline query — used only for the rows/1k metric
DRIVER_TABLE = {
    "lql_contains": "events",
    "lql_tail": "events",
    "lql_format": "events",
    "show_partitions": "events",
    "events_hourly": "events",
    "events_sessions": "events",
    "events_asof": "events",
    "events_range_join": "events",
    "parse_k8json": "events",
    "pricing_summary": "lineitem",
    "revenue_by_segment": "lineitem",
    "revenue_by_nation": "lineitem",
    "top_orders_per_customer": "orders",
    "dedup_exact": "documents",
    "dedup_lsh_candidates": "documents",
    "dedup_near_duplicates": "documents",
    "dedup_simhash_pairs": "documents",
    "text_stats": "documents",
    "text_top_words": "documents",
    "training_pipeline": "documents",
    "ann_cosine_topk": "embeddings",
    "ann_bucketed_topk": "embeddings",
    "dedup_embedding": "embeddings",
    # round-13 flagship additions to bench.HEADLINE
    "gopher_stats": "documents",
    "lang_predict": "documents",
    "kn_bigram_ppl": "documents",
    "wet_documents": "documents",
    "cc_pipeline": "documents",
    # round-13 URL stage
    "url_dedup": "documents",
    # round-14 one-pass attribute row
    "quality_signals": "documents",
}

SCALED_TABLES = ("documents", "embeddings", "lineitem", "orders", "customer", "events")
DIM_TABLES = ("region", "nation", "supplier", "part")


def _q_pq_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from logrange_spark.ops import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = ann.pq_seed_codebooks(emb)
    return ann.pq_topk(emb, emb.where(F.col("vec_id") < 10), k=10, codebooks=books)


def _q_ivf_pq_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from logrange_spark.ops import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = ann.pq_seed_codebooks(emb)
    return ann.ivf_pq_topk(
        emb, emb.where(F.col("vec_id") < 10), k=10, codebooks=books
    )


def _q_dedup_clusters(spark, sf_dir):
    from logrange_spark.ops import dedup

    return dedup.near_duplicate_clusters(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", "text", 0.8
    )


def _q_mixture_sample(spark, sf_dir):
    from logrange_spark.ops import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # remix the 20 synthetic sources to a skewed target at constant size:
    # the first three domains up-sample ~3x, the rest down-sample
    weights = {f"src{i}": (2.0 if i < 3 else 0.5) for i in range(20)}
    return sampling.mixture_sample(docs, "doc_id", "source", weights)


def _q_unigram_lm(spark, sf_dir):
    from logrange_spark.ops import text as t

    return t.unigram_lm_score(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", "text"
    )


def _q_corpus_overlap(spark, sf_dir):
    from pyspark.sql import functions as F

    from logrange_spark.ops import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.corpus_minhash_overlap(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )


def _q_bm25(spark, sf_dir):
    from logrange_spark.ops import text as t

    return t.bm25_search(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        "data model spark",
        k=10,
    )


# beyond-registry operators whose scaling behavior is worth proving:
# PQ encode/assign is a full map stage in this on-the-fly form, and
# pruning only cuts the scoring fan-out — ~linear in corpus rows; the
# near-flat serving path is probing the PERSISTED centroid-bucketed
# coded table (plan-asserted in tests/test_bucketing.py), which pays the
# encode once at write time. dedup_clusters adds O(log n) contraction
# rounds over the pair skeleton; mixture/unigram are map-side + one
# aggregate — all three should track rows ~linearly.
def _q_repeated_spans(spark, sf_dir):
    from logrange_spark.ops import dedup

    return dedup.repeated_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", "text",
        min_len=8,
    )


def _q_remove_repeated_spans(spark, sf_dir):
    from logrange_spark.ops import dedup

    return dedup.remove_repeated_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", "text",
        min_len=8,
    )


def _q_boilerplate(spark, sf_dir):
    from logrange_spark.ops import text as t

    return t.remove_boilerplate(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _q_semantic_dedup(spark, sf_dir):
    from logrange_spark.ops import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # SemDeDup's k must scale with the corpus (the paper runs k=50k on
    # LAION): within-cluster pair volume is O((n/k)^2) per cluster, so a
    # FIXED k is quadratic in n. Hold target occupancy ~125 at every
    # scale — footer row count, no Spark job — and seed the lowest-id
    # vectors as centroids (the ivf_topk convention, deterministic).
    k = max(16, ann._default_nrows(emb) // 125)
    cents = [
        (int(r[0]), list(r[1]))
        for r in emb.where(F.col("vec_id") < k)
        .select("vec_id", "embedding").orderBy("vec_id").collect()
    ]
    # numpy assignment = the large-k shape (a literal-expression plan is
    # ~10x slower already at k=160 and infeasible at the paper's k=50k)
    return ann.semantic_dedup_drops(emb, cents, threshold=0.97,
                                    assign="numpy")


def _q_kn_bigram(spark, sf_dir):
    from logrange_spark.ops import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = t.kn_bigram_lm(docs)
    return t.kn_bigram_score(docs, model)


def _q_kn_trigram(spark, sf_dir):
    from logrange_spark.ops import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = t.kn_ngram_lm(docs, order=3)
    return t.kn_ngram_score(docs, model)


def _q_ccnet_buckets(spark, sf_dir):
    from logrange_spark.ops import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = t.kn_bigram_lm(docs)
    scored = t.kn_bigram_score(docs, model)
    tagged = scored.join(
        docs.select("doc_id", t.lang_id(F.col("text")).alias("lang")),
        "doc_id",
    )
    return t.perplexity_buckets(tagged, "lang", "ppl").select(
        "doc_id", "lang", "bucket"
    )


def _q_kn_order5(spark, sf_dir):
    from logrange_spark.ops import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = t.kn_ngram_lm(docs, order=5)
    return t.kn_ngram_score(docs, model)


def _q_bpe(spark, sf_dir):
    from logrange_spark.ops import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # 10 merge rounds over the word-vocabulary frame (rounds scale with
    # the VOCAB, not the corpus); the corpus-scaled stages are the word
    # count and the segmentation join
    merges, vocab = t.bpe_train(docs, n_merges=10)
    return t.bpe_segment(docs, vocab).select("doc_id", "n_pieces")


def _q_dsir_sample(spark, sf_dir):
    from logrange_spark.ops import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # fixed 100-doc target at both scales (the DSIR regime: a small
    # high-quality seed); the data-scaled work is the raw-corpus LM
    # count, the scoring pass and the TakeOrdered top-k
    return sampling.dsir_sample(docs, docs.limit(100), k=500)


def _q_quality_classifier(spark, sf_dir):
    from logrange_spark.ops import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    neg = docs.limit(200).select(
        "doc_id", F.reverse(F.col("text")).alias("text")
    )
    w = t.train_quality_classifier(docs.limit(200), neg, iters=4)
    return t.quality_classifier_score(docs, w)


def _q_keep_best(spark, sf_dir):
    from logrange_spark.ops import dedup
    from logrange_spark.ops import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cl = dedup.near_duplicate_clusters(docs, "doc_id", "text", 0.8)
    sc = docs.select("doc_id", t.quality_score(F.col("text")).alias("score"))
    return dedup.cluster_representatives(cl, sc)


def _q_shard_corpus(spark, sf_dir):
    from logrange_spark.ops import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.shard_corpus(docs, 32)


def _q_wet_documents(spark, sf_dir):
    return entry._q_wet_documents(spark, sf_dir)


def _q_simhash64_pairs(spark, sf_dir):
    return entry._q_simhash64_pairs(spark, sf_dir)


def _q_cc_pipeline(spark, sf_dir):
    return entry._q_cc_pipeline(spark, sf_dir)


def _q_corpus_report(spark, sf_dir):
    from logrange_spark.ops import report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # approx: the 100 TB posture (sketch percentiles + HLL vocabulary)
    return report.corpus_report(docs, approx=True)


EXTRA_QUERIES = {
    "ann_pq_topk": (_q_pq_topk, "embeddings"),
    "ann_ivf_pq_topk": (_q_ivf_pq_topk, "embeddings"),
    "dedup_clusters": (_q_dedup_clusters, "documents"),
    # the r12 64-bit fingerprint (registered variant; 16-bit stays
    # in HEADLINE for round-over-round bench continuity)
    "dedup_simhash64_pairs": (_q_simhash64_pairs, "documents"),
    "mixture_sample": (_q_mixture_sample, "documents"),
    "text_unigram_ppl": (_q_unigram_lm, "documents"),
    "text_bm25_topk": (_q_bm25, "documents"),
    # corpus-level overlap estimate: one map + 12-col partial agg per
    # side, one-row crossJoin — nothing data-scaled beyond the scan
    "corpus_overlap": (_q_corpus_overlap, "documents"),
    # substring dedup: window hashing map-side, hash groupBy partial-
    # aggregates, per-doc island windows — linear in total tokens
    "repeated_spans": (_q_repeated_spans, "documents"),
    "remove_repeated_spans": (_q_remove_repeated_spans, "documents"),
    # boilerplate: map-side within-doc distinct + one line groupBy, then
    # a one-row broadcast dictionary and a pure map removal — linear
    "boilerplate_removal": (_q_boilerplate, "documents"),
    # SemDeDup: literal-centroid assignment map stage + grid-salted
    # within-cluster self-join; k scales with rows (occupancy ~125 held
    # constant) so within-cluster pair volume stays linear
    "semantic_dedup": (_q_semantic_dedup, "embeddings"),
    # classifier: constant-size training (fixed 200-doc seed both
    # scales) + full-corpus scoring — the scoring explode/broadcast-join
    # path is the data-scaled part
    "quality_classifier": (_q_quality_classifier, "documents"),
    # DSIR: two bounded LM-count aggregates + broadcast-ratio scoring
    # pass + TakeOrdered top-k — linear, one doc-keyed shuffle
    "dsir_sample": (_q_dsir_sample, "documents"),
    # BPE: one corpus-scaled word count + 10 vocab-frame merge rounds +
    # the corpus-scaled segmentation join
    "bpe_train_segment": (_q_bpe, "documents"),
    # KN bigram LM: one (u,w)-keyed count shuffle to train; scoring is
    # the event stream joined key-partitioned against the model tables
    "kn_bigram_ppl": (_q_kn_bigram, "documents"),
    # order-3 KN: ONE corpus-scaled top-order count; lower continuation
    # tables are groupBys of bounded tables; scoring adds two more
    # key-partitioned joins per event
    "kn_trigram_ppl": (_q_kn_trigram, "documents"),
    # order-5 KN (CCNet's production filter shape): same ONE
    # corpus-scaled aggregate; scoring probes 4 context shapes + the
    # unigram per event — 9 key-partitioned joins total
    "kn_order5_ppl": (_q_kn_order5, "documents"),
    # CCNet head/middle/tail stratification: LM scoring + one
    # per-language threshold aggregate (groups enumerable) broadcast
    # back over a pure map labeling pass
    "ccnet_buckets": (_q_ccnet_buckets, "documents"),
    # keep-best dedup: the shared cluster stage + one id-keyed left
    # join + one map-side-partial min_by aggregate — linear on top of
    # dedup_clusters
    "keep_best_dedup": (_q_keep_best, "documents"),
    # deterministic sharding: map-side hash columns + ONE hash exchange
    # + per-shard sort (the row_number window) — linear
    "shard_corpus": (_q_shard_corpus, "documents"),
    # data card: one doc-grain partial agg (+ md5 count_distinct) + one
    # token-grain agg; the two ONE-ROW results attach by broadcast
    # crossJoin (exempt below)
    "corpus_report": (_q_corpus_report, "documents"),
    # WET parse layer: binaryFile scan -> streaming gzip decode ->
    # mapInPandas record split; parallelism = fixture file count
    # (1000 docs/file), zero Exchange
    "wet_documents": (_q_wet_documents, "documents"),
    # CommonCrawl capstone: read_warc -> html extraction -> gates ->
    # minhash dedup -> ccnet terciles -> shards, one program; the
    # survivor-trained unigram LM attaches ONE-ROW totals via broadcast
    # crossJoin (exempt below)
    "cc_pipeline": (_q_cc_pipeline, "documents"),
}


def shifted(k: int) -> str:
    lo, up = ALPHA[:26], ALPHA[26:]
    return lo[k:] + lo[:k] + up[k:] + up[:k]


def _union(parts):
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def _write(df, out: str) -> None:
    df.repartition(8).write.mode("overwrite").parquet(out)


def build(spark) -> tuple[str, str]:
    x1 = os.path.join(WORK, "x1")
    x10 = os.path.join(WORK, "x10")
    os.makedirs(x1, exist_ok=True)
    os.makedirs(x10, exist_ok=True)
    for table in SCALED_TABLES + DIM_TABLES:
        link = os.path.join(x1, f"{table}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE_SF, f"{table}.parquet"), link)
    for table in DIM_TABLES:
        link = os.path.join(x10, f"{table}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE_SF, f"{table}.parquet"), link)

    docs_out = os.path.join(x10, "documents.parquet")
    if not os.path.exists(docs_out):
        docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
        n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        _write(
            _union(
                [
                    docs.select(
                        (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                        F.translate(F.col("text"), ALPHA, shifted(k)).alias("text"),
                        "lang",
                        "source",
                        "n_chars",
                    )
                    for k in range(REPLICAS)
                ]
            ),
            docs_out,
        )

    emb_out = os.path.join(x10, "embeddings.parquet")
    if not os.path.exists(emb_out):
        emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
        n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        _write(
            _union(
                [
                    emb.select(
                        (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                        (
                            # deterministic per-(replica, dim) ±1 mask
                            F.transform(
                                "embedding",
                                lambda x, i: F.when(
                                    F.pmod(
                                        F.xxhash64(F.lit(int(k)), i), 2
                                    )
                                    == 0,
                                    x,
                                ).otherwise(-x),
                            )
                            if k
                            else F.col("embedding")
                        ).alias("embedding"),
                        "label",
                    )
                    for k in range(REPLICAS)
                ]
            ),
            emb_out,
        )

    ord_out = os.path.join(x10, "orders.parquet")
    li_out = os.path.join(x10, "lineitem.parquet")
    cust_out = os.path.join(x10, "customer.parquet")
    if not (
        os.path.exists(ord_out) and os.path.exists(li_out) and os.path.exists(cust_out)
    ):
        orders = spark.read.parquet(f"{BASE_SF}/orders.parquet")
        li = spark.read.parquet(f"{BASE_SF}/lineitem.parquet")
        cust = spark.read.parquet(f"{BASE_SF}/customer.parquet")
        n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
        n_cust = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
        _write(
            _union(
                [
                    orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * n_ord))
                    .withColumn("o_custkey", F.col("o_custkey") + F.lit(k * n_cust))
                    for k in range(REPLICAS)
                ]
            ),
            ord_out,
        )
        _write(
            _union(
                [
                    li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * n_ord))
                    for k in range(REPLICAS)
                ]
            ),
            li_out,
        )
        _write(
            _union(
                [
                    cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(k * n_cust))
                    for k in range(REPLICAS)
                ]
            ),
            cust_out,
        )

    ev_out = os.path.join(x10, "events.parquet")
    if not os.path.exists(ev_out):
        ev = spark.read.parquet(f"{BASE_SF}/events.parquet")
        n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
        n_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
        ts_type = dict(ev.dtypes)["ts"]
        if ts_type in ("timestamp", "timestamp_ntz"):
            lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
            span_sec = int((hi - lo).total_seconds()) + 86_400
            shift = lambda k: F.col("ts") + F.expr(f"INTERVAL {k * span_sec} SECOND")  # noqa: E731
        else:  # epoch-ns long (nanosAsLong layout)
            lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
            span_ns = (hi - lo) + 86_400 * 10**9
            shift = lambda k: F.col("ts") + F.lit(k * span_ns)  # noqa: E731
        _write(
            _union(
                [
                    ev.withColumn("event_id", F.col("event_id") + F.lit(k * n_ev))
                    .withColumn("user_id", F.col("user_id") + F.lit(k * n_user))
                    .withColumn("ts", shift(k))
                    for k in range(REPLICAS)
                ]
            ),
            ev_out,
        )
    return x1, x10


def run(spark, sf_dir: str, label: str, only: set[str] | None = None) -> dict:
    # retired registry rows (lql_format, top_orders_per_customer)
    # still bench/scale as headline members
    qs = {**entry.retired_queries(), **entry.queries()}
    counts = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count() for t in SCALED_TABLES
    }
    res = {"scale": label, "rows": counts, "queries": {}}
    all_queries = [(n, qs[n], DRIVER_TABLE[n]) for n in bench.HEADLINE] + [
        (n, fn, table) for n, (fn, table) in EXTRA_QUERIES.items()
        if n not in bench.HEADLINE  # r13 flagships joined HEADLINE
    ]
    if only:
        all_queries = [q for q in all_queries if q[0] in only]
    for name, fn, table in all_queries:
        nrows = counts[table]
        runs = []
        for _ in range(int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        best = min(runs)
        res["queries"][name] = {
            "sec": best,
            "sec_per_1k_rows": round(best / (nrows / 1000.0), 4),
            "runs": runs,
        }
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name}@{label}: cartesian!"
        # ann_cosine_topk (exact baseline) and ann_pq_topk (ADC full
        # scan) broadcast the tiny fixed query set and score the whole
        # corpus — a BroadcastNestedLoopJoin by construction, linear in
        # corpus rows (cost = corpus x |queries|, |queries| constant).
        # text_unigram_ppl and text_bm25_topk attach ONE-ROW aggregate
        # scalars (vocab total / OOV mass; N and avgdl) via broadcast
        # crossJoin — also BNLJ by construction, cost = rows x 1; so is
        # corpus_overlap (two one-row corpus-minhash aggregates joined).
        # Every other plan must be blocked/bucketed, never a BNLJ.
        # boilerplate_removal attaches its ONE-ROW collected dictionary
        # (bounded by BOILERPLATE_MAX_LINES) the same way;
        # dsir_sample attaches the two ONE-ROW LM totals and
        # kn_bigram_ppl its ONE-ROW (n1pp, v) totals.
        if name not in (
            "ann_cosine_topk", "ann_pq_topk", "text_unigram_ppl",
            "text_bm25_topk", "corpus_overlap", "boilerplate_removal",
            "dsir_sample", "kn_bigram_ppl", "kn_trigram_ppl",
            "kn_order5_ppl", "ccnet_buckets", "corpus_report",
            "cc_pipeline",
        ):
            assert "BroadcastNestedLoopJoin" not in plan, f"{name}@{label}: BNLJ!"
    return res


def main() -> int:
    from logrange_spark import build_session

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # x100/sf0.1-scale entry point; library default is 8g
    spark = build_session(app_name="logrange-spark-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")
    x1, x10 = build(spark)
    only = set(sys.argv[1:]) or None  # optional query-name subset
    # warm the JVM/readers so x1 isn't charged the startup cost
    spark.read.parquet(f"{x1}/documents.parquet").count()
    for sf_dir, label in ((x1, "x1"), (x10, "x10")):
        print(json.dumps(run(spark, sf_dir, label, only)))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
