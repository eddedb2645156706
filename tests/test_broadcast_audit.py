"""Suite-wide broadcast audit (VERDICT r12 #4): the repeated_spans x100
OOM generalized into one mechanical rule over EVERY registry query.

The rule (SCALE.md "sf1 sweep"): a frame whose row count grows with the
corpus must never sit under a ``BroadcastExchange`` — Catalyst's
post-aggregate size estimate undershoots, so an estimate-driven
broadcast passes at test scale and dies (BytesToBytesMap allocation) at
100 TB. ``logrange_spark.planaudit.broadcast_violations`` walks each
physical plan at the x10 corpus and flags every broadcast subtree that
scans a scaled table; zero-key (one-row) aggregates and limit/top-k
capped frames are bounded by construction and exempt mechanically.
Everything else must carry an entry in ``ALLOWED`` below with the reason
its broadcast payload is bounded — a new operator that broadcasts a
data-scaled frame fails here instead of in a 100 TB run.

The r13 blind spot is closed (r14): a ``localCheckpoint``'d frame
re-enters the plan as an RDD scan with no file path, so it can never
match a path marker — the audit now treats a frame DERIVED from an
RDD-scan leaf as scaled-by-default (``test_broadcast_violations_shapes``
pins the checkpointed-aggregate case). Bounded literal frames
(createDataFrame fixtures) that legitimately broadcast through a
deriving operator need an ``ALLOWED`` entry like any other justified
broadcast.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

BASE_SF = "/root/testdata/sf0.1"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(BASE_SF), reason="driver testdata not present"
)

# tables whose row count scales with the corpus; dims (region, nation,
# supplier, part) are bounded at any corpus size and may broadcast
SCALED_TABLES = (
    "documents", "embeddings", "events", "lineitem", "orders", "customer"
)

# Queries whose plan legitimately holds a scaled-table scan under a
# BroadcastExchange because the broadcast payload is bounded in a way
# the mechanical walk cannot prove. Every entry needs the reason.
ALLOWED: dict[str, str] = {
    # the IVF probe side is the fixed vec_id<10 query set exploded to
    # n_probe centroid probes — ≤ |queries|·n_probe rows at any corpus
    # size, bounded by the caller's query set, not the data. (The
    # cosine/PQ exact baselines broadcast the RAW filtered query scan,
    # which the audit already treats as self-correcting.)
    "ann_ivf_topk": "probe set bounded by the constant query set "
                    "(≤ |Q|·n_probe rows)",
    # BM25 filters the token stream to the query's terms map-side; the
    # broadcast per-term document-frequency frame has ≤ |query terms|
    # rows — bounded by the query, not the corpus
    "text_bm25_topk": "per-term DF frame bounded by the constant query "
                      "(≤ |Q| rows)",
    # decontamination joins corpus n-grams against the BENCHMARK's
    # n-gram set: eval suites are bounded by construction in production
    # (broadcast is the right plan); the registry stand-in slices the
    # corpus (doc_id % 97) so the audit sees a scaled scan
    "contamination": "benchmark n-gram set bounded by the eval suite; "
                     "registry stand-in is a corpus slice",
    # the capstone's flagged broadcasts are its decontamination stage's
    # benchmark n-gram set (same eval-suite bound as 'contamination' —
    # the r14 RDD-leaf rule now sees it behind the localCheckpoint) and
    # perplexity_buckets' per-group percentile thresholds (one row per
    # group; groups are enumerable languages — here ONE literal group)
    "cc_pipeline": "benchmark n-gram set (eval-suite bounded) + "
                   "per-group tercile thresholds (rows = |groups|)",
}


def test_broadcast_violations_shapes(spark):
    """The audit's mechanical rules, pinned on six hand-built plans:
    raw-scan broadcasts self-correct (file-size estimate) and are NOT
    violations; derived frames (keyed aggregate, join, explode) ARE;
    one-row aggregates and limits bound everything above them."""
    import pyspark.sql.functions as F

    from logrange_spark.planaudit import broadcast_violations

    li = spark.range(100).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    li.write.mode("overwrite").parquet("/tmp/lrspark-audit/fact.parquet")
    fact = spark.read.parquet("/tmp/lrspark-audit/fact.parquet")
    m = ["fact.parquet"]

    raw = fact.join(F.broadcast(fact.where("v > 5")), "k")
    assert broadcast_violations(raw, m) == []  # raw scan: self-corrects

    agg = fact.groupBy("k").agg(F.sum("v").alias("s"))
    assert broadcast_violations(fact.join(F.broadcast(agg), "k"), m)

    ex = fact.select("k", F.explode(F.array("v", "v")).alias("e"))
    assert broadcast_violations(fact.join(F.broadcast(ex), "k"), m)

    j = fact.alias("a").join(fact.alias("b").hint("merge"), "k")
    assert broadcast_violations(fact.join(F.broadcast(j), "k"), m)

    onerow = fact.agg(F.sum("v").alias("t"))
    assert broadcast_violations(fact.crossJoin(F.broadcast(onerow)), m) == []

    capped = fact.groupBy("k").agg(F.sum("v").alias("s")).limit(5)
    assert broadcast_violations(fact.join(F.broadcast(capped), "k"), m) == []

    # the r13 blind spot: a localCheckpoint'd frame loses its path
    # marker (RDD scan) — a frame DERIVED from it and broadcast must
    # still be flagged, scaled-by-default
    ck = fact.localCheckpoint(eager=True)
    agg_ck = ck.groupBy("k").agg(F.sum("v").alias("s"))
    v = broadcast_violations(fact.join(F.broadcast(agg_ck), "k"), m)
    assert v and "ExistingRDD" in v[0]["scans"][0]["scan"], v
    # ...while a one-row aggregate / limit above the checkpoint still
    # bounds the payload
    ck1 = ck.agg(F.sum("v").alias("t"))
    assert broadcast_violations(fact.crossJoin(F.broadcast(ck1)), m) == []


@needs_testdata
def test_registry_never_broadcasts_data_scaled_frames(spark):
    import __spark_entry__ as entry
    import scale_proof
    from logrange_spark.planaudit import broadcast_violations

    _x1, x10 = scale_proof.build(spark)
    markers = [f"{os.path.basename(x10)}/{t}.parquet" for t in SCALED_TABLES]
    failures = {}
    allowed_hits = set()
    for name, fn in entry.queries().items():
        df = fn(spark, x10)
        v = broadcast_violations(df, markers)
        if not v:
            continue
        if name in ALLOWED:
            allowed_hits.add(name)
            continue
        failures[name] = v
    assert not failures, (
        "data-scaled frame under BroadcastExchange (would OOM at scale; "
        "hint('merge') the join or add a justified ALLOWED entry): "
        + repr(failures)
    )
    # the allowlist must stay honest: entries that no longer trigger are
    # stale and should be deleted so the list can't mask future plans
    stale = set(ALLOWED) - allowed_hits
    assert not stale, f"stale ALLOWED entries (no longer broadcast): {stale}"
