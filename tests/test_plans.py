"""Physical-plan shape guards: the properties that make queries scale
are asserted, not assumed — partition pruning, broadcast joins, column
pruning, top-K instead of global sort. A regression here is invisible at
sf0.001 row counts but fatal at 100 TB."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import BASE_TS, NS

SF_DIR = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_engine_select_prunes_partitions(engine):
    """A tag-filtered SELECT must turn into src= partition pruning on the
    store scan (the tag index's whole purpose), not a full-table filter."""
    engine.write({"name": "pp1"}, [(BASE_TS, "a", {})])
    engine.write({"name": "pp2"}, [(BASE_TS, "b", {})])
    plan = plan_of(engine.query("SELECT FROM {name=pp1} LIMIT 10"))
    assert "PartitionFilters" in plan
    assert "src" in plan.split("PartitionFilters", 1)[1][:200]


def test_engine_select_is_top_k_not_full_sort(engine):
    engine.write({"name": "topk"}, [(BASE_TS + i * NS, f"m{i}", {}) for i in range(5)])
    plan = plan_of(engine.query("SELECT FROM {name=topk} LIMIT 3"))
    assert "TakeOrderedAndProject" in plan


@needs_testdata
def test_star_join_broadcasts_dimensions(spark):
    """revenue_by_nation joins fact→customer→nation: the dimension sides
    must broadcast (no shuffle of the fact table for a 25-row dim)."""
    import __spark_entry__ as entry

    plan = plan_of(entry.queries()["revenue_by_nation"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_pricing_summary_prunes_columns(spark):
    """The scan must read only the projected columns — l_comment (the
    widest lineitem column) must not reach the parquet reader."""
    import __spark_entry__ as entry

    plan = plan_of(entry.queries()["pricing_summary"](spark, SF_DIR))
    scan = plan[plan.index("ReadSchema") :][:500]
    assert "l_quantity" in scan
    assert "l_comment" not in scan


@needs_testdata
def test_lsh_join_is_hash_join_not_nested_loop(spark):
    import __spark_entry__ as entry

    # rotated to retired_queries() in r10 — the op itself still benches
    q = {**entry.retired_queries(), **entry.queries()}
    plan = plan_of(q["dedup_lsh_candidates"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@needs_testdata
def test_near_duplicates_single_tokenize_repartition(spark):
    """The whole LSH→Jaccard pipeline computes scan+tokenize+signature
    exactly once: the signature frame (tokens riding along) is
    materialized by a lazy localCheckpoint inside
    ``_rep_pairs_and_members`` (r16 — the previous ReusedExchange
    sharing silently forked whenever a consumer's exchange subtree
    differed by one pruned column, re-running the per-shingle md5 map
    up to four times per query). Every consumer — collapse, band join,
    Jaccard verify, member expansion — must therefore read the
    checkpoint RDD, and the visible plan must carry NO token
    repartition or parquet scan of its own."""
    from logrange_spark.ops.dedup import near_duplicates

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    nd = near_duplicates(df, "doc_id", "text")
    nd.collect()  # AQE: final plan exists only after execution
    final = plan_of(nd).split("== Initial Plan ==")[0]
    # tokenize+spread and the signature map live inside the checkpoint
    # lineage; the query plan reads the materialized RDD instead
    assert "ExistingRDD" in final, final
    assert "RoundRobinPartitioning" not in final, final
    assert "Scan parquet" not in final, final


@needs_testdata
def test_simhash_pairs_single_shuffle_no_distinct(spark):
    """After the first-matching-band rewrite the operator's only shuffle
    is the band equi-join — no aggregate/distinct exchange downstream."""
    import __spark_entry__ as entry

    qs = {**entry.retired_queries(), **entry.queries()}
    # 16-bit rotated to retired in r12 (still benched in HEADLINE); the
    # registered 64-bit variant must keep the same single-shuffle shape
    for name in ("dedup_simhash_pairs", "dedup_simhash64_pairs"):
        plan = plan_of(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        # distinct would appear as a HashAggregate pair over the pair cols
        after_join = plan.split("Join", 1)[0]
        assert "HashAggregate" not in after_join, name


@needs_testdata
def test_dsir_sample_is_top_k_not_full_sort(spark):
    """DSIR's Gumbel top-k must plan as TakeOrderedAndProject (per-
    partition heaps) — a global Sort before the limit would shuffle the
    whole scored corpus at 100 TB. The LM-total attaches are the only
    BNLJ (one-row broadcasts); no cartesian anywhere."""
    from logrange_spark.ops import sampling

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = sampling.dsir_sample(docs, docs.limit(20), k=10)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_bpe_encode_joins_are_not_cartesian(spark):
    """bpe_segment/bpe_encode join the token stream against vocab/id
    tables on equi-keys — never a cartesian; the id table attaches as a
    broadcast hash join."""
    from logrange_spark.ops import text as t

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    merges, vocab = t.bpe_train(docs, n_merges=3)
    plan = plan_of(t.bpe_encode(docs, vocab))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_kn_event_lambda_touches_attributes_only(spark):
    """The KN event builder's per-element lambda must reference the
    PROJECTED _pad/_ws attributes, never a tokenization/concat
    expression: Catalyst re-evaluates captured non-attribute
    expressions once per array element, which turns the event stream
    quadratic in document length (the round-13 HOF capture rule,
    SCALE.md). Pins that CollapseProject keeps the two-Project shape —
    an optimizer change that inlines single-use aliases into lambda
    bodies must fail here, not silently regress 2000-token documents
    from 0.6 s back to 12 s per million events."""
    from logrange_spark.ops import text as T

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for order in (2, 3, 5):
        ev = T._kn_ngram_events(df, "doc_id", "text", order)
        plan = ev._jdf.queryExecution().optimizedPlan().toString()
        lam = [ln for ln in plan.splitlines() if "lambdafunction" in ln
               and "slice(" in ln]
        assert lam, plan  # the event transform is present
        for ln in lam:
            # tokenization (split/lower/trim) and the padded-stream
            # concat must stay in the Projects BELOW the lambda
            assert "split(" not in ln and "concat(" not in ln, ln
