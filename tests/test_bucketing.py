"""Bucketed-storage co-located joins: the 100 TB technique for repeated
joins on the same key (e.g. events⋈events or events⋈users on user_id).

Writing both sides bucketed by the join key into the catalog lets Spark
plan a SortMergeJoin with NO Exchange on either side — the shuffle is
paid once at write time, then every subsequent join is shuffle-free.
This is the Spark analogue of the reference keeping a partition's
journals co-resident on one node."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    # external tables with explicit paths — no warehouse conf needed
    # (spark.sql.warehouse.dir is static and can't change per-test)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    left = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("event_id")
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("user_id"), F.concat(F.lit("u"), F.col("id")).alias("name")
    )
    for name, df in [("bk_events", left), ("bk_users", right)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .option("path", f"{wh}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark.table("bk_events"), spark.table("bk_users")
    for name in ("bk_events", "bk_users"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ev, users = bucketed_pair
    # defeat the broadcast path so the bucketed SMJ is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ev.join(users, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ev, _ = bucketed_pair
    agg = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "aggregation on the bucket key must not shuffle"
    assert agg.count() == 50


def test_ivf_bucketed_corpus_probe_no_corpus_exchange(spark, tmp_path_factory):
    """The ANN analogue of write-once-shuffle-never: persist the corpus
    inverted-listed AND bucketed by centroid_id; a probe join on
    centroid_id then shuffles ONLY the query side — the corpus reads
    co-located buckets with no Exchange even when the probe set is too
    big to broadcast. Results are identical to the on-the-fly ivf_topk."""
    import os

    import pytest as _pytest

    from logrange_spark.ops import ann

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.isdir(path) and not os.path.exists(path):
        _pytest.skip("driver testdata not present")
    vecs = spark.read.parquet(path)
    queries = vecs.where(F.col("vec_id") < 5)
    cents = [
        (int(r[0]), list(r[1]))
        for r in vecs.where(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    wh = str(tmp_path_factory.mktemp("annwh"))
    spark.sql("DROP TABLE IF EXISTS bk_ann_corpus")
    try:
        table = ann.persist_ivf_corpus(
            spark, vecs, "bk_ann_corpus", f"{wh}/bk_ann_corpus", cents
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # the probe-join fragment in isolation: bucketed corpus side
            # must contribute ZERO exchanges; the query side exactly one
            probe = queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"),
                ann.ivf_assign_expr(F.col("embedding"), cents).alias("centroid_id"),
            )
            frag = table.join(probe, "centroid_id")
            plan = frag._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert plan.count("Exchange") == 1, plan
            assert "Bucketed: true" in plan

            got = ann.ivf_topk(
                None, queries, k=10, centroids=cents,
                assigned=table, broadcast_queries=False,
            ).collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        want = ann.ivf_topk(vecs, queries, k=10, centroids=cents).collect()
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        assert sorted(
            [(r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in got]
        ) == sorted(
            [(r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in want]
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_ann_corpus")


def test_ivf_pq_bucketed_corpus_probe_no_corpus_exchange(spark, tmp_path_factory):
    """The full billion-scale serving layout: the persisted corpus is
    inverted-listed, PQ-coded (no raw embeddings in the table), and
    bucketed by centroid_id. A probe join shuffles only the query side;
    results are identical to the on-the-fly ivf_pq_topk."""
    import os

    import pytest as _pytest

    from logrange_spark.ops import ann

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.isdir(path) and not os.path.exists(path):
        _pytest.skip("driver testdata not present")
    vecs = spark.read.parquet(path)
    queries = vecs.where(F.col("vec_id") < 5)
    cents = [
        (int(r[0]), list(r[1]))
        for r in vecs.where(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    books = ann.pq_seed_codebooks(vecs)
    wh = str(tmp_path_factory.mktemp("annpqwh"))
    spark.sql("DROP TABLE IF EXISTS bk_annpq_corpus")
    try:
        table = ann.persist_ivf_pq_corpus(
            spark, vecs, "bk_annpq_corpus", f"{wh}/bk_annpq_corpus", cents, books
        )
        # the stored layout carries codes, never vectors
        assert set(table.columns) == {"neighbor_id", "centroid_id", "codes", "recon_norm"}
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # probe-join fragment in isolation: the bucketed coded corpus
            # contributes ZERO exchanges, the query side exactly one
            probe = queries.select(
                F.col("vec_id").alias("query_id"),
                ann.ivf_assign_expr(F.col("embedding"), cents).alias("centroid_id"),
            )
            frag = table.join(probe, "centroid_id")
            fplan = frag._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in fplan
            assert fplan.count("Exchange") == 1, fplan
            assert "Bucketed: true" in fplan

            got = ann.ivf_pq_topk(
                None, queries, k=10, centroids=cents, codebooks=books,
                assigned=table, broadcast_queries=False,
            )
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Bucketed: true" in plan
            got_rows = got.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        want = ann.ivf_pq_topk(
            vecs, queries, k=10, centroids=cents, codebooks=books
        ).collect()
        assert sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in got_rows
        ) == sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["score"]) for r in want
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_annpq_corpus")
