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
