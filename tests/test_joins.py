"""Semantic tests for ops/joins.py (as-of join, keyed range join).

The reference has no joins (SURVEY §2.8) — these are beyond-reference
temporal operators, so the truth tables here are the specification.
"""

from pyspark.sql import functions as F

from logrange_spark.ops import joins


def _asof_map(rows):
    return {r["event_id"]: r["asof_v"] for r in rows}


def test_asof_backward_and_exact_match(spark):
    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 205), (3, "a", 50), (4, "b", 100)],
        "event_id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 100, 10.0), ("a", 200, 20.0), ("b", 101, 99.0)],
        "k string, ts long, v double",
    )
    out = joins.asof_join(left, right, on=["k"], values=["v"])
    got = {r["event_id"]: r["asof_v"] for r in out.collect()}
    assert got[1] == 10.0  # exact ts match is visible
    assert got[2] == 20.0  # latest preceding, not first
    assert got[3] is None  # nothing at or before ts=50
    assert got[4] is None  # right row for b is in the future


def test_asof_tolerance_and_tie_break(spark):
    left = spark.createDataFrame(
        [(1, "a", 300), (2, "a", 1000)], "event_id long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("a", 200, 1, 1.0), ("a", 200, 9, 9.0), ("a", 250, 5, 5.0)],
        "k string, ts long, rid long, v double",
    )
    out = joins.asof_join(
        left, right, on=["k"], values=["v"], tolerance=100, tie_break="rid"
    )
    got = {r["event_id"]: r["asof_v"] for r in out.collect()}
    assert got[1] == 5.0  # within tolerance (300-250=50)
    assert got[2] is None  # 1000-250 > 100 → dropped
    # tie_break: at (a, 200) the larger rid wins
    out2 = joins.asof_join(
        left.where(F.col("event_id") == 1),
        right.where(F.col("ts") == 200),
        on=["k"],
        values=["v"],
        tie_break="rid",
    )
    assert out2.collect()[0]["asof_v"] == 9.0


def test_asof_null_value_does_not_fall_through(spark):
    """A right row with a NULL value must still win as the match — the
    struct carrier prevents last(ignorenulls) from skipping to an older
    non-null row."""
    left = spark.createDataFrame([(1, "a", 300)], "event_id long, k string, ts long")
    right = spark.createDataFrame(
        [("a", 100, 7.0), ("a", 200, None)], "k string, ts long, v double"
    )
    out = joins.asof_join(left, right, on=["k"], values=["v"])
    assert out.collect()[0]["asof_v"] is None


def test_asof_keeps_all_left_columns(spark):
    left = spark.createDataFrame(
        [(1, "a", 100, "x")], "event_id long, k string, ts long, extra string"
    )
    right = spark.createDataFrame([("a", 50, 1.0)], "k string, ts long, v double")
    row = joins.asof_join(left, right, on=["k"], values=["v"]).collect()[0]
    assert row["extra"] == "x" and row["asof_v"] == 1.0


def test_range_join_interval_semantics(spark):
    left = spark.createDataFrame(
        [(1, "a", 1000), (2, "b", 1000)], "id long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("a", 899, 1.0), ("a", 900, 2.0), ("a", 999, 3.0), ("a", 1000, 4.0),
         ("b", 500, 9.0)],
        "k string, rts long, v double",
    )
    j = joins.range_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        lower=-100, upper=0, how="left",
    )
    out = (
        j.groupBy(F.col("__l.id").alias("id"))
        .agg(
            F.count(F.col("__r.rts")).alias("n"),
            F.sum(F.col("__r.v")).alias("s"),
        )
        .collect()
    )
    got = {r["id"]: (r["n"], r["s"]) for r in out}
    # [900, 1000): includes 900 and 999; excludes 899 and 1000
    assert got[1] == (2, 5.0)
    # left join keeps the unmatched purchase
    assert got[2] == (0, None)


def test_range_join_plan_is_not_cartesian(spark):
    left = spark.createDataFrame([(1, "a", 1000)], "id long, k string, ts long")
    right = spark.createDataFrame([("a", 950, 1.0)], "k string, rts long, v double")
    j = joins.range_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                         lower=-100, upper=0)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_range_join_buckets_matches_bruteforce(spark):
    """Bucket-blocked keyless interval join == brute-force cross-join
    filter, including negative timestamps (floor-division correctness)
    and window edges (inclusive lower, exclusive upper)."""
    lrows = [(i, t) for i, t in enumerate(range(-150, 151, 37))]
    rrows = [(j, t) for j, t in enumerate(range(-160, 161, 23))]
    left = spark.createDataFrame(lrows, "lid long, ts long")
    right = spark.createDataFrame(rrows, "rid long, rts long")
    lo, hi = -50, 30
    j = joins.range_join_buckets(
        left, right, left_ts="ts", right_ts="rts", lower=lo, upper=hi
    )
    got = {
        (r["lid"], r["rid"])
        for r in j.select(F.col("__l.lid"), F.col("__r.rid")).collect()
    }
    want = {
        (li, rj)
        for li, lt in lrows
        for rj, rt in rrows
        if lt + lo <= rt < lt + hi
    }
    assert got == want and len(want) > 0
