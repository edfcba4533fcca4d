"""Session-14 entries: TPC-H Q17 scalar-subquery decorrelation, Q13
outer-join count distribution, mergeable KMV sketch states."""

import random

from pyspark.sql import functions as F


def test_q17_decorrelates_scalar_subquery(spark):
    import __spark_entry__ as E

    df = E.queries()["q17_small_qty_revenue"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst must rewrite the correlated scalar subquery into an
    # aggregate + join — no per-outer-row subquery execution survives.
    assert "ScalarSubquery" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert df.count() > 0


def test_q13_zero_bucket_only_via_outer_join(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = {r.c_count: r.n_custs for r in
           E.queries()["q13_order_count_dist"](spark, sf).collect()}
    c = spark.read.parquet(f"{sf}/customer.parquet")
    assert sum(out.values()) == c.count()  # every customer in exactly one bucket
    assert out.get(0, 0) > 0  # customers with no urgent orders survive the join


def test_kmv_sharded_merge_equals_unsharded(spark):
    # mergeability on a corpus where values straddle shards arbitrarily
    from facematch_spark.operators.sketch import kmv_distinct, kmv_distinct_sharded

    rng = random.Random(41)
    rows = [
        ("g%d" % rng.randrange(3), rng.randrange(5000), rng.randrange(7))
        for _ in range(20_000)
    ]
    df = spark.createDataFrame(rows, "grp string, val long, shard long")

    merged = {
        r.grp: r.est_distinct
        for r in kmv_distinct_sharded(df, "grp", "val", "shard", k=32).collect()
    }
    direct = {
        r.grp: r.est_distinct
        for r in kmv_distinct(df, "grp", "val", k=32, prefilter=False).collect()
    }
    assert merged == direct and len(merged) == 3


def test_kmv_sharded_state_is_bounded(spark):
    from facematch_spark.operators.sketch import _hv

    # the per-(grp, shard) state the merge consumes is at most k rows
    from pyspark.sql import Window as W

    rng = random.Random(43)
    rows = [("g", rng.randrange(100_000), rng.randrange(4)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "grp string, val long, shard long")
    k = 16
    hashed = df.select(
        "grp", "shard", _hv("val").alias("hv")
    ).dropDuplicates(["grp", "shard", "hv"])
    w = W.partitionBy("grp", "shard").orderBy("hv")
    states = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    sizes = states.groupBy("grp", "shard").count().agg(F.max("count")).collect()[0][0]
    assert sizes <= k
