"""Session-13 entries: distributed prefix scan + skyline, expectations
report, incremental aggregate maintenance, deterministic mode, EXCEPT ALL."""

import random

import pytest
from pyspark.sql import functions as F


def test_prefix_agg_matches_python_and_is_partition_invariant(spark):
    from facematch_spark.operators.scan import prefix_agg

    rng = random.Random(13)
    rows = [(float(k), rng.randrange(-50, 50)) for k in rng.sample(range(10_000), 300)]
    df = spark.createDataFrame(rows, "k double, v long")

    by_key = sorted(rows)
    for agg, fn in [("max", max), ("min", min), ("sum", lambda a, b: a + b)]:
        want, run = {}, None
        for k, v in by_key:
            want[k] = run
            run = v if run is None else fn(run, v)
        for nparts in (2, 16):
            got = {
                r.k: r.prefix
                for r in prefix_agg(df.repartition(nparts), "k", "v", agg).collect()
            }
            assert got == want, (agg, nparts)


def test_prefix_agg_rejects_unknown_agg(spark):
    from facematch_spark.operators.scan import prefix_agg

    df = spark.createDataFrame([(1.0, 1)], "k double, v long")
    with pytest.raises(ValueError):
        prefix_agg(df, "k", "v", agg="avg")


def test_skyline_matches_brute_force_with_ties(spark):
    from facematch_spark.operators.scan import skyline_2d

    rng = random.Random(29)
    # small value ranges force ties on each dimension AND full (x, y) ties
    pts = [(i, float(rng.randrange(8)), rng.randrange(8)) for i in range(200)]
    df = spark.createDataFrame(pts, "id long, price double, size long")
    got = {r.id for r in skyline_2d(df, "price", "size").collect()}

    def dominated(m):
        return any(
            o[1] <= m[1] and o[2] >= m[2] and (o[1] < m[1] or o[2] > m[2])
            for o in pts
        )

    want = {p[0] for p in pts if not dominated(p)}
    assert got == want and want
    # duplicate frontier points must BOTH survive
    frontier = [(p[1], p[2]) for p in pts if p[0] in want]
    assert len(frontier) > len(set(frontier))


def test_expectations_has_live_passes_and_failures(spark):
    import __spark_entry__ as E

    out = E.queries()["q_expectations"](spark, "/root/testdata/sf0.001").collect()
    verdicts = {r.check_name: r.passed for r in out}
    assert verdicts["orderkey_unique"] and verdicts["custkey_fk_customer"]
    assert not verdicts["totalprice_in_range"]  # fixture max price ~500k
    assert all(r.passed == (r.n_violations == 0) for r in out)


def test_incremental_agg_with_empty_delta_is_base(spark):
    # the merge must be an identity when no new rows arrived
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    full = E.queries()["q_incremental_agg"](spark, sf)
    base_only = (
        o.select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, base_only.collect()))


def test_except_all_is_clipped_multiset_difference(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = {
        (r.user_id, r.event_type): r.n_remaining
        for r in E.queries()["q_except_all"](spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    a = (
        ev.filter(F.expr("ts < TIMESTAMP '2024-01-16'"))
        .groupBy("user_id", "event_type").agg(F.count("*").alias("na"))
    )
    b = (
        ev.filter(F.expr("ts >= TIMESTAMP '2024-01-16'"))
        .groupBy("user_id", "event_type").agg(F.count("*").alias("nb"))
    )
    joined = a.join(b, ["user_id", "event_type"], "full").fillna(0, ["na", "nb"])
    want = {
        (r.user_id, r.event_type): r.na - r.nb
        for r in joined.collect()
        if r.na - r.nb > 0
    }
    assert out == want and want


def test_mode_per_group_plans_as_window_group_limit(spark):
    import __spark_entry__ as E

    df = E.queries()["q_mode_per_group"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # one row per user, and it is a true argmax
    rows = df.collect()
    assert len(rows) == len({r.user_id for r in rows})


def test_intersect_all_is_min_multiset(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = {
        (r.user_id, r.event_type): r.n_common
        for r in E.queries()["q_intersect_all"](spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    a = (
        ev.filter(F.expr("ts < TIMESTAMP '2024-01-16'"))
        .groupBy("user_id", "event_type").agg(F.count("*").alias("na"))
    )
    b = (
        ev.filter(F.expr("ts >= TIMESTAMP '2024-01-16'"))
        .groupBy("user_id", "event_type").agg(F.count("*").alias("nb"))
    )
    joined = a.join(b, ["user_id", "event_type"])
    want = {
        (r.user_id, r.event_type): min(r.na, r.nb) for r in joined.collect()
    }
    assert out == want and want
