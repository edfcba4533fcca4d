"""Session-15 entries: composite-key prefix scan + Pareto revenue share,
MAD outlier screen, array higher-order functions, sort-merge join."""

import random

import numpy as np
from pyspark.sql import functions as F


def test_prefix_agg_composite_key_matches_python(spark):
    from facematch_spark.operators.scan import prefix_agg

    rng = random.Random(17)
    # duplicate first-key values force the second key to disambiguate
    rows = [(rng.randrange(20), i, rng.randrange(100)) for i in range(300)]
    df = spark.createDataFrame(rows, "k1 long, k2 long, v long")
    got = {
        (r.k1, r.k2): r.prefix
        for r in prefix_agg(df.repartition(8), ["k1", "k2"], "v", "sum").collect()
    }
    want, run = {}, None
    for k1, k2, v in sorted(rows):
        want[(k1, k2)] = run
        run = v if run is None else run + v
    assert got == want


def test_pareto_revenue_head_is_prefix_and_exact(spark):
    import __spark_entry__ as E

    out = E.queries()["q_pareto_revenue"](spark, "/root/testdata/sf0.001").collect()
    rows = sorted(out, key=lambda r: (-r.revenue_cents, r.part_id))
    total = sum(r.revenue_cents for r in rows)
    # running total is exact and the head flag follows the first-byte rule
    cum = 0
    for r in rows:
        assert r.cum_cents == cum + r.revenue_cents
        assert r.in_top80 == (cum * 10 < total * 8)
        cum += r.revenue_cents
    assert rows[0].in_top80 and not rows[-1].in_top80


def test_anomaly_mad_matches_numpy(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = {r.o_orderpriority: r for r in
           E.queries()["q_anomaly_mad"](spark, sf).collect()}
    o = spark.read.parquet(f"{sf}/orders.parquet")
    for prio in list(out)[:2]:
        xs = np.array([
            r.o_totalprice for r in
            o.filter(F.col("o_orderpriority") == prio).collect()
        ])
        med = float(np.percentile(xs, 50))
        dev = np.abs(xs - med)
        mad = float(np.percentile(dev, 50))
        assert out[prio].med == med and out[prio].mad == mad
        assert out[prio].n_outliers == int((dev > 3 * mad).sum())


def test_array_hof_exact_on_crafted_doc(spark):
    import __spark_entry__ as E  # noqa: F401 — same expressions, local df

    df = spark.createDataFrame(
        [(1, "The QUICK brown fox ab"), (2, ""), (3, "a b c")],
        "doc_id long, text string",
    )
    toks = F.split(F.col("text"), " ")
    longs = F.filter(F.transform(toks, lambda t: F.lower(t)),
                     lambda t: F.length(t) > 3)
    out = {
        r.doc_id: (r.n, r.c)
        for r in df.select(
            "doc_id",
            F.size(longs).alias("n"),
            F.aggregate(longs, F.lit(0), lambda a, t: a + F.length(t)).alias("c"),
        ).collect()
    }
    # quick(5) + brown(5) qualify; "fox"/"The"/"ab" do not
    assert out == {1: (2, 10), 2: (0, 0), 3: (0, 0)}


def test_merge_join_plans_as_sort_merge(spark):
    import __spark_entry__ as E

    df = E.queries()["q_merge_join_stats"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_plan_lint_flags_and_allowlists(spark):
    # the linter's three detectors on crafted plans
    import importlib.util as ilu
    import sys as _sys

    spec = ilu.spec_from_file_location("plan_lint", "/root/repo/tools/plan_lint.py")
    m = ilu.module_from_spec(spec)
    _sys.modules["plan_lint"] = m
    spec.loader.exec_module(m)

    a = spark.range(5)
    b = spark.range(7)
    cart = a.crossJoin(b)._jdf.queryExecution().executedPlan().toString()
    # small cross joins plan as BNLJ, large ones as CartesianProduct —
    # either way the linter must flag a non-allowlisted name
    assert m.lint_plan("anything", cart)
    assert m.lint_plan("anything", "... CartesianProduct ...") == ["CartesianProduct"]

    from pyspark.sql import Window as W
    gw = (
        spark.range(10)
        .withColumn("rn", F.row_number().over(W.orderBy("id")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert any("Window" in p for p in m.lint_plan("not_allowed", gw))
    assert m.lint_plan("q_shard_plan", gw) == []  # allowlisted

    clean = (
        spark.range(10).groupBy((F.col("id") % 2).alias("g")).count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert m.lint_plan("anything", clean) == []


def test_regression_slope_matches_numpy_lstsq(spark):
    import numpy as np
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = {r.event_type: r for r in
           E.queries()["q_regression_slope"](spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    one = sorted(out)[0]
    rows = ev.filter(F.col("event_type") == one).select("ts", "value").collect()
    x = np.array([int(r.ts.timestamp()) // 3600 - 1704067200 // 3600 for r in rows],
                 dtype=np.float64)
    y = np.array([round(r.value * 100) for r in rows], dtype=np.float64)
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(out[one].slope_cents_per_hr - slope) < 1e-6
    assert abs(out[one].intercept_cents - intercept) < 1e-3
