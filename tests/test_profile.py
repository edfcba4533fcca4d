"""Single-pass table profiler."""

from __future__ import annotations


def _rows(spark, df):
    from facematch_spark.operators.profile import profile_table

    return {r["col_name"]: r for r in profile_table(df).collect()}


def test_profile_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a"), (10, "a")], "n long, s string"
    )
    got = _rows(spark, df)
    assert (got["n"]["n_nulls"], got["n"]["n_distinct"]) == (0, 3)
    assert (got["s"]["n_nulls"], got["s"]["n_distinct"]) == (1, 2)  # distinct excludes null
    # numeric min/max in NATIVE order (10 > 2), stringified afterwards
    assert (got["n"]["min_val"], got["n"]["max_val"]) == ("1", "10")
    assert (got["s"]["min_val"], got["s"]["max_val"]) == ("a", "b")


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "n long, s string")
    got = _rows(spark, df)
    assert set(got) == {"n", "s"}
    for r in got.values():
        assert (r["n_nulls"], r["n_distinct"], r["min_val"], r["max_val"]) == (0, 0, None, None)


def test_profile_single_scan_plan(spark):
    """One scan feeds every column's aggregates (the point of the
    single-pass shape) — the plan must contain exactly one parquet scan."""
    from facematch_spark.operators.profile import profile_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = profile_table(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
