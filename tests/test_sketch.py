"""KMV distinct-count sketch: determinism, prefilter equivalence, the
rerun path, and the error bound."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kmv_prefilter_equals_textbook_on_fixture(spark):
    from facematch_spark.operators.sketch import kmv_distinct

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    fast = sorted(map(tuple, kmv_distinct(orders, "o_orderpriority", "o_custkey", k=64).collect()))
    slow = sorted(map(tuple, kmv_distinct(orders, "o_orderpriority", "o_custkey", k=64, prefilter=False).collect()))
    assert fast == slow


def test_kmv_rerun_path_tiny_cardinality_huge_rowcount(spark):
    """D=5 distinct values over 50k rows: τ = C·k/N cuts ~everything, the
    <k-survivors rule must force the unfiltered rerun, and D<k means the
    answer is EXACT."""
    from facematch_spark.operators.sketch import kmv_distinct

    df = spark.range(50_000).select(
        F.lit("g").alias("grp"), (F.col("id") % 5).alias("v")
    )
    [row] = kmv_distinct(df, "grp", "v", k=64).collect()
    assert row["est_distinct"] == 5.0


def test_kmv_error_bound_high_cardinality(spark):
    """10k distinct values, k=64: |est/D − 1| within 4/√k (the estimator's
    std is ~1/√k; 4σ over a deterministic hash draw is a safe fixed bound)."""
    from facematch_spark.operators.sketch import kmv_distinct

    df = spark.range(10_000).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    [row] = kmv_distinct(df, "grp", "v", k=64).collect()
    assert abs(row["est_distinct"] / 10_000 - 1) < 4 / 64**0.5


def test_kmv_exact_below_k(spark):
    from facematch_spark.operators.sketch import kmv_distinct

    df = spark.range(1000).select(
        F.lit("g").alias("grp"), (F.col("id") % 40).alias("v")
    )
    [row] = kmv_distinct(df, "grp", "v", k=64).collect()
    assert row["est_distinct"] == 40.0


def test_kmv_partitioning_invariance(spark):
    """Deterministic sketch: repartitioning must not change a single bit —
    the property HLL/approx_count_distinct cannot give you."""
    from facematch_spark.operators.sketch import kmv_distinct

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    a = sorted(map(tuple, kmv_distinct(orders.repartition(1), "o_orderpriority", "o_custkey").collect()))
    b = sorted(map(tuple, kmv_distinct(orders.repartition(13), "o_orderpriority", "o_custkey").collect()))
    assert a == b
