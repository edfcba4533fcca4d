"""Bucketed co-located join: pay the shuffle ONCE at write time, then join
(and aggregate on the same key) with zero Exchange forever after.

This is the bucketing pattern for repeated large×large joins at 100 TB —
the reference re-derives its pair relation from scratch every run
(`tasks.py:52-96` nested loop over all encodings); here the analog "fact ×
dim on a stable key" workload writes both sides bucketed by the join key,
and every subsequent join on that key reads co-partitioned buckets:

  * no ShuffleExchange on either side of the SortMergeJoin (Spark's scan
    reports ``HashPartitioning(key, n_buckets)``, which satisfies the
    join's distribution requirement),
  * a groupBy on the same key (or any superset containing it) ALSO
    satisfies its ClusteredDistribution from the scan, so join + aggregate
    run in one mapper stage end-to-end,
  * at 1000 executors this removes the two largest exchanges of the
    workload entirely; the cost moved to the one-time bucketed write,
    which is the same shuffle the first join would have paid anyway.

Both properties are plan-asserted in ``tests/test_round5_s7.py`` (zero
``Exchange`` substrings in the executed plan with broadcast disabled) and
in ``tools/explain_plans.py``.

Bucket-count choice at scale: buckets are fixed at write time, so size them
for the TARGET table size (total bytes ÷ 128-256 MB per bucket-file task),
not the current one; both sides must agree exactly — Spark joins b and k·b
bucket layouts only via ``spark.sql.bucketing.coalesceBucketsInJoin``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_DB = "fm_buckets"


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    database: str = DEFAULT_DB,
) -> DataFrame:
    """Write ``df`` bucketed (and per-bucket sorted) by ``key`` into the
    session warehouse and return the catalog-backed DataFrame whose scan
    carries the bucket partitioning. Overwrites any previous copy."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    # managed-table overwrite fails if a PRIOR session left the location on
    # disk without this session's catalog knowing the table — drop both. On a
    # real cluster the metastore is shared and the DROP alone suffices; the
    # rmtree is the local in-memory-catalog analog.
    spark.sql(f"DROP TABLE IF EXISTS {database}.{table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    shutil.rmtree(os.path.join(wh, f"{database}.db", table), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(f"{database}.{table}")
    )
    return spark.table(f"{database}.{table}")


def bucketed_customer_order_stats(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> DataFrame:
    """Per-customer order stats through a bucketed co-located join.

    orders ⋈ customer on custkey, then groupBy(custkey) — with both sides
    bucketed by their join key the SortMergeJoin needs no Exchange, and the
    aggregation's ClusteredDistribution(c_custkey) is already satisfied by
    the scan partitioning, so the whole query is exchange-free (the ONLY
    shuffles happened once, inside ``write_bucketed``).

    Sums are integer cents (exact at any accumulation order) so the result
    value-hashes identically against the SQL oracle.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bo = write_bucketed(orders, "orders_by_cust", "o_custkey", n_buckets)
    bc = write_bucketed(customer, "customer_by_key", "c_custkey", n_buckets)
    joined = bo.hint("merge").join(
        bc.hint("merge"), bo.o_custkey == bc.c_custkey, "inner"
    )
    return joined.groupBy("c_custkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "sum_cents"
        ),
    )
