"""Single-pass table profiler — the data-quality screen a pipeline runs
before trusting a new drop: per column, null count, exact distinct count,
min/max (as strings, for a uniform schema across column types).

One aggregation over the table computes every column's stats in one scan;
the per-column rows are unpivoted from the single result row afterwards
(driver-side reshape of ONE row — no second pass, no per-column scans).

Scale note: N exact `countDistinct` aggregates in one agg plan through
Spark's Expand — the scan's rows are replicated once per distinct-aggregate
(×N_cols) before the shuffle. Fine to tens of columns at 10^12 rows (the
shuffle carries (col_tag, value) pairs, map-side partially aggregated); for
very wide tables swap the exact distinct for the deterministic KMV sketch
(`operators/sketch.py`) per column — same output shape, constant-size
state, no Expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats: ``(col_name, n_nulls, n_distinct, min_val,
    max_val)``. ``n_distinct`` excludes nulls (SQL COUNT(DISTINCT)
    semantics); min/max are computed on the NATIVE type (numeric order for
    numerics) and cast to string afterwards."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")

def hot_keys(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Heavy-hitter report over a key column: the ``top_k`` most frequent
    keys with their counts and share of all rows — the diagnostic that
    feeds every salting decision in this engine (hot shingles in the PPJoin
    prefix filter, hot bands in the LSH tiers, hot partitions in any
    shuffle). Run it BEFORE a 100 TB job to know which keys need the salted
    tier, and after to audit that the tiering thresholds were right.

    Deterministic by total order: rows are ranked by ``(n DESC, key ASC)``,
    so the reported set and order never depend on partitioning. ``share``
    is ``n / total`` with both counts exact integers (< 2^53), so the
    double division is correctly rounded and bit-identical across engines.

    Scale: one map-side-combinable groupBy on the key (the count relation
    is |distinct keys| rows, far smaller than the input) + a broadcast of
    the single-row total + TakeOrderedAndProject for the top-k — no global
    sort, no window over one partition.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n")
    )
    total = counts.agg(F.sum("n").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") / F.col("_total").cast("double")).alias("share"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
    )


def equi_width_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 12,
) -> DataFrame:
    """Equi-width histogram of a numeric column, integer-exact: values are
    floored to integers, the range is split into ``n_bins`` equal integer-
    width bins, and every arithmetic step (width, bin id, bounds) is integer
    — no float division anywhere, so the result is bit-identical across
    engines and accumulation orders.

    Two passes, both cheap at any scale: pass 1 is a column-pruned min/max
    aggregation (map-side combinable, one row out); pass 2 broadcasts that
    row and bins map-only, then aggregates |bins| rows. Empty bins are
    omitted (a sequence join can densify them; the count of a missing bin
    is zero by construction).

    ``width = (max - min) div n_bins + 1`` guarantees every value lands in
    ``[0, n_bins)``; bounds are inclusive integers ``[lo, hi]``. Nulls are
    dropped (they have no bin).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    v = F.floor(F.col(value_col)).cast("long")
    bounds = df.filter(F.col(value_col).isNotNull()).agg(
        F.min(v).alias("_min"), F.max(v).alias("_max")
    )
    binned = (
        df.filter(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            v.alias("_v"),
            "_min",
            F.expr(f"(_max - _min) div {int(n_bins)}").alias("_w_raw"),
        )
        .select(
            "_v",
            "_min",
            (F.col("_w_raw") + 1).alias("_w"),
        )
        .select(
            F.expr("(_v - _min) div _w").alias("bin_id"),
            "_min",
            "_w",
        )
    )
    return (
        binned.groupBy("bin_id", "_min", "_w")
        .agg(F.count("*").alias("n"))
        .select(
            "bin_id",
            (F.col("_min") + F.col("bin_id") * F.col("_w")).alias("lo"),
            (F.col("_min") + (F.col("bin_id") + 1) * F.col("_w") - 1).alias("hi"),
            "n",
        )
    )
