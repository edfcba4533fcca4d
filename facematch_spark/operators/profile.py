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
