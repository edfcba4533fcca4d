"""Generic distributed prefix scan (running min/max/sum over a global key
order) and the 2-D skyline (Pareto frontier) built on it.

The textbook prefix scan — ``agg(x) OVER (ORDER BY key ROWS UNBOUNDED
PRECEDING)`` with no PARTITION BY — plans as a single task (the same scale
bug ``shard_plan`` documents for its prefix sum). This module generalizes
shard_plan's two-pass scheme to any associative aggregate:

  pass 1: ``repartitionByRange(key)`` → per-partition EXCLUSIVE running
          aggregate ordered by key (local), plus one per-partition total;
  offset: exclusive scan of the P per-partition totals (P = #partitions —
          trivially small);
  pass 2: broadcast the offsets back and combine:
          ``prefix = combine(partition_offset, local_exclusive)``.

Keys must be UNIQUE (pre-aggregate duplicates first — the skyline does
exactly that); with unique keys "exclusive" is unambiguous and the result
is partition-count-invariant.

Skyline (Börzsönyi et al. ICDE'01): a part is Pareto-optimal on
(minimize price, maximize size) iff no other part has price ≤ AND size ≥
with one strict. Reduction to one prefix scan: per distinct price keep the
max size; a row survives iff its size equals its price-group max AND
strictly exceeds the running max over all cheaper prices. No float
ARITHMETIC anywhere — prices are only compared/grouped, so cross-engine
determinism holds. The DuckDB oracle deliberately uses the O(N²)
NOT-EXISTS dominance form — an independent formulation, not a mirror of
the scan trick.

Reference parity: no analog in the reference (engine addition, SURVEY
§2.11); the public algorithms are cited above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_AGGS = {
    "max": (F.max, F.greatest),
    "min": (F.min, F.least),
    "sum": (F.sum, lambda a, b: a + b),
}


def prefix_agg(
    rows: DataFrame,
    key: str | list[str],
    value_col: str,
    agg: str = "max",
    out_col: str = "prefix",
) -> DataFrame:
    """All input columns + ``out_col`` = the EXCLUSIVE running ``agg`` of
    ``value_col`` over ascending ``key`` order (NULL for the global first
    row — no preceding values). ``key`` (one column or a composite, all
    ascending) must be unique as a tuple. Descending orders are expressed
    by negating the key column (cf. ``q_pareto_revenue``)."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")
    agg_fn, combine = _AGGS[agg]
    keys = [key] if isinstance(key, str) else list(key)

    parted = rows.repartitionByRange(*keys)
    # Pin the pid draw once — totals and pass 2 both consume it (house rule).
    with_pid = parted.withColumn("_pid", F.spark_partition_id()).localCheckpoint()

    totals = with_pid.groupBy("_pid").agg(agg_fn(value_col).alias("_ptot"))
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select("_pid", agg_fn("_ptot").over(w_off).alias("_offset"))

    w_local = W.partitionBy("_pid").orderBy(*keys).rowsBetween(W.unboundedPreceding, -1)
    local: Column = agg_fn(value_col).over(w_local)
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.when(F.col("_offset").isNull(), local)
            .when(local.isNull(), F.col("_offset"))
            .otherwise(combine(F.col("_offset"), local)),
        )
        .drop("_pid", "_offset")
    )


def skyline_2d(
    rows: DataFrame,
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """Rows on the 2-D Pareto frontier (minimize ``minimize_col``,
    maximize ``maximize_col``); ties on BOTH dimensions all survive (none
    dominates the other). One groupBy + one distributed prefix scan +
    one broadcast-scale join back — never an all-pairs dominance join."""
    per_key = rows.groupBy(minimize_col).agg(
        F.max(maximize_col).alias("_grp_max")
    )
    pm = prefix_agg(per_key, key=minimize_col, value_col="_grp_max",
                    agg="max", out_col="_prev_max")
    return (
        rows.join(pm, minimize_col)
        .filter(
            (F.col(maximize_col) == F.col("_grp_max"))
            & (F.col("_prev_max").isNull() | (F.col(maximize_col) > F.col("_prev_max")))
        )
        .drop("_grp_max", "_prev_max")
    )
