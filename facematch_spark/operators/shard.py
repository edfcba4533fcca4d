"""Output shard planning via a DISTRIBUTED prefix sum — assign every row a
shard id such that shards are contiguous in a global key order and each
holds ~``target_bytes`` of payload (the "write N-GB output files" step at
the end of every training-data pipeline, and the general fix for the
small-files problem at 100 TB).

The textbook form — one global window ``sum(bytes) OVER (ORDER BY key)`` —
is a scale bug: an ORDER BY window with no PARTITION BY plans as a single
task (Spark literally warns "No Partition Defined for Window operation");
at 10^12 rows that one reducer sorts everything. The two-pass distributed
prefix-sum here is the classic replacement:

  pass 1: ``repartitionByRange(key)`` (range-sampled, so partitions are
          contiguous key ranges ordered by partition id), then ONE tiny
          per-partition agg ``(pid, sum(bytes))`` — P rows, P = #partitions;
  offset: cumulative sum over those P rows (a window over P rows — trivially
          driver-scale — ordered by pid, exclusive of self);
  pass 2: broadcast-join the offsets back by pid, then a per-partition
          window cumsum ordered by key. global_cumsum = offset + local.

Both windows partition on pid, so no single-reducer stage exists; the wide
data crosses the wire once (the range repartition). Range sampling makes
pid assignment nondeterministic run-to-run, but the RESULT is partition-
invariant: the global cumsum depends only on the total key order (pytest
pins equality against the naive single-window form and across partition
counts).

Shard id = floor(exclusive_cumsum / target_bytes) — a row belongs to the
shard its FIRST byte lands in, so shard ids are dense, monotone in the key,
and every shard except the last spans ≥ target_bytes of starts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def shard_plan(
    rows: DataFrame,
    key: str | list[str],
    bytes_col: str,
    target_bytes: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return (all input columns) + cum_bytes (inclusive) + shard_id.

    ``key`` (one column or a composite) must be globally unique as a tuple
    — it defines the total order; byte counts must be non-negative.
    """
    keys = [key] if isinstance(key, str) else list(key)
    parted = (
        rows.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else rows.repartitionByRange(*keys)
    )
    # Pin the pid assignment: both passes consume it, and a re-evaluated
    # range sample could re-draw partition boundaries between consumers
    # (house rule: every multi-consumer relation is checkpointed once).
    with_pid = parted.withColumn("_pid", F.spark_partition_id()).localCheckpoint()

    # pass 1: per-partition byte totals (P rows — tiny).
    totals = with_pid.groupBy("_pid").agg(F.sum(bytes_col).alias("_psum"))
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_psum").over(w_off), F.lit(0)).cast("long").alias("_offset")
    )

    # pass 2: local cumsum + broadcast offset. The window's partitionBy(_pid)
    # re-shuffles by pid hash — same width as the data, no global sort.
    w_local = W.partitionBy("_pid").orderBy(*keys).rowsBetween(W.unboundedPreceding, 0)
    out = (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "cum_bytes",
            (F.col("_offset") + F.sum(bytes_col).over(w_local)).cast("long"),
        )
        .withColumn(
            "shard_id",
            F.floor((F.col("cum_bytes") - F.col(bytes_col)) / F.lit(target_bytes)).cast("long"),
        )
        .drop("_pid", "_offset")
    )
    return out
