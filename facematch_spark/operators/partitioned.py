"""Partition-pruned table layout: pay directory layout ONCE at write time,
then every date-bounded query reads only its partitions' files.

This is the second half of the write-time-investment pair (the first is
``bucketed.py``'s co-located join): where bucketing removes the JOIN
shuffle, Hive-style ``partitionBy`` removes the SCAN itself — a filter on
the partition column resolves against directory names during planning
(``PartitionFilters`` in the formatted plan; at 100 TB with daily
partitions, a 3-day query lists 3 directories instead of reading 10^12
rows' footers). The reference rescans its full input directory on every
run (`tasks.py:31-50` os.walk over the corpus root); this is the layout
that makes the equivalent "what changed this week" query O(week), not
O(corpus).

Partition-column choice at scale: low cardinality (dates, regions — one
directory per value, and the write shuffles into one task-file per value
per write task), NEVER a high-cardinality key (doc_id partitioning is the
small-files problem this module's sibling ``shard_plan`` exists to fix).
The partition column is stored in the directory name, not the data files,
so it costs zero bytes per row.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _layout_root(spark: SparkSession) -> str:
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    return os.path.join(wh, "fm_partitioned")


def write_partitioned(
    df: DataFrame, name: str, partition_col: str, overwrite: bool = True
) -> str:
    """Write ``df`` Hive-partitioned by ``partition_col`` under the session
    warehouse and return the path. Overwrites any previous copy (the local
    analog of rebuilding a layout; incremental appends at scale go through
    dynamic partition overwrite instead)."""
    path = os.path.join(_layout_root(df.sparkSession), name)
    if overwrite:
        shutil.rmtree(path, ignore_errors=True)
    df.write.partitionBy(partition_col).mode("overwrite").parquet(path)
    return path


def read_partitioned(spark: SparkSession, name: str) -> DataFrame:
    """Read a layout written by :func:`write_partitioned`; filters on the
    partition column prune directories at planning time."""
    return spark.read.parquet(os.path.join(_layout_root(spark), name))


def daily_event_layout(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Materialize the events table partitioned by event date and return the
    pruned-scan-capable DataFrame. The partition value is formatted as a
    string (directory names are strings anyway; keeping it explicit avoids
    the partition-column type-inference round trip on read)."""
    dated = events.withColumn(
        "event_date", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    write_partitioned(dated, "events_by_date", "event_date")
    return read_partitioned(spark, "events_by_date")
