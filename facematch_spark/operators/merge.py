"""CDC merge / upsert — the lakehouse MERGE INTO semantics (update matched,
insert new, delete tombstoned, latest-change-wins) as a plain DataFrame
dataflow over immutable Parquet.

The reference mutates its stores in place (sqlite row updates,
recognizeapp/utils.py persistence helpers); a Spark engine over object-store
Parquet cannot — the canonical replacement is a merge job that reads the
base snapshot plus a change batch and writes the next snapshot. This is the
operator every incremental 100 TB pipeline runs daily, so it is first-class
here with an exact ANSI-SQL twin.

Scale shape — ONE shuffle, map-side combinable:

  * tag base rows rank 0, change rows rank 1 + their change sequence;
  * union, groupBy(key).agg(max_by(payload_struct, (rank, seq))) — a
    hash aggregate with partial aggregation on the map side, so the wire
    carries at most one row per (key, map task), NOT the sorted-window
    row_number form (which shuffles every row and sorts every key group);
  * drop tombstones ('D') after the merge, so a delete beats the base row
    it shadows but never resurrects.

Latest-wins needs a total order: (rank, seq). Within one batch, ``seq_col``
must be unique per key (a CDC log's LSN / offset); ties would make the
result nondeterministic, so duplicates of (key, seq) in the change batch
raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change-operation column values
OP_UPSERT = "U"
OP_DELETE = "D"


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str = "seq",
    check_unique: bool = True,
) -> DataFrame:
    """Apply a CDC change batch to a base snapshot.

    ``changes`` carries the full base schema plus ``op_col`` ('U' upsert /
    'D' delete) and ``seq_col`` (bigint change order, unique per key).
    Returns the next snapshot with the base column set: for every key the
    highest-(rank, seq) version wins, and keys whose winner is a delete are
    dropped. Keys only in base pass through; keys only in changes insert.
    """
    payload_cols = base.columns
    if check_unique:
        # One cheap distinct-count pass; a duplicated (key, seq) would make
        # max_by nondeterministic. At scale this is an optional audit job.
        dup = (
            changes.groupBy(key, seq_col).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(f"changes batch has duplicate ({key}, {seq_col}) rows")

    tagged_base = base.select(
        F.col(key).alias("_k"),
        F.lit(0).alias("_rank"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(OP_UPSERT).alias("_op"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    )
    tagged_changes = changes.select(
        F.col(key).alias("_k"),
        F.lit(1).alias("_rank"),
        F.col(seq_col).cast("long").alias("_seq"),
        F.col(op_col).alias("_op"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    )
    merged = (
        tagged_base.unionByName(tagged_changes)
        .groupBy("_k")
        .agg(
            F.max_by(
                F.struct(F.col("_op"), F.col("_payload")),
                F.struct(F.col("_rank"), F.col("_seq")),
            ).alias("_win")
        )
    )
    return (
        merged.filter(F.col("_win._op") != OP_DELETE)
        .select(*[F.col(f"_win._payload.{c}").alias(c) for c in payload_cols])
    )
