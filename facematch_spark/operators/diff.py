"""Snapshot reconciliation — the table-diff every incremental pipeline runs
to validate a rebuild against the previous run (and the batch analog of the
CDC log ``merge.py`` consumes: diff two snapshots and you RECOVER the
change log).

``snapshot_diff(old, new, key)`` compares row content by a column-pruned
hash and emits one row per differing key with a status in
``{added, removed, changed}`` — unchanged rows are dropped as early as
possible and never reach the output.

Scale shape: ONE full-outer shuffle join on the key, carrying only
``(key, xxhash64(content))`` — 16 bytes/row regardless of row width, so a
100 TB table diffs by moving ~1.6 TB through the exchange (the content
hash is computed map-side at the scan). If both snapshots are bucketed by
the key (``bucketed.py``), even that exchange disappears. The naive
``EXCEPT``-both-ways form scans each side twice and shuffles full rows
twice — this is the one-pass replacement.

Hash choice: the diff verdict only needs equality, so the 64-bit xxhash64
is the engine's fast path (a collision can only MISS a change, at ~2^-64
per changed row); the entry query uses md5 instead so the DuckDB oracle
reproduces the exact predicate (md5 is the cross-engine-pinned hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
    use_md5: bool = False,
) -> DataFrame:
    """Return (key, status) for every key whose row was added, removed, or
    changed between ``old`` and ``new``. ``compare_cols`` defaults to every
    non-key column common to both sides (order-normalized so the hash is
    layout-independent)."""
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - {key}
        )
    if not compare_cols:
        raise ValueError("no columns to compare")

    def hashed(df: DataFrame, out: str) -> DataFrame:
        # NULLs are distinguished from empty strings (concat_ws SKIPS null
        # args — unguarded, (a, NULL) would hash equal to (a, '')).
        cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in compare_cols
        ]
        h = F.md5(F.concat_ws("\x1f", *cols)) if use_md5 else F.xxhash64(*cols)
        return df.select(F.col(key), h.alias(out))

    o = hashed(old, "_h_old")
    n = hashed(new, "_h_new")
    return (
        o.join(n, key, "full_outer")
        .withColumn(
            "status",
            F.when(F.col("_h_old").isNull(), F.lit("added"))
            .when(F.col("_h_new").isNull(), F.lit("removed"))
            .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed")),
        )
        .filter(F.col("status").isNotNull())
        .select(key, "status")
    )
