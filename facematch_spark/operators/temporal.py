"""Temporal join operators Spark's DataFrame API lacks as primitives —
as-of join and point-interval range join — built from shuffle-exchange +
window / equi-join shapes that survive 100 TB (driver brief: "when the
reference has an operator Spark lacks (e.g., as-of join, range join),
implement it as a composition of existing DataFrame ops").

Both have exact ANSI-SQL twins in ``__spark_entry__.oracle_sql`` (DuckDB
verifies values bit-for-bit); neither uses a UDF or a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tie_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the single right row with the
    greatest ``right_ts <= left_ts`` for the same key (LEFT semantics —
    unmatched left rows survive with null payload). Ties on ``right_ts``
    break to the greatest ``tie_col`` (required if ties are possible, else
    the result would be partition-order-dependent).

    ``payload`` maps right-column → output-alias for the columns carried
    over.

    Implementation is the union-sort-window form — the ONLY as-of shape that
    survives scale:

      * naive ``join on key + filter ts <= ts' + window rank`` materializes
        every (left, right) key pair BEFORE ranking — O(|L_k|·|R_k|) rows
        per key, quadratic on active keys;
      * union-sort-window is O(|L| + |R|): tag sides, union, ONE shuffle on
        the key, ONE per-key sort on (ts, side, tie), then
        ``last(payload, ignorenulls=True)`` over the preceding frame — each
        left row reads the latest right row seen so far. No join node in
        the plan at all (plan-asserted in pytest).

    Right rows sort BEFORE left rows at equal ts (side 0 < 1), so a right
    row at exactly ``left_ts`` matches — the standard backward-inclusive
    convention.

    Skew: one pathological key serializes into one task's sort (same bound
    as any per-key window). If a key holds a large fraction of both sides,
    pre-split by a coarse time-range salt and as-of join per range with
    boundary carry-in — documented in SCALE.md, not needed at any tested SF.
    """
    from pyspark.sql import Window as W

    lcols = left.columns
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tie_col) if tie_col else F.lit(0)).alias("_tie"),
        *[F.col(src).alias(f"_p_{alias}") for src, alias in payload.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        *[
            F.lit(None).cast(right.schema[src].dataType).alias(f"_p_{alias}")
            for src, alias in payload.items()
        ],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = r.unionByName(l).select(
        "_side",
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[
            F.last(f"_p_{alias}", ignorenulls=True).over(w).alias(alias)
            for alias in payload.values()
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join_count(
    points: DataFrame,
    others: DataFrame,
    pt_ts: str,
    other_ts: str,
    window_s: int,
    out_col: str = "n_in_range",
) -> DataFrame:
    """Point-interval range join, aggregated: for each point row, count
    ``others`` rows with ``other_ts ∈ [pt_ts − window_s, pt_ts)`` — no equi
    key at all (the hard case; with one, just add it to the join).

    Binned equi-join form (the standard Spark range-join decomposition):
    bin width = ``window_s``; a match's bin is provably in
    {bin(pt) − 1, bin(pt)} (truncation to whole seconds only widens bins,
    never splits a candidate out: floor_sec(other) ∈ [floor_sec(pt) − w,
    floor_sec(pt)] ⟹ bin(other) ∈ {bin(pt)−1, bin(pt)}), so each point
    probes exactly TWO bins, each other-row lands in ONE bin (no candidate
    dedup needed), and the residual predicate re-checks the exact
    microsecond timestamps. Candidate blow-up is 2× the point side — constant,
    not data-dependent. Hot bins (a traffic burst) are ordinary equi-join
    skew: AQE splits them.

    Returns all point rows (zero-match points carry 0). Point rows must be
    unique as tuples (a duplicated full row would merge in the re-group) —
    any table with a key column satisfies this.

    LEFT join with the residual in the ON clause (not a post-filter, which
    would drop zero-match points), then re-group over the point columns:
    GROUP BY treats nulls as equal, so nullable point columns are safe —
    a counts-then-rejoin shape would silently lose rows with null keys.
    """
    bin_of = lambda c: F.floor(F.unix_timestamp(F.col(c)) / F.lit(window_s))  # noqa: E731
    o = others.select(F.col(other_ts).alias("_ots"), bin_of(other_ts).alias("_obin"))
    probes = points.select(
        *points.columns,
        F.explode(F.array(bin_of(pt_ts) - 1, bin_of(pt_ts))).alias("_bin"),
    )
    lo = F.col(pt_ts) - F.expr(f"INTERVAL {window_s} SECOND")
    matched = probes.join(
        o,
        (F.col("_bin") == F.col("_obin"))
        & (F.col("_ots") >= lo)
        & (F.col("_ots") < F.col(pt_ts)),
        "left",
    )
    return matched.groupBy(*points.columns).agg(
        F.sum(F.when(F.col("_ots").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias(out_col)
    )

def interval_overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    l_keys: list[str],
    r_keys: list[str],
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    bin_s: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join (both sides are [start, end] closed
    intervals, no equi key): emit one row per (left, right) pair whose
    intervals share at least one instant.

    Binned decomposition, lossless for ANY bin width: each interval explodes
    to every whole-``bin_s`` bin it touches (``sequence(floor(s/w),
    floor(e/w))``); if two intervals overlap at instant p, BOTH cover
    ``bin(p)``, so the bin equi-join always surfaces the pair — no maximum-
    length precondition (unlike the 2-probe point form above, which needs
    window ≥ bin). A pair sharing several bins duplicates, so candidates are
    ``dropDuplicates`` on the key tuple before the exact residual check
    ``l_start <= r_end AND r_start <= l_end`` (microsecond timestamps,
    closed-closed — touching endpoints count).

    Cost model: candidate rows = Σ_bins |L_bin|·|R_bin|; explode fan-out per
    interval = len/bin_s + 1. Pick ``bin_s`` near the median interval length
    — too small explodes long intervals into many bins, too large piles
    unrelated intervals into one bin (then AQE skew-split handles the hot
    bins like any equi-join skew). Both failure modes degrade cost, never
    correctness.

    Key columns are prefixed ``l_`` / ``r_`` in the output (plus the four
    boundary columns), so self-joins need no pre-aliasing.
    """
    bins_of = lambda s, e: F.sequence(  # noqa: E731
        F.floor(F.unix_timestamp(F.col(s)) / F.lit(bin_s)).cast("long"),
        F.floor(F.unix_timestamp(F.col(e)) / F.lit(bin_s)).cast("long"),
    )
    l = left.select(
        *[F.col(k).alias(f"l_{k}") for k in l_keys],
        F.col(l_start).alias("l_start"),
        F.col(l_end).alias("l_end"),
        F.explode(bins_of(l_start, l_end)).alias("_bin"),
    )
    r = right.select(
        *[F.col(k).alias(f"r_{k}") for k in r_keys],
        F.col(r_start).alias("r_start"),
        F.col(r_end).alias("r_end"),
        F.explode(bins_of(r_start, r_end)).alias("_bin"),
    )
    key_cols = [f"l_{k}" for k in l_keys] + [f"r_{k}" for k in r_keys]
    # exact residual BEFORE the dedup exchange: every duplicate of a key
    # tuple carries the same four boundary columns (they are functionally
    # dependent on the keys), so filtering first is lossless — and it is
    # the candidate-volume cliff: a pair sharing b bins duplicates b times,
    # and non-overlapping same-bin pairs never need to reach the shuffle
    # (measured at sf0.1: 13.0M join rows → 0.3M after the residual; the
    # 4-column dedup drops 7.3 s → 0.7 s).
    return (
        l.join(r, "_bin")
        .filter((F.col("l_start") <= F.col("r_end")) & (F.col("r_start") <= F.col("l_end")))
        .dropDuplicates(key_cols)
        .drop("_bin")
    )
