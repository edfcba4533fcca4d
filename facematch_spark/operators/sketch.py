"""KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002 /
Beyer et al. SIGMOD'07 (public). Unlike HLL (``approx_count_distinct``),
KMV over a fixed hash is fully DETERMINISTIC — same input, same estimate,
bit for bit — which is what makes it SQL-oracle-able AND reproducible across
engines/runs: the right sketch family for data pipelines whose outputs are
diffed and audited.

Hash: the first 8 hex chars of md5(value-as-string) read as an integer —
uniform in [0, 2³²), identical expression available in Spark
(``conv(substring(md5(..)..), 16, 10)``) and DuckDB
(``('0x' || substr(md5(..), 1, 8))::BIGINT``).

Estimator: with the k smallest distinct hash fractions u₍₁₎<…<u₍ₖ₎ of D
distinct values, E[u₍ₖ₎] ≈ k/D, so est = (k−1)/u₍ₖ₎ (the unbiased form);
when a group has fewer than k distinct hashes the sketch IS the exact set,
so the exact count is returned. Relative error ~1/√k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(2**32)
# Prefilter safety factor: expected survivors per group ≈ C·k·(D/N) ≤ C·k.
_PREFILTER_C = 8


def _hv(col) -> "F.Column":
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def _kmv_estimate(hashed: DataFrame, k: int) -> DataFrame:
    """(grp, hv) distinct rows → (grp, est_distinct). Window-rank form —
    exact k-min per group; fine when the per-group distinct relation is
    already small (which the prefilter guarantees on the hot path)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("grp").orderBy("hv")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return kept.groupBy("grp").agg(
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.max("hv")
            ),
            2,
        ).alias("est_distinct")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    prefilter: bool = True,
) -> DataFrame:
    """Per-group KMV distinct-count estimate: ``(grp, est_distinct)``.

    ``prefilter=False`` is the textbook form: distinct (group, hash), rank,
    keep k smallest — but the distinct+rank shuffles and sorts EVERY row,
    which defeats the point of a sketch at 10^12 rows.

    ``prefilter=True`` (default) is the scale path, output PROVABLY
    identical (pytest-pinned):

      1. one map-side-combined count per group (N_g);
      2. threshold τ_g = C·k/N_g of the hash space — everything above it is
         dropped MAP-SIDE, before any shuffle. Expected survivors per group
         ≈ C·k·(D_g/N_g) ≤ C·k — constant, not data-sized;
      3. survivors → distinct → rank (tiny relation);
      4. exactness rule: a group with ≥ k surviving distinct hashes has its
         k global minima all below τ_g (they survived), so its estimate
         equals the unfiltered one EXACTLY. A group with < k survivors
         cannot be adjudicated (D_g < k? or τ_g cut into the minima? —
         happens when D_g ≪ N_g, e.g. 100 distinct values in 10⁹ rows) and
         is RERUN unfiltered — cheap precisely because such groups are
         distinct-poor after dedup... but the rerun must still scan, so it
         re-filters nothing; correctness first, and the common
         high-cardinality case never takes it.

    The rerun-split makes the operator exact-equivalent to the textbook
    form deterministically — no probabilistic "with high probability"
    caveat survives into the output.
    """
    hashed_raw = df.select(F.col(group_col).alias("grp"), _hv(value_col).alias("hv"))
    if not prefilter:
        return _kmv_estimate(hashed_raw.dropDuplicates(["grp", "hv"]), k)

    # counts and survivors are tiny (one row per group; ≤ C·k rows per
    # group) but each feeds MULTIPLE consumers — checkpoint them so the
    # full-relation scan+filter lineage runs once, not once per consumer.
    counts = (
        hashed_raw.groupBy("grp").agg(F.count("*").alias("n_rows")).localCheckpoint()
    )
    tau = counts.select(
        "grp",
        F.least(
            F.lit(_HASH_SPACE),
            F.lit(float(_PREFILTER_C * k)) * F.lit(_HASH_SPACE) / F.col("n_rows"),
        ).alias("tau"),
    )
    # τ / group-split joins: one row per group — left to Catalyst/AQE to
    # broadcast (it will, at any group count where broadcasting is sane).
    survivors = (
        hashed_raw.join(tau, "grp")
        .filter(F.col("hv") < F.col("tau"))
        .select("grp", "hv")
        .dropDuplicates(["grp", "hv"])
        .localCheckpoint()
    )
    surv_counts = survivors.groupBy("grp").agg(F.count("*").alias("n_surv"))
    ok_groups = surv_counts.filter(F.col("n_surv") >= k).select("grp")
    # groups with ZERO survivors never appear in surv_counts — they must
    # rerun too (τ can cut everything when D ≪ N): rerun = all − ok.
    rerun_groups = counts.select("grp").join(ok_groups, "grp", "left_anti")

    est_ok = _kmv_estimate(survivors.join(ok_groups, "grp", "left_semi"), k)
    est_rerun = _kmv_estimate(
        hashed_raw.join(rerun_groups, "grp", "left_semi").dropDuplicates(
            ["grp", "hv"]
        ),
        k,
    )
    return est_ok.unionByName(est_rerun)


def kmv_distinct_sharded(
    df: DataFrame,
    group_col: str,
    value_col: str,
    shard_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV estimate computed via MERGEABLE per-shard states —
    the property that makes a sketch useful at all at scale: each shard
    (partition, day, ingest batch) keeps only its k smallest distinct
    hashes (k·8 bytes of state), and states union+re-rank into the global
    sketch without ever revisiting shard data.

    Losslessness of the merge: every one of the global k smallest distinct
    hashes is ≤ the k-th smallest within its own shard, hence present in
    that shard's state — so re-ranking the unioned states recovers the
    EXACT global k-minimum set, and the merged estimate equals
    ``kmv_distinct`` over the unsharded input bit-for-bit. The DuckDB
    oracle computes the DIRECT unsharded form, so the value hash is the
    mergeability proof.
    """
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.col(shard_col).alias("_shard"),
        _hv(value_col).alias("hv"),
    ).dropDuplicates(["grp", "_shard", "hv"])
    from pyspark.sql import Window as W

    w = W.partitionBy("grp", "_shard").orderBy("hv")
    states = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("grp", "hv")
    )
    return _kmv_estimate(states.dropDuplicates(["grp", "hv"]), k)
