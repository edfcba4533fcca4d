"""Deterministic corpus sampling for training-data subsetting.

Reference parity: the reference pipeline has no sampling stage (it processes
every input file, tasks.py:69-96); this module is an engine addition for the
training-data use case — carving per-stratum subsets (per language, per
source) out of a deduplicated corpus without a seed file or a shuffle.

Design for 100 TB: the sample predicate is a pure per-row expression
(md5 of a salted key compared against a per-stratum hex threshold), so the
operator is map-only — no shuffle, no sort, no state; it composes with scan
pushdown and survives any repartitioning because membership depends only on
the row's own key. The same predicate is expressible in ANSI SQL (the DuckDB
oracle runs it verbatim), and lexicographic comparison on the fixed-width
lowercase hex prefix equals numeric comparison on the first 32 hash bits, so
no hex→int conversion is needed in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rate_to_hex_threshold", "stratified_sample"]


def rate_to_hex_threshold(rate: float) -> str:
    """Sampling rate in [0, 1] → 8-char lowercase hex threshold such that
    P[substr(md5(key),1,8) < threshold] == rate (md5 prefix is uniform on
    [0, 2^32))."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "doc_id",
    strata_col: str = "lang",
    default_rate: float = 0.0,
    salt: str = "sample:",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    membership is ``substr(md5(salt || key), 1, 8) < hex_threshold(rate)``.

    Properties a training-data pipeline needs and seeded ``df.sample`` lacks:

    * **reproducible across runs, partitionings and engines** — membership
      is a function of the row key alone (``df.sample`` depends on partition
      layout: same seed, different split → different sample);
    * **consistent across supersets** — a row keeps the same verdict when
      the corpus grows, so incremental batches sample consistently with
      history (the property that makes held-out sets stable);
    * **nested samples** — rate 0.1 is a strict subset of rate 0.2 at the
      same salt, so curriculum-style size ladders share rows by design.

    Different ``salt`` values give independent samples (e.g. train vs eval
    splits drawn from disjoint hash spaces — disjointness is enforced by
    complementary thresholds, independence by distinct salts).

    Returns the sampled rows with a ``sample_key`` column (the compared
    prefix) kept for audit.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    threshold = F.lit(rate_to_hex_threshold(default_rate))
    # build the per-stratum threshold as a CASE chain (a handful of strata;
    # a broadcast-map join would be equivalent for thousands of strata)
    for stratum, rate in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == stratum, F.lit(rate_to_hex_threshold(rate)))
            .otherwise(threshold)
        )
    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )
    return df.withColumn("sample_key", key).filter(F.col("sample_key") < threshold)


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "temp:",
) -> DataFrame:
    """Temperature-balanced subsampling (the XLM-R / mT5 multilingual mix):
    resample so kept counts follow ``p_l^alpha`` (renormalized), flattening
    the language distribution toward uniform as alpha → 0, by DOWNSAMPLING
    only — the rarest stratum keeps 100% and every larger stratum keeps
    ``rate_l = (n_min / n_l)^(1 - alpha)``; no row is ever repeated.

    Derivation: kept_l = c·p_l^alpha with the largest feasible c (all
    rates ≤ 1) gives c = N·p_min^(1-alpha), hence the closed form above —
    N cancels, so the rate depends only on the integer count ratio.

    Membership reuses the stratified-sample predicate (md5-prefix versus a
    per-stratum threshold), inheriting all its properties: map-only row
    verdicts, partition-independence, superset consistency WITHIN a stratum
    whose rate is unchanged, nesting across alphas (smaller alpha ⊂ larger
    at one salt, per stratum), independent splits across salts. Unlike
    ``stratified_sample`` the rates are DERIVED from the data (one tiny
    groupBy — |strata| rows — broadcast back), so corpus growth that changes
    counts changes rates; pin rates explicitly via ``stratified_sample``
    when incremental stability matters more than balance.

    Exact cross-engine reproducibility: for alpha ∈ {0.5, 0.75} the
    exponent (1 - alpha) ∈ {0.5, 0.25} is evaluated as one or two IEEE-754
    ``sqrt`` calls — sqrt is correctly rounded by the standard (unlike
    ``pow``), so Spark and any ANSI engine compute bit-identical rates and
    thresholds from the same counts. Other alphas fall back to ``pow`` and
    may flip a row whose hash sits within an ULP of the threshold
    (~2^-20 per stratum): fine for production, not for a value-hash oracle.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    ratio = F.col("_n_min") / F.col("_n")  # exact-int division, one rounding
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    elif alpha == 0.75:
        rate = F.sqrt(F.sqrt(ratio))
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .withColumn("_rate", rate)
        .withColumn(
            "_threshold",
            F.lpad(
                F.lower(
                    F.hex(
                        F.least(
                            F.floor(F.col("_rate") * F.lit(float(2**32))).cast("long"),
                            F.lit(2**32 - 1),
                        )
                    )
                ),
                8,
                "0",
            ),
        )
        .select(strata_col, "_rate", "_threshold")
    )
    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn("sample_key", key)
        .filter(F.col("sample_key") < F.col("_threshold"))
        .drop("_rate", "_threshold")
    )
