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
