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

__all__ = [
    "rate_to_hex_threshold",
    "stratified_sample",
    "fixed_n_sample",
    "leakage_safe_split",
]


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


def fixed_n_sample(
    df: DataFrame,
    n: int,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "fixn:",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically —
    the "give me 10k eval docs per language" request that rate-based
    sampling can't satisfy (a rate yields a *binomial* count, and the right
    rate isn't known until the stratum is counted).

    Rows are ranked inside each stratum by ``(md5(salt || key), key)`` — a
    uniform total order independent of partition layout and engine — and
    ranks ≤ n are kept. Because the order is per-row-key stable, the sample
    is **prefix-nested across sizes** (the n=100 sample contains the n=50
    sample at the same salt) and **anti-stable under growth** in the useful
    direction: new rows displace the highest-ranked members first, never
    reshuffle the survivors' relative order.

    Scale: one shuffle on ``strata_col`` and a per-stratum sort. For strata
    far larger than ``n``, pre-filter with :func:`stratified_sample` at a
    generous rate (e.g. ``4·n/|stratum|``) so the sort sees O(n) rows per
    stratum instead of the full corpus, then rank the survivors; the
    md5-order prefix property guarantees the top-n under the filter equals
    the top-n without it whenever the filter keeps ≥ n rows.

    Returns the kept rows plus ``sample_key`` (the ranking hash) and
    ``rnk`` (1-based rank within the stratum).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql import Window as W

    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )
    w = W.partitionBy(strata_col).orderBy("sample_key", key_col)
    return (
        df.withColumn("sample_key", key)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= n)
    )


def leakage_safe_split(
    clusters: DataFrame,
    fractions: dict[str, float],
    cluster_col: str = "cluster_id",
    salt: str = "split:",
) -> DataFrame:
    """Train/val/test split assignment that near-duplicates cannot straddle:
    the split verdict hashes the row's duplicate-**cluster** id, not the row
    id, so every member of a near-dup cluster lands in the same split.

    Splitting by doc hash after dedup is the classic leakage bug — the
    cluster representative goes to train while an undropped near-twin (or
    the raw corpus rerun) lands in test, and the eval set silently overlaps
    training data. Keying the hash by ``cluster_col`` makes the guarantee
    structural: P[doc in split s] is still fractions[s] in expectation
    (cluster hashes are uniform), but the granule of assignment is the
    whole cluster.

    ``fractions`` must sum to 1 (within 1e-9): splits are **disjoint and
    exhaustive** by construction — consecutive half-open intervals of the
    32-bit hash space, ordered by split name for determinism. The verdict
    is a pure per-row expression over ``cluster_col`` (map-only — composes
    with any upstream partitioning, no shuffle of its own) and is stable
    under corpus growth for every cluster whose id survives (cluster_id =
    min member doc_id: adding docs can only change it when a new doc
    bridges or precedes the cluster — exactly when re-deciding is correct).

    Returns the input plus ``split_key`` (the hash prefix) and ``split``.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(cluster_col).cast("string"))), 1, 8
    )
    cum = 0.0
    verdict = None
    names = sorted(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        hi = F.lit(rate_to_hex_threshold(cum))
        branch = F.col("split_key") < hi
        verdict = (
            F.when(branch, F.lit(name))
            if verdict is None
            else verdict.when(branch, F.lit(name))
        )
    last = F.lit(names[-1])
    verdict = last if verdict is None else verdict.otherwise(last)
    return clusters.withColumn("split_key", key).withColumn("split", verdict)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample:",
) -> DataFrame:
    """Weight-proportional Bernoulli sample: each row is kept independently
    with probability ``weight / max(weight)`` — the length-proportional
    carve-out (sample long documents preferentially so a char-budgeted
    subcorpus needs fewer rows) and the importance-weighted variant of the
    md5-keyed sampling family.

    Same determinism contract as ``stratified_sample``: membership is a
    pure function of (salt, key, weight, w_max) — map-only verdicts after
    one scalar-max broadcast, partition-invariant, reproducible, and
    independent across salts. Monotone in weight at a fixed key: raising a
    row's weight can only flip it OUT→IN (the threshold grows, the hash
    doesn't move).

    Exactness: rate = w/w_max is one correctly-rounded double division of
    exact integers; ``rate * 2^32`` multiplies by a power of two (exponent
    shift — exact); ``floor`` then hex-formatting are integer-exact. Any
    ANSI engine reproduces the verdict bit-for-bit. A zero-weight row is
    never kept; a max-weight row misses only the single hash 'ffffffff'
    (the lpad cap — rate-1.0 strata in ``stratified_sample`` accept the
    same 2^-32 haircut).
    """
    wmax = df.agg(F.max(weight_col).alias("_w_max"))
    rate = F.col(weight_col).cast("double") / F.col("_w_max").cast("double")
    threshold = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.floor(rate * F.lit(float(2**32))).cast("long"),
                    F.lit(2**32 - 1),
                )
            )
        ),
        8,
        "0",
    )
    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )
    return (
        df.crossJoin(F.broadcast(wmax))
        .withColumn("sample_key", key)
        .filter(F.col("sample_key") < threshold)
        .drop("_w_max")
    )
