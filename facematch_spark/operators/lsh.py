"""LSH band candidate generation.

Replaces the reference's core operator — the O(N^2) all-pairs nested loop
(``dedupe_images``, ``utils.py:228-246``, every worker holding the full
encodings dict ``__main__.py:112-116`` / ``tasks.py:88``) — with banding LSH:

    minhash signature → ``bands`` band hashes → explode → self equi-join on
    (band_id, band_hash) with ``id_a < id_b`` → distinct pairs.

Two documents with Jaccard j collide in ≥1 band with probability
``1 - (1 - j^r)^b`` — at (b=32, r=4), j=0.8 collides w.p. ~0.9999998, which is
where the ≥0.99 recall target comes from.

Scale notes (the part the reference cannot do at all):
  * the join is a shuffle hash/sort-merge equi-join on band_hash — Catalyst
    picks; AQE skew-join is the backstop;
  * hot bands (boilerplate: license headers, empty ``__init__.py`` files)
    are handled explicitly BEFORE the join: band groups larger than
    ``max_band_group`` are dropped from candidate generation (their members
    are near-certainly caught by their other b-1 bands; standard in code
    dedup — recall impact documented in tests), groups above ``hot_band_cap``
    are exempted from nothing but counted in metrics. A group of size g emits
    g(g-1)/2 pairs — capping g caps the quadratic term.
  * pair canonicalization ``id_a < id_b`` replaces the reference's
    seen-set bookkeeping (``utils.py:237-240``) and md5 pair keys
    (``utils.py:267-268``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from facematch_spark.config import DedupeConfig
from facematch_spark.functions import hashing as H

# Rows per partition for the tiered/probe joins' key exchanges when the
# caller supplies the build relation's row count: 500k narrow (key, id) rows
# ≈ 50 MB of hashed-relation footprint per build — ~1.6 GB in flight with 32
# concurrent tasks, bounded at any corpus size. The un-spillable shuffled-
# hash build is the constraint (guide §3.1); the explicit partition count
# also stops AQE's byte-based coalescing from merging build partitions past
# the memory bound (observed at 1M vectors: 96 MB build exchange coalesced
# to ~2 partitions → build OOM).
TIER_ROWS_PER_PARTITION = 500_000


def band_explode(signatures: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """signatures → (file_id, band_id, band_hash), one row per band.

    Band hashes are computed in the same NumPy kernel family as the
    signatures (vectorized mapInPandas); only ``status == 'ok'`` rows enter
    (error-row filter applied ONCE, vs the reference re-checking inside the
    N^2 loop, ``utils.py:231-242``).
    """
    bands, rows_per_band, seed = cfg.bands, cfg.rows_per_band, cfg.seed

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        band_ids = np.arange(bands, dtype=np.int32)
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"file_id": pd.Series(dtype="int64"),
                     "band_id": pd.Series(dtype="int32"),
                     "band_hash": pd.Series(dtype="int64")}
                )
                continue
            sigs = np.stack([np.asarray(s, dtype=np.int64) for s in pdf["minhash"]]).view(np.uint64)
            bh = np.empty((n, bands), dtype=np.uint64)
            for i in range(n):
                bh[i] = H.band_hashes(sigs[i], bands, rows_per_band, seed)
            yield pd.DataFrame(
                {
                    "file_id": np.repeat(pdf["file_id"].to_numpy(), bands),
                    "band_id": np.tile(band_ids, n),
                    "band_hash": bh.reshape(-1).view(np.int64),
                }
            )

    ok = signatures.filter(F.col("status") == "ok").select("file_id", "minhash")
    return ok.mapInPandas(batches, schema="file_id long, band_id int, band_hash long")


def candidate_pairs(signatures: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """LSH candidate pair generation → (id_a, id_b) distinct, id_a < id_b.

    Skew handling (north rule: salt hot bands, repartition by band-hash key,
    spill-safe shuffle) is explicit and size-tiered via
    ``groupBy(band_id, band_hash).count()``:

      * g == 1           → dropped (no pair can come from a singleton group);
      * 1 < g ≤ cap      → plain self equi-join on (band_id, band_hash). The
                           join's hash exchange IS the band-hash repartition —
                           adding a manual ``repartition`` would only double
                           the shuffle;
      * cap < g ≤ max    → **salted triangle join**: members get a bucket
                           ``b = xxhash64(file_id) % s``; the left side is
                           replicated to every bucket ≥ its own, the right
                           side keeps its bucket, and the join key becomes
                           (band, left_replica_bucket == right_bucket). Every
                           unordered pair lands on exactly one reducer and no
                           reducer sees more than (g/s)² work — the standard
                           blocked self-join for skewed keys;
      * g > max          → dropped from candidate generation entirely
                           (boilerplate bands — license headers, empty
                           ``__init__`` files; members are near-certainly
                           co-candidates through their other b-1 bands; recall
                           impact is measured in tests/test_skew.py).

    AQE's skew-join split remains on as a backstop for residual imbalance.
    """
    # materialize the band relation once: it feeds both the group-size
    # aggregation and the self-join; without the cut the mapInPandas
    # band-hash kernel would execute twice (round-1 profiling showed the
    # double pass as a fixed ~2x cost on the candidate stage)
    bands_df = band_explode(signatures, cfg).localCheckpoint()
    return tiered_self_join(
        bands_df,
        keys=["band_id", "band_hash"],
        id_col="file_id",
        cap=cfg.hot_band_cap,
        salt_buckets=cfg.salt_buckets,
        drop_above=cfg.max_band_group,
        n_rows=bands_df.count(),  # pinned: the count is a block-manager scan
    )


def tiered_self_join(
    rows: DataFrame,
    keys: list[str],
    id_col: str,
    cap: int,
    salt_buckets: int,
    drop_above: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Size-tiered self equi-join on ``keys`` → distinct canonical pairs
    ``(id_a, id_b)`` with ``id_a < id_b``. The shared skew machinery for
    every bucketed candidate generator (MinHash bands, SimHash chunks, ANN
    hyperplane buckets):

      * g == 1                → dropped (no pair from a singleton group);
      * 1 < g ≤ cap           → plain self equi-join on ``keys``;
      * cap < g (≤ drop_above)→ salted triangle join: members get bucket
                                ``b = xxhash64(id) % s``, the left side is
                                replicated to buckets ≥ its own, the right
                                keeps its bucket — every unordered pair lands
                                on exactly one reducer, no reducer sees more
                                than (g/s)² work. LOSSLESS — same pairs as
                                the plain join;
      * g > drop_above        → dropped entirely (only when ``drop_above``
                                is set; callers with an exactness guarantee —
                                SimHash pigeonhole — pass ``None``).

    Group sizes are computed with a window count over ``keys`` rather than a
    ``groupBy`` + self-join: the window shuffles the row relation ONCE (the
    same hash exchange the self-join needs anyway, so the join below reuses
    it), where the groupBy form exchanged the rows for the aggregation and
    then again for the size join — two extra full passes of the widest
    relation in the job through shuffle storage. Semantics are identical
    (``count(*) over (partition by keys)`` ≡ joined groupBy count).

    ``n_rows`` (optional; callers holding a pinned relation pass its count)
    SIZE-DERIVES the key exchange's partition count instead of taking the
    session constant: the normal tier's shuffled-hash build cannot spill
    (guide §3.1 risk — the analogous PPJoin prefix build OOM'd at 60M rows
    on cores-count partitions, caught by tools/scale_fallback_probe.py),
    so rows-per-partition is bounded at ``TIER_ROWS_PER_PARTITION``; the
    window and both join sides reuse the one explicit exchange.
    """
    from pyspark.sql.window import Window

    if n_rows is not None:
        parts = max(
            rows.sparkSession.sparkContext.defaultParallelism,
            int(n_rows // TIER_ROWS_PER_PARTITION) + 1,
        )
        rows = rows.repartition(parts, *keys)
    sized = rows.withColumn("g", F.count(F.lit(1)).over(Window.partitionBy(*keys)))

    normal = sized.filter((F.col("g") > 1) & (F.col("g") <= cap)).drop("g")
    hot_cond = F.col("g") > cap
    if drop_above is not None:
        hot_cond = hot_cond & (F.col("g") <= drop_above)
    hot = sized.filter(hot_cond).drop("g")

    # shuffled-hash (guide §3.1): both sides arrive already hash-partitioned
    # by ``keys`` from the window count's exchange, so the hint only swaps
    # the per-partition sort-merge for a hash build — no sort of the band
    # relation on either side.
    a = normal.alias("a")
    b = normal.alias("b").hint("shuffle_hash")
    on = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
    normal_pairs = a.join(
        b, on=[*on, F.col(f"a.{id_col}") < F.col(f"b.{id_col}")]
    ).select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))

    s = salt_buckets
    hot_b = hot.withColumn("bkt", F.pmod(F.xxhash64(id_col), F.lit(s)))
    hot_a = hot_b.withColumn("rep", F.explode(F.sequence(F.col("bkt"), F.lit(s - 1))))
    ha, hb = hot_a.alias("ha"), hot_b.alias("hb")
    on_hot = [F.col(f"ha.{k}") == F.col(f"hb.{k}") for k in keys]
    hot_pairs = (
        ha.join(
            hb,
            on=[
                *on_hot,
                F.col("ha.rep") == F.col("hb.bkt"),
                F.col(f"ha.{id_col}") != F.col(f"hb.{id_col}"),
            ],
        )
        .select(
            F.least(F.col(f"ha.{id_col}"), F.col(f"hb.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"ha.{id_col}"), F.col(f"hb.{id_col}")).alias("id_b"),
        )
    )

    return normal_pairs.unionByName(hot_pairs).dropDuplicates(["id_a", "id_b"])


def salted_probe_join(
    probes: DataFrame,
    build: DataFrame,
    keys: list[str],
    left_id: str,
    right_id: str,
    cap: int,
    salt_buckets: int,
    n_build: int | None = None,
) -> DataFrame:
    """Skew-safe ASYMMETRIC equi-join on ``keys`` → ``(left_id, right_id)``
    rows — the probe→build sibling of ``tiered_self_join`` for candidate
    generators whose two sides differ (multi-probe ANN queries probing home
    buckets, containment probes against a gram relation). Build-side groups
    above ``cap`` are salted: build rows get ``bkt = xxhash64(right_id) % s``
    and each probe row replicates across all s buckets, so no reducer sees
    more than g/s build rows per probe — LOSSLESS (same rows as the plain
    join; verified in tests/test_skew.py)."""
    sizes = build.groupBy(*keys).agg(F.count("*").alias("g"))
    build_sized = build.join(sizes, keys)
    probes_sized = probes.join(sizes, keys)  # inner: probes w/o build rows can't match anyway

    # The candidate joins pin SHUFFLE_HASH on the build side (guide §3.1):
    # the build⋈sizes relation is O(corpus) rows but its size ESTIMATE after
    # the aggregate join is unreliable — at 1M vectors the auto plan chose
    # BroadcastHashJoin over the ~1 GB relation and aborted on
    # spark.driver.maxResultSize (tools/scale_fallback_probe.py run E).
    # The (small, O(distinct keys)) `sizes` relation stays auto-planned:
    # its broadcast is what lets the big probe side stream un-shuffled.
    normal_p = probes_sized.filter(F.col("g") <= cap).drop("g")
    normal_b = build_sized.filter(F.col("g") <= cap).drop("g")
    # ``n_build`` (callers holding a pinned build relation pass its count)
    # SIZE-DERIVES the join partitioning so the un-spillable hash build
    # stays bounded per task (same pattern as tiered_self_join / the PPJoin
    # prefix join; the run-E failure sequence was auto-broadcast abort →
    # hint-only SHJ build OOM → this). Explicit partition counts also stop
    # AQE from coalescing the build exchange past the build's memory bound.
    if n_build is not None:
        parts = max(
            build.sparkSession.sparkContext.defaultParallelism,
            int(n_build // TIER_ROWS_PER_PARTITION) + 1,
        )
        normal_p = normal_p.repartition(parts, *keys)
        normal_b = normal_b.repartition(parts, *keys)
    normal = normal_p.join(normal_b.hint("shuffle_hash"), keys).select(left_id, right_id)

    s = salt_buckets
    hot_b = build_sized.filter(F.col("g") > cap).drop("g").withColumn(
        "bkt", F.pmod(F.xxhash64(right_id), F.lit(s))
    )
    hot_p = probes_sized.filter(F.col("g") > cap).drop("g").withColumn(
        "bkt", F.explode(F.sequence(F.lit(0), F.lit(s - 1)))
    )
    if n_build is not None:
        hot_p = hot_p.repartition(parts, *keys, "bkt")
        hot_b = hot_b.repartition(parts, *keys, "bkt")
    hot = hot_p.join(hot_b.hint("shuffle_hash"), [*keys, "bkt"]).select(left_id, right_id)
    return normal.unionByName(hot)


def crossjoin_pairs(signatures: DataFrame) -> DataFrame:
    """O(N^2) all-pairs fallback — the faithful analog of the reference's
    nested loop (``utils.py:228-246``), kept for tiny inputs and as the
    recall oracle in tests. Never use at scale."""
    ok = signatures.filter(F.col("status") == "ok").select("file_id")
    a, b = ok.alias("a"), ok.alias("b")
    return a.join(b, F.col("a.file_id") < F.col("b.file_id")).select(
        F.col("a.file_id").alias("id_a"), F.col("b.file_id").alias("id_b")
    )
