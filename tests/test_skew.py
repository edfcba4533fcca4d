"""Skew-handling tests (SURVEY.md §5.5): a corpus where one shingle (a
license-header paragraph) appears in 50% of rows creates hot LSH bands; the
pipeline must complete, the salted triangle join must produce exactly the
same pair set as the plain join, and the max_band_group drop must be the only
recall loss."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facematch_spark import schema as S
from facematch_spark.config import DedupeConfig
from facematch_spark.fixtures import corpus_to_pandas, generate_corpus
from facematch_spark.operators import lsh as L
from facematch_spark.operators import signatures as SIG


@pytest.fixture(scope="module")
def skew_df(spark):
    corpus = generate_corpus(n_base=60, seed=11, skew=True, edge_rows=False)
    return spark.createDataFrame(corpus_to_pandas(corpus), schema=S.SOURCE_FILES).localCheckpoint()


def test_salted_join_equals_plain_join(spark, skew_df):
    """Forcing the salting path (hot_band_cap=2) must not change the
    candidate pair set vs the plain path (cap high enough that nothing is
    salted) — salting is a physical rewrite, not a semantic one."""
    base = dict(jaccard_threshold=0.5, max_band_group=100_000)
    cfg_plain = DedupeConfig(hot_band_cap=100_000, **base)
    cfg_salted = DedupeConfig(hot_band_cap=2, salt_buckets=4, **base)
    sigs = SIG.sign_documents(skew_df, cfg_plain).localCheckpoint()

    plain = {(r.id_a, r.id_b) for r in L.candidate_pairs(sigs, cfg_plain).collect()}
    salted = {(r.id_a, r.id_b) for r in L.candidate_pairs(sigs, cfg_salted).collect()}
    assert plain == salted
    assert plain, "skew fixture must produce candidates"


def test_max_band_group_drop_bounds_pairs(spark, skew_df):
    """With a tiny max_band_group, hot boilerplate bands are dropped from
    candidate generation; output must shrink (bounded work) but planted
    exact dups must survive through their other, non-boilerplate bands."""
    cfg_all = DedupeConfig(jaccard_threshold=0.5, hot_band_cap=4, max_band_group=100_000)
    cfg_cap = DedupeConfig(jaccard_threshold=0.5, hot_band_cap=4, max_band_group=8)
    sigs = SIG.sign_documents(skew_df, cfg_all).localCheckpoint()

    full = L.candidate_pairs(sigs, cfg_all)
    capped = L.candidate_pairs(sigs, cfg_cap)
    n_full, n_capped = full.count(), capped.count()
    assert n_capped <= n_full

    # exact duplicates collide in EVERY band, so even aggressive caps keep
    # them unless all 32 of their bands are hot — check via minhash equality
    exact_sig_pairs = (
        sigs.alias("x")
        .join(sigs.alias("y"), F.col("x.file_id") < F.col("y.file_id"))
        .filter((F.col("x.status") == "ok") & (F.col("y.status") == "ok"))
        .filter(F.col("x.sha256") == F.col("y.sha256"))
        .select(F.col("x.file_id").alias("id_a"), F.col("y.file_id").alias("id_b"))
    )
    missed = exact_sig_pairs.join(capped, ["id_a", "id_b"], "left_anti").count()
    assert missed == 0


def test_size_derived_partitioning_is_lossless(spark):
    """r6: passing n_rows/n_build derives the key-exchange partition count
    (bounding the un-spillable shuffled-hash builds at scale — see
    SCALE_r06.md) without changing a single output pair, and the derived
    count lands in the physical plan."""
    import io
    from contextlib import redirect_stdout

    rows = spark.range(400).select(
        (F.col("id") % 20).alias("k"), F.col("id").alias("fid")
    )
    base = L.tiered_self_join(rows, keys=["k"], id_col="fid", cap=50, salt_buckets=4)
    forced = L.tiered_self_join(
        rows, keys=["k"], id_col="fid", cap=50, salt_buckets=4, n_rows=50_000_000
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, forced.collect()))

    expect = max(
        spark.sparkContext.defaultParallelism,
        50_000_000 // L.TIER_ROWS_PER_PARTITION + 1,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        forced.explain()
    assert f", {expect})" in buf.getvalue()  # hashpartitioning(k, <derived>)

    probes = spark.range(300).select((F.col("id") % 15).alias("k"), F.col("id").alias("q"))
    build = spark.range(300).select((F.col("id") % 15).alias("k"), F.col("id").alias("b"))
    p_base = L.salted_probe_join(
        probes, build, keys=["k"], left_id="q", right_id="b", cap=10, salt_buckets=4
    )
    p_forced = L.salted_probe_join(
        probes, build, keys=["k"], left_id="q", right_id="b", cap=10,
        salt_buckets=4, n_build=50_000_000,
    )
    assert sorted(map(tuple, p_base.collect())) == sorted(map(tuple, p_forced.collect()))
