"""End-to-end pipeline tests: signature stage, LSH recall vs exact oracle,
clustering, silenced suppression, sha256 invariant (SURVEY.md §5.1-5.2)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from facematch_spark import schema as S
from facematch_spark.config import DedupeConfig
from facematch_spark.operators import lsh as L
from facematch_spark.operators import signatures as SIG
from facematch_spark.operators import verify as V
from facematch_spark.operators.cluster import connected_components
from facematch_spark.plans.pipeline import run_dedupe

CFG = DedupeConfig(jaccard_threshold=0.5, hot_band_cap=200, max_band_group=5000)


@pytest.fixture(scope="module")
def sigs(spark, tiny_df):
    return SIG.sign_documents(tiny_df, CFG).localCheckpoint()


def test_signature_schema_and_status(sigs):
    assert sigs.schema == S.SIGNATURES
    statuses = {r["status"] for r in sigs.select("status").distinct().collect()}
    assert statuses <= set(S.ALL_STATUSES)
    # edge rows from the fixture must land in non-ok statuses, never crash
    assert sigs.filter(F.col("status") == S.STATUS_EMPTY).count() >= 2  # "" and whitespace-only
    assert sigs.filter(F.col("status") == S.STATUS_TOO_LARGE).count() == 1
    assert sigs.filter(F.col("status") == S.STATUS_NON_TEXT).count() == 1
    # error rows have null signatures; ok rows have full-length ones
    assert sigs.filter((F.col("status") != "ok") & F.col("minhash").isNotNull()).count() == 0
    bad = sigs.filter((F.col("status") == "ok") & (F.size("minhash") != CFG.num_perm)).count()
    assert bad == 0


def test_sha256_invariant_vs_input(sigs, tiny_corpus):
    """Per-row invariant (BASELINE.json input_hint): sha256(content) in the
    signatures table equals a driver-side recomputation from the raw input."""
    expected = {
        (r["repo"], r["path"], r["commit"]): hashlib.sha256(r["content"].encode()).hexdigest()
        for r in tiny_corpus.rows
    }
    got = sigs.select("repo", "path", "commit", "sha256").collect()
    assert len(got) == len(expected)
    for row in got:
        assert expected[(row["repo"], row["path"], row["commit"])] == row["sha256"]


def test_signature_determinism(spark, tiny_df, sigs):
    again = SIG.sign_documents(tiny_df, CFG)
    a = sorted(sigs.select("file_id", "sha256", "simhash", "minhash").collect())
    b = sorted(again.select("file_id", "sha256", "simhash", "minhash").collect())
    assert a == b


def exact_pairs(spark, df, cfg, threshold):
    """O(N^2)-equivalent exact-Jaccard oracle via shingle join (no LSH)."""
    sh = SIG.explode_shingles(df, cfg)
    card = sh.groupBy("file_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.file_id") < F.col("b.file_id"))
        .groupBy(F.col("a.file_id").alias("id_a"), F.col("b.file_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    ca = card.select(F.col("file_id").alias("id_a"), F.col("n").alias("na"))
    cb = card.select(F.col("file_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def test_lsh_recall_vs_exact_oracle(spark, tiny_df, sigs):
    """Recall gate (north rule ≥ 0.99): every exact-Jaccard-≥-t pair must be
    produced by the LSH path. At (b=32, r=4), t=0.5 collision prob is ~0.87
    per theory — but planted dups sit at J≥0.8 where it's ≈1; we assert
    recall on the full exact set and expect 100% on this fixture."""
    oracle = {(r.id_a, r.id_b) for r in exact_pairs(spark, tiny_df, CFG, CFG.jaccard_threshold).collect()}
    assert oracle, "fixture must contain planted dup pairs"
    cands = L.candidate_pairs(sigs, CFG)
    shingles = SIG.explode_shingles(tiny_df, CFG)
    verified = V.verify_candidates(cands, sigs, shingles, CFG)
    got = {
        (r.id_a, r.id_b)
        for r in verified.filter(F.col("jaccard") >= CFG.jaccard_threshold).collect()
    }
    recall = len(oracle & got) / len(oracle)
    assert recall >= 0.99, f"recall {recall} on {len(oracle)} oracle pairs"
    # precision of the jaccard-verified set is exact by construction
    assert got <= oracle


def test_verified_metrics_consistency(spark, tiny_df, sigs):
    cands = L.candidate_pairs(sigs, CFG)
    shingles = SIG.explode_shingles(tiny_df, CFG)
    verified = V.verify_candidates(cands, sigs, shingles, CFG).collect()
    for r in verified:
        assert r.id_a < r.id_b
        assert 0.0 <= r.jaccard <= 1.0
        assert 0 <= r.hamming <= 64
        assert r.containment >= r.jaccard - 1e-12  # containment ≥ jaccard always
        # minhash estimate within statistical bounds of exact jaccard
        assert abs(r.minhash_est - r.jaccard) < 4.0 / (CFG.num_perm ** 0.5) + 0.05


def test_containment_pair_found(spark, tiny_df, sigs, tiny_corpus):
    """Planted containment dups (file embedded verbatim in a larger one) must
    surface via the containment metric even when Jaccard is below threshold."""
    cands = L.candidate_pairs(sigs, CFG)
    shingles = SIG.explode_shingles(tiny_df, CFG)
    verified = V.verify_candidates(cands, sigs, shingles, CFG)
    by_contain = verified.filter(F.col("containment") >= CFG.containment_threshold).count()
    assert by_contain >= 1


def test_clusters_known_graphs(spark):
    """Union-find on known graphs: chain, star, two components, self-loop —
    on every execution tier (driver fast path + both distributed
    algorithms)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain 1-2-3-4
         (10, 11), (10, 12), (10, 13),  # star at 10
         (20, 21),                      # separate component
         (30, 30)],                     # self-loop
        "id_a long, id_b long",
    )
    expect = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20),
        (30, 30),
    }
    for kwargs in (
        {},  # driver fast path
        {"driver_threshold": 0, "algorithm": "propagate"},
        {"driver_threshold": 0, "algorithm": "star"},
    ):
        got = {(r.file_id, r.cluster_id) for r in connected_components(edges, **kwargs).collect()}
        assert got == expect, f"tier {kwargs}"


def test_clusters_star_algorithm_matches(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)] + [(100, 101), (102, 101)],
        "id_a long, id_b long",
    )
    a = sorted(connected_components(edges, driver_threshold=0, algorithm="propagate").collect())
    b = sorted(connected_components(edges, driver_threshold=0, algorithm="star").collect())
    c = sorted(connected_components(edges).collect())
    assert a == b == c


def test_end_to_end_planted_recall(spark, tiny_df, tiny_corpus):
    """Full pipeline: all planted exact-dup pairs must land in one cluster."""
    res = run_dedupe(spark, tiny_df, CFG)
    labels = {r.file_id: r.cluster_id for r in res.clusters.collect()}
    sigs = res.signatures.select("repo", "path", "commit", "file_id").collect()
    key_to_id = {(r.repo, r.path, r.commit): r.file_id for r in sigs}
    missed = 0
    total = 0
    for gp in tiny_corpus.golden_pairs:
        if gp["kind"] != "exact":
            continue
        ia = key_to_id[tiny_corpus.row_key(gp["ia"])]
        ib = key_to_id[tiny_corpus.row_key(gp["ib"])]
        total += 1
        if labels.get(ia) != labels.get(ib):
            missed += 1
    assert total > 0
    assert missed == 0, f"{missed}/{total} exact-dup pairs not co-clustered"


def test_silenced_pairs_suppressed(spark, tiny_df, sigs, tiny_corpus):
    """The reference reads silenced pairs but never consults them
    (utils.py:111-115); we actually anti-join them out."""
    cands = L.candidate_pairs(sigs, CFG)
    shingles = SIG.explode_shingles(tiny_df, CFG)
    verified = V.verify_candidates(cands, sigs, shingles, CFG).localCheckpoint()
    some = verified.limit(2).select("id_a", "id_b")
    remaining = V.apply_silenced(verified, some)
    assert remaining.count() == verified.count() - some.count()
    assert remaining.join(some, ["id_a", "id_b"], "left_semi").count() == 0
