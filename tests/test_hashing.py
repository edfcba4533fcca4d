"""Unit tests for the vectorized hashing kernels (SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
import pytest

from facematch_spark.functions import hashing as H


def naive_char_shingles(data: bytes, k: int) -> set[bytes]:
    return {data[i : i + k] for i in range(len(data) - k + 1)}


def test_char_shingle_count_matches_naive():
    data = b"the quick brown fox jumps over the lazy dog the quick brown fox"
    for k in (3, 5, 9):
        got = H.char_shingle_hashes(data, k)
        assert len(got) == len(naive_char_shingles(data, k))


def test_char_shingles_deterministic():
    data = b"def foo(bar):\n    return bar * 2\n"
    a = H.char_shingle_hashes(data, 9)
    b = H.char_shingle_hashes(data, 9)
    assert np.array_equal(a, b)


def test_char_shingles_set_semantics():
    # repeated content adds no new shingles beyond the junction region
    once = H.char_shingle_hashes(b"abcabcabc", 3)
    # distinct 3-grams of 'abcabcabc': abc, bca, cab → 3
    assert once.size == 3


def test_shorter_than_k_empty():
    assert H.char_shingle_hashes(b"ab", 9).size == 0
    assert H.token_shingle_hashes([b"a", b"b"], 5).size == 0


def test_minhash_estimates_jaccard():
    """Property: |estimate - exact| bounded by O(1/sqrt(num_perm))."""
    rng = np.random.default_rng(7)
    universe = rng.integers(0, 2**63, size=2000, dtype=np.uint64)
    a = universe[:1200]
    b = universe[600:1800]  # overlap 600, union 1800 → J = 1/3
    exact = 600 / 1800
    gammas = H.perm_gammas(256, seed=42)
    sa = H.minhash_signature(np.unique(a), gammas)
    sb = H.minhash_signature(np.unique(b), gammas)
    est = float((sa == sb).mean())
    assert abs(est - exact) < 3.5 / np.sqrt(256)  # ~3.5 sigma


def test_minhash_identical_sets_equal_sigs():
    g = H.perm_gammas(64, seed=1)
    s = np.unique(np.arange(100, dtype=np.uint64) * np.uint64(2654435761))
    assert np.array_equal(H.minhash_signature(s, g), H.minhash_signature(s.copy(), g))


def test_minhash_chunking_invariant():
    g = H.perm_gammas(32, seed=5)
    s = np.unique(np.random.default_rng(0).integers(0, 2**63, 20000, dtype=np.uint64))
    full = H.minhash_signature(s, g)
    # order of shingles must not matter (min is commutative)
    shuffled = s.copy()
    np.random.default_rng(1).shuffle(shuffled)
    assert np.array_equal(full, H.minhash_signature(shuffled, g))


def test_simhash_hamming_monotone_under_small_edit():
    """A small edit moves few shingles ⇒ small Hamming distance; disjoint
    sets ⇒ large distance (on average)."""
    rng = np.random.default_rng(3)
    base = np.unique(rng.integers(0, 2**63, 500, dtype=np.uint64))
    near = base.copy()
    near[:10] = rng.integers(0, 2**63, 10, dtype=np.uint64)  # ~2% churn
    far = np.unique(rng.integers(0, 2**63, 500, dtype=np.uint64))
    fp = H.simhash_fingerprint
    d_near = bin(fp(base) ^ fp(np.unique(near))).count("1")
    d_far = bin(fp(base) ^ fp(far)).count("1")
    assert d_near < d_far
    assert d_near <= 8


def test_band_math_validation():
    from facematch_spark.config import DedupeConfig

    with pytest.raises(ValueError):
        DedupeConfig(num_perm=128, bands=30, rows_per_band=4)
    cfg = DedupeConfig()
    assert cfg.bands * cfg.rows_per_band == cfg.num_perm


def test_band_hashes_shape_and_determinism():
    g = H.perm_gammas(128, seed=42)
    s = np.unique(np.random.default_rng(2).integers(0, 2**63, 300, dtype=np.uint64))
    sig = H.minhash_signature(s, g)
    b1 = H.band_hashes(sig, 32, 4, seed=42)
    b2 = H.band_hashes(sig, 32, 4, seed=42)
    assert b1.shape == (32,)
    assert np.array_equal(b1, b2)
    # different seed ⇒ different band hashes
    b3 = H.band_hashes(sig, 32, 4, seed=43)
    assert not np.array_equal(b1, b3)


def test_config_hash_stability_and_sensitivity():
    from facematch_spark.config import DedupeConfig

    assert DedupeConfig().config_hash == DedupeConfig().config_hash
    assert DedupeConfig().config_hash != DedupeConfig(seed=7).config_hash


def test_token_shingles_basic():
    toks = "the quick brown fox the quick brown fox".encode().split()
    got = H.token_shingle_hashes(toks, 3)
    # distinct 3-gram token windows: (the,quick,brown) (quick,brown,fox)
    # (brown,fox,the) (fox,the,quick) → 4
    assert got.size == 4
    again = H.token_shingle_hashes(toks, 3)
    assert np.array_equal(got, again)


def test_token_vs_char_config_paths():
    from facematch_spark.config import DedupeConfig
    from facematch_spark.operators.signatures import shingle_hashes_for

    text = "def alpha(beta):\n    return beta * gamma\n" * 3
    ch = shingle_hashes_for(text, DedupeConfig(shingle_kind="char", k=9))
    tk = shingle_hashes_for(
        text, DedupeConfig(shingle_kind="token", k=3, num_perm=64, bands=16, rows_per_band=4)
    )
    assert ch.size > 0 and tk.size > 0
    assert not np.array_equal(np.sort(ch)[: min(ch.size, tk.size)], np.sort(tk)[: min(ch.size, tk.size)])
