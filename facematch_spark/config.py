"""Frozen run configuration.

The reference keys all on-disk state by ``(model_name, detector_backend)``
(``utils.py:56-59``: ``_{prefix}_{model}_{backend}.json``) so runs at
different configs coexist. Here the analog is a frozen dataclass whose
``config_hash`` keys checkpoint tables; validation mirrors the reference's
model/backend compatibility gate (``__main__.py:61-71``) — fail fast on the
driver before any job is launched.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupeConfig:
    # --- shingling ---
    shingle_kind: str = "char"  # "char" | "token"
    k: int = 9                  # k-gram size (chars or tokens)
    normalize: bool = True      # lowercase + collapse whitespace before shingling
    # --- MinHash ---
    num_perm: int = 128
    bands: int = 32
    rows_per_band: int = 4
    # --- thresholds (reference defaults: dedupe/report threshold 0.4,
    #     __main__.py:162-166; ours default to the FIXTURES.md config) ---
    jaccard_threshold: float = 0.8
    report_threshold: float = 0.8
    simhash_hamming_max: int = 3
    # --- containment (suffix path) ---
    containment_threshold: float = 0.95
    # --- skew handling ---
    hot_band_cap: int = 200      # band groups larger than this are salted
    max_band_group: int = 5000   # band groups larger than this are dropped (recall-documented)
    salt_buckets: int = 16
    # --- status taxonomy ---
    max_content_bytes: int = 1 << 20
    # --- determinism ---
    seed: int = 42
    # --- misc ---
    edges: int = 10              # top/bottom-K edges in reports (utils.py:270-298)

    def __post_init__(self) -> None:
        if self.shingle_kind not in ("char", "token"):
            raise ValueError(f"shingle_kind must be char|token, got {self.shingle_kind}")
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if self.bands * self.rows_per_band != self.num_perm:
            # analog of validate_model_backend abort + suggest_backend hint
            # (__main__.py:56-71): fail fast, and tell the user a valid
            # nearby config instead of just rejecting
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal num_perm ({self.num_perm}); "
                f"valid (bands, rows_per_band) for num_perm={self.num_perm}: "
                f"{suggest_band_configs(self.num_perm)}"
            )
        if not (0.0 <= self.jaccard_threshold <= 1.0):
            raise ValueError("jaccard_threshold must be in [0,1]")
        if not (0 <= self.simhash_hamming_max <= 64):
            raise ValueError("simhash_hamming_max must be in [0,64]")

    @property
    def config_hash(self) -> str:
        """Stable 12-hex-char key for checkpoint table naming (the analog of
        the reference's config-suffixed file names, utils.py:56-59).

        ``kernel_version`` is folded in alongside the user-visible fields:
        the hash functions behind MinHash/SimHash signatures are part of the
        config's identity. Without it, changing the signature kernel (as
        round 2 did, xor-mix64 → u32 multiply-add) leaves old checkpoints
        keyed identically, and an incremental resume silently merges
        old-family and new-family signatures — cross-boundary minhash
        estimates compare unrelated hash families and near-dup pairs across
        the boundary vanish. Bump ``functions.hashing.KERNEL_VERSION``
        whenever any signature kernel changes observable output."""
        from facematch_spark.functions.hashing import KERNEL_VERSION

        payload = json.dumps(
            {**asdict(self), "kernel_version": KERNEL_VERSION}, sort_keys=True
        ).encode()
        return hashlib.sha256(payload).hexdigest()[:12]

    def table_suffix(self) -> str:
        return f"k{self.k}_p{self.num_perm}_b{self.bands}_{self.config_hash}"


def suggest_band_configs(num_perm: int, limit: int = 5) -> list[tuple[int, int]]:
    """Valid (bands, rows_per_band) factorizations of ``num_perm``, most
    selective first (small rows_per_band → higher recall). The analog of the
    reference's ``suggest_backend`` (``__main__.py:56-59``): when a config is
    rejected, say what WOULD work."""
    out = [(num_perm // r, r) for r in range(1, num_perm + 1) if num_perm % r == 0]
    return out[:limit]
