"""Candidate verification: exact Jaccard / Hamming / containment.

Replaces the reference's per-pair ``DeepFace.verify`` call + threshold
(``utils.py:243-246``). Three verification signals:

  * ``minhash_est`` — estimated Jaccard = fraction of equal signature
    positions. Computed JVM-side with ``zip_with`` + ``filter``+``size`` —
    stays in whole-stage codegen, no Python.
  * ``hamming`` — SimHash bit distance, ``bit_count(simhash_a ^ simhash_b)``,
    pure SQL.
  * ``jaccard`` / ``containment`` — exact values over the distinct shingle
    sets, via a distributed shingle equi-join (no content re-reads, no
    stored shingle arrays in the signatures table). ``containment`` is
    ``|A∩B| / min(|A|,|B|)`` — 1.0 when the smaller file's shingles are a
    subset of the larger's (the "file embedded verbatim in a bigger file"
    case). Borderline containment candidates can be settled exactly with the
    suffix-automaton longest-common-substring check (``lcs_coverage``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from facematch_spark.config import DedupeConfig
from facematch_spark.telemetry import mark, start


# Candidate volume under which the distinct candidate-id set is broadcast to
# semi-join the signature relation down to participating files before the two
# metric joins. 2M pairs → ≤4M distinct ids ≈ 32 MB broadcast — the same
# order as the ngram broadcast tier (dedup.py) and ANN corpus gate
# (similarity.py). Past it the reduction is skipped: at 10^12-file scale the
# id set no longer fits a broadcast and the full-shuffle joins below are the
# scale-correct plan.
ATTACH_BROADCAST_IDS_MAX = 2_000_000

# Candidate volume under which the semi-reduced SIGNATURE relation itself is
# broadcast into both metric joins (not just the id set): ≤ 25k pairs →
# ≤ 50k signature rows × ~1.1 KB of minhash array ≈ 55 MB — the same order
# as the session's 64 MB autoBroadcastJoinThreshold. Past it the relation's
# array payload outgrows a broadcast and the shuffled-hash joins below are
# the scale-correct plan.
ATTACH_BROADCAST_SIGS_MAX_PAIRS = 25_000


def attach_signature_metrics(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """(id_a, id_b) + signatures → + minhash_est + hamming. JVM-only.

    Join strategy is size-tiered: BROADCAST of the semi-reduced signature
    relation when the candidate set is small enough to bound it (see
    ``ATTACH_BROADCAST_SIGS_MAX_PAIRS``), SHUFFLE_HASH past the gate — the
    joined rows carry the num_perm-long minhash arrays (~1 KB/row), and a
    sort-merge join would SORT the candidate side with those arrays
    attached — a multi-GB spill at 10M+ candidates. Hash join builds on
    the (much smaller) signature relation and streams the candidates
    through unsorted.

    The signature relation is the heaviest thing this operator moves (~1 KB
    of minhash per row, shuffled TWICE — once per pair side). When the
    candidate set is small enough to enumerate (≤ ``ATTACH_BROADCAST_IDS_MAX``
    pairs), its distinct ids are broadcast and the signatures are left-semi
    reduced to participating files first — a shuffle-free cut that typically
    drops the array shuffle by the non-candidate fraction of the corpus.
    ``pairs`` is localCheckpointed here because it feeds the id enumeration
    and both metric joins; callers that already materialized it pay one
    cheap re-checkpoint of a KB-scale pair relation."""
    pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()
    sig = signatures.select("file_id", "minhash", "simhash")
    if n_pairs <= ATTACH_BROADCAST_IDS_MAX:
        ids = (
            pairs.select(F.col("id_a").alias("file_id"))
            .union(pairs.select(F.col("id_b").alias("file_id")))
            .distinct()
        )
        sig = sig.join(F.broadcast(ids), "file_id", "left_semi")
    if n_pairs <= ATTACH_BROADCAST_SIGS_MAX_PAIRS:
        # The semi-reduced signature relation has ≤ 2·n_pairs rows; under
        # this (much lower) gate it fits a broadcast outright, so BOTH
        # metric joins run map-side and the candidate relation never
        # crosses an exchange at all (guide §3.1; measured ~25% off the
        # headline dedupe_e2e wall at sf0.1). The gates are ordered: the
        # semi reduction above is what makes this relation enumerable.
        a = F.broadcast(sig.alias("sa"))
        b = F.broadcast(sig.alias("sb"))
    else:
        a = sig.alias("sa").hint("shuffle_hash")
        b = sig.alias("sb").hint("shuffle_hash")
    joined = (
        pairs.join(a, pairs.id_a == F.col("sa.file_id"))
        .join(b, pairs.id_b == F.col("sb.file_id"))
    )
    eq = F.size(
        F.filter(
            F.zip_with(F.col("sa.minhash"), F.col("sb.minhash"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return joined.select(
        "id_a",
        "id_b",
        (eq / F.size(F.col("sa.minhash"))).alias("minhash_est"),
        F.bit_count(F.col("sa.simhash").bitwiseXOR(F.col("sb.simhash"))).cast("int").alias("hamming"),
    )


def exact_overlap_metrics(
    pairs: DataFrame, shingles: DataFrame, walls: dict | None = None
) -> DataFrame:
    """Exact Jaccard + containment for candidate pairs via shingle equi-join.

    ``shingles`` is the exploded ``(file_id, shingle)`` relation (distinct).
    The intersection count is computed PER CANDIDATE PAIR: pairs pick up
    id_a's shingles, then equi-join on ``(id_b, shingle)`` — a row survives
    iff the shingle is in both docs, so the count per (id_a, id_b) is
    |A ∩ B|. Cost is Σ over pairs of |A| join rows, i.e. proportional to
    candidate volume × doc size — NOT to shingle co-occurrence. (The naive
    shingle self-join is a skew trap: a boilerplate shingle shared by f docs
    emits f²/2 join rows regardless of how many of those docs are candidate
    pairs.) Only shingles of candidate ids participate (semi-join pushdown).
    """
    # materialize both multi-consumer relations once: `pairs` feeds the id
    # projection, the intersection join and the final output join; the
    # semi-joined shingle relation feeds the cardinality agg and both sides
    # of the intersection join — without the cuts the upstream candidate /
    # explode DAGs would execute 2-3x
    t0 = start()
    pairs = pairs.localCheckpoint()
    t0 = mark(walls, "cand_s", t0)  # includes the whole upstream pairs DAG
    ids = pairs.select(F.col("id_a").alias("file_id")).union(
        pairs.select(F.col("id_b").alias("file_id"))
    ).distinct()
    sh = shingles.join(ids, "file_id", "left_semi").localCheckpoint()
    t0 = mark(walls, "shingle_semi_s", t0)

    card = sh.groupBy("file_id").agg(F.count("*").alias("n_sh"))

    sh_a = sh.select(F.col("file_id").alias("id_a"), "shingle")
    sh_b = sh.select(F.col("file_id").alias("id_b"), "shingle")
    inter = (
        pairs.select("id_a", "id_b")
        .join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    ca = card.select(F.col("file_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = card.select(F.col("file_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(ca, "id_a")
        .join(cb, "id_b")
        .na.fill({"inter": 0})
    )
    return out.select(
        "id_a",
        "id_b",
        (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias("jaccard"),
        (F.col("inter") / F.least("n_a", "n_b")).alias("containment"),
    )


def verify_candidates(
    pairs: DataFrame,
    signatures: DataFrame,
    shingles: DataFrame,
    cfg: DedupeConfig,
) -> DataFrame:
    """Full verification → PAIRS-shaped rows passing any configured test.

    Threshold semantics mirror the reference's hard dedupe threshold
    (``utils.py:245-246``); the ``method`` column records which test(s)
    admitted the pair.
    """
    # the candidate relation feeds both metric paths — materialize once
    pairs = pairs.localCheckpoint()
    sigm = attach_signature_metrics(pairs, signatures)
    exact = exact_overlap_metrics(pairs, shingles)
    both = sigm.join(exact, ["id_a", "id_b"])
    jac_ok = F.col("jaccard") >= F.lit(cfg.jaccard_threshold)
    ham_ok = F.col("hamming") <= F.lit(cfg.simhash_hamming_max)
    con_ok = F.col("containment") >= F.lit(cfg.containment_threshold)
    return (
        both.withColumn(
            "method",
            F.concat_ws(
                "+",
                F.when(jac_ok, F.lit("jaccard")),
                F.when(ham_ok, F.lit("simhash")),
                F.when(con_ok, F.lit("containment")),
            ),
        )
        .filter(jac_ok | ham_ok | con_ok)
        .select("id_a", "id_b", "jaccard", "minhash_est", "hamming", "containment", "method")
    )


def apply_silenced(pairs: DataFrame, silenced: DataFrame | None) -> DataFrame:
    """Suppress silenced pairs (the reference reads ``_silenced_*.json`` but
    never consults it — ``utils.py:111-115``; we actually honor it)."""
    if silenced is None:
        return pairs
    return pairs.join(silenced, ["id_a", "id_b"], "left_anti")


# ---------------------------------------------------------------------------
# Suffix-automaton longest-common-substring — the exact containment settle.
# ---------------------------------------------------------------------------

class _SuffixAutomaton:
    """Minimal online suffix automaton (Blumer et al. '85 construction as
    popularized in competitive-programming references). Linear build; then
    LCS against another string is a linear scan."""

    __slots__ = ("next", "link", "length", "last")

    def __init__(self, s: str) -> None:
        self.next: list[dict[str, int]] = [{}]
        self.link = [-1]
        self.length = [0]
        self.last = 0
        for ch in s:
            self._extend(ch)

    def _extend(self, ch: str) -> None:
        cur = len(self.next)
        self.next.append({})
        self.length.append(self.length[self.last] + 1)
        self.link.append(-1)
        p = self.last
        while p != -1 and ch not in self.next[p]:
            self.next[p][ch] = cur
            p = self.link[p]
        if p == -1:
            self.link[cur] = 0
        else:
            q = self.next[p][ch]
            if self.length[p] + 1 == self.length[q]:
                self.link[cur] = q
            else:
                clone = len(self.next)
                self.next.append(dict(self.next[q]))
                self.length.append(self.length[p] + 1)
                self.link.append(self.link[q])
                while p != -1 and self.next[p].get(ch) == q:
                    self.next[p][ch] = clone
                    p = self.link[p]
                self.link[q] = clone
                self.link[cur] = clone
        self.last = cur

    def lcs_len(self, t: str) -> int:
        v, length, best = 0, 0, 0
        for ch in t:
            while v and ch not in self.next[v]:
                v = self.link[v]
                length = self.length[v]
            if ch in self.next[v]:
                v = self.next[v][ch]
                length += 1
            else:
                v, length = 0, 0
            if length > best:
                best = length
        return best


def lcs_coverage(a: str, b: str) -> float:
    """Longest common substring length / len(shorter). 1.0 ⇔ the shorter
    string appears verbatim inside the longer (containment dup)."""
    if not a or not b:
        return 0.0
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    return _SuffixAutomaton(long_).lcs_len(short) / len(short)


def settle_containment(
    pairs_with_content: DataFrame,
    threshold: float,
) -> DataFrame:
    """For borderline containment candidates, compute exact LCS coverage via
    the suffix automaton in a batched pandas stage. Input columns:
    (id_a, id_b, content_a, content_b); output adds ``lcs_cov``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cov = [
                lcs_coverage(ca or "", cb or "")
                for ca, cb in zip(pdf["content_a"], pdf["content_b"])
            ]
            yield pd.DataFrame({"id_a": pdf["id_a"], "id_b": pdf["id_b"], "lcs_cov": cov})

    out = pairs_with_content.mapInPandas(batches, schema="id_a long, id_b long, lcs_cov double")
    return out.filter(F.col("lcs_cov") >= F.lit(threshold))
