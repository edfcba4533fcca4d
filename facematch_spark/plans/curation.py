"""End-to-end training-data curation: quality gate → near-dup clustering →
representative election → deterministic stratified sample.

This is the composed flow a user of the reference would actually run to
produce a training corpus (the reference stops at the findings report,
tasks.py:109-127; the curation decisions — what to keep, what to sample —
happen downstream by hand). Every stage is one of this engine's tested
operators; the composition adds no new shuffle beyond what the stages
already own, and the whole flow is expressible as one SQL statement, so the
DuckDB oracle verifies the composition, not just the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from facematch_spark.operators.dedup import cluster_representatives
from facematch_spark.operators.sampling import stratified_sample

__all__ = ["curate"]


def curate(
    docs: DataFrame,
    k: int,
    threshold: float,
    rates: dict[str, float],
    default_rate: float = 0.0,
    min_chars: int = 100,
    score: F.Column | None = None,
) -> DataFrame:
    """documents → curated subset, deterministically.

    1. quality gate: drop docs under ``min_chars`` characters (a pushdown-able
       scan predicate — stand-in for any row-local quality score);
    2. near-dup clustering over the survivors (exact k-gram Jaccard ≥
       ``threshold``) and representative election — one kept doc per
       duplicate cluster; ``score`` picks the survivor (default: longest
       doc; pass any Column expression, e.g. a quality-model score column,
       to keep-the-cleanest instead), ties to min doc_id;
    3. per-language stratified sample of the representatives (map-only hash
       predicate — reproducible, superset-consistent).

    Output: one row per kept doc with its provenance —
    ``(doc_id, lang, cluster_id, n_members, sample_key)``.
    """
    q = docs.filter(F.length("text") >= min_chars)
    reps = cluster_representatives(q, k, threshold, score=score)
    kept = q.join(
        reps.select(
            F.col("rep_id").alias("doc_id"), "cluster_id", "n_members"
        ),
        "doc_id",
    )
    return stratified_sample(kept, rates, default_rate=default_rate).select(
        "doc_id", "lang", "cluster_id", "n_members", "sample_key"
    )
