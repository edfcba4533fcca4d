"""Parity of the exact-Jaccard verify tiers (round-6 optimization pin).

The round-6 rework gave the broadcast tier a flat-buffer payload and a
searchsorted merge kernel; the fallback tier (shingle relation past
``BROADCAST_SHINGLE_LIMIT``) kept the array-join + ``np.intersect1d`` form.
Both must produce identical pairs AND identical jaccard doubles — the
fallback is the 100 TB path and is otherwise never exercised at test scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_df(spark):
    from facematch_spark import schema as S
    from facematch_spark.fixtures import corpus_to_pandas, generate_corpus

    src = spark.createDataFrame(
        corpus_to_pandas(generate_corpus(n_base=40, seed=7)), schema=S.SOURCE_FILES
    )
    return src.select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"),
        F.col("content").alias("text"),
        F.col("lang"),
    ).filter(F.col("text").isNotNull())


def _collect_pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
    )


def test_broadcast_and_fallback_tiers_agree(spark, docs_df, monkeypatch):
    from facematch_spark.operators import dedup as D

    bc = _collect_pairs(D.ngram_jaccard_pairs(docs_df, 9, 0.5))
    assert len(bc) > 0  # fixture plants near-dups; empty would test nothing
    monkeypatch.setattr(D, "BROADCAST_SHINGLE_LIMIT", 0)
    fb = _collect_pairs(D.ngram_jaccard_pairs(docs_df, 9, 0.5))
    assert bc == fb  # pairs AND jaccard doubles bit-identical
