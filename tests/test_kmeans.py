"""Deterministic integer k-means: Spark vs an exact Python replay (the
engine-independent third oracle; DuckDB is the second via check_oracle)."""

import hashlib
import math

import pytest


def _replay(pts, k, iterations):
    order = sorted(pts, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))
    centroids = {i: pts[order[i]] for i in range(k)}

    def assign(cents):
        return {
            vid: min(
                (sum((a - b) * (a - b) for a, b in zip(q, cents[c])), c)
                for c in sorted(cents)
            )[1]
            for vid, q in pts.items()
        }

    for _ in range(iterations):
        a = assign(centroids)
        sums, counts = {}, {}
        for vid, c in a.items():
            counts[c] = counts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * len(pts[vid]))
            for d, v in enumerate(pts[vid]):
                s[d] += v
        centroids = {
            c: [int(math.floor(sums[c][d] / counts[c])) for d in range(len(sums[c]))]
            for c in sorted(sums)
        }
    return assign(centroids)


def test_kmeans_int_matches_python_replay(spark):
    from facematch_spark.operators.kmeans import kmeans_int

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {r.vec_id: r.cluster for r in
           kmeans_int(spark, emb, k=3, iterations=2).collect()}

    def rnd(x):
        return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)

    pts = {
        r.vec_id: [rnd(float(x)) for x in r.embedding] for r in emb.collect()
    }
    want = _replay(pts, k=3, iterations=2)
    assert got == want and len(set(got.values())) == 3


def test_kmeans_rejects_bad_params(spark):
    from facematch_spark.operators.kmeans import kmeans_int

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError):
        kmeans_int(spark, emb, k=0)
    with pytest.raises(ValueError):
        kmeans_int(spark, emb, k=2, iterations=0)


def test_kmeans_assignment_is_partition_invariant(spark):
    from facematch_spark.operators.kmeans import kmeans_int

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r.vec_id: r.cluster
         for r in kmeans_int(spark, emb.repartition(2), k=3, iterations=1).collect()}
    b = {r.vec_id: r.cluster
         for r in kmeans_int(spark, emb.repartition(16), k=3, iterations=1).collect()}
    assert a == b
