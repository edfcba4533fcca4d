"""Degenerate-input robustness for the round-5 operator families: empty
relations (an empty partition/day/shard is routine at pipeline scale) and
single-element graphs/corpora must yield empty-or-sane results, never
throw."""

from pyspark.sql import functions as F  # noqa: F401


def test_empty_and_degenerate_inputs(spark):
    from facematch_spark.operators.blocking import edit_distance_pairs, snm_candidates
    from facematch_spark.operators.graph import (
        link_prediction_ra,
        local_triangle_counts,
        pagerank_int,
    )
    from facematch_spark.operators.kmeans import kmeans_int
    from facematch_spark.operators.scan import prefix_agg, skyline_2d

    empty_edges = spark.createDataFrame([], "u long, v long")
    empty_docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    empty_kv = spark.createDataFrame([], "k double, v long")
    one_doc = spark.createDataFrame(
        [(1, "hello world", "en")], "doc_id long, text string, lang string"
    )
    one_edge = spark.createDataFrame([(1, 2)], "u long, v long")

    assert local_triangle_counts(empty_edges).count() == 0
    assert pagerank_int(empty_edges).count() == 0
    assert link_prediction_ra(empty_edges).count() == 0
    assert prefix_agg(empty_kv, "k", "v", "sum").count() == 0
    assert (
        skyline_2d(
            empty_kv.selectExpr("k AS price", "v AS size"), "price", "size"
        ).count()
        == 0
    )
    assert edit_distance_pairs(empty_docs).count() == 0
    assert snm_candidates(empty_docs).count() == 0
    assert snm_candidates(one_doc).count() == 0  # no successor, no pair
    assert local_triangle_counts(one_edge).count() == 0  # no triangle

    # k > N: silently trains N centroids; every point still assigned
    emb = spark.createDataFrame(
        [(0, [0.1] * 4), (1, [0.9] * 4)], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: r.cluster for r in kmeans_int(spark, emb, k=5, iterations=1).collect()}
    assert set(got) == {0, 1} and len(set(got.values())) == 2
