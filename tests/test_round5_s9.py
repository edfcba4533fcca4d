"""Round-5 session-9 operators: fixed-n sampling, leakage-safe splits,
heavy-hitter report, integer-exact histogram, generic salted equi-join.

Each test pins the property the DuckDB value-hash oracle cannot see —
partition invariance, nesting, structural leakage safety, multiset equality
to the unsalted plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facematch_spark.operators.profile import equi_width_histogram, hot_keys
from facematch_spark.operators.sampling import fixed_n_sample, leakage_safe_split
from facematch_spark.operators.skew import salted_equi_join


@pytest.fixture(scope="module")
def keyed_df(spark):
    # 3 strata of different sizes, ids deterministic
    rows = [(i, "abc"[i % 3] if i < 60 else "a") for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


# ---- fixed_n_sample ----

def test_fixed_n_exact_counts(spark, keyed_df):
    out = fixed_n_sample(keyed_df, 7).groupBy("lang").count().collect()
    sizes = dict(keyed_df.groupBy("lang").count().collect())
    got = {r.lang: r["count"] for r in out}
    assert got == {lang: min(7, n) for lang, n in sizes.items()}


def test_fixed_n_caps_at_stratum_size(spark, keyed_df):
    out = fixed_n_sample(keyed_df, 10_000)
    assert out.count() == keyed_df.count()


def test_fixed_n_nested_across_sizes(spark, keyed_df):
    small = {r.doc_id for r in fixed_n_sample(keyed_df, 5).collect()}
    large = {r.doc_id for r in fixed_n_sample(keyed_df, 12).collect()}
    assert small < large


def test_fixed_n_partition_invariant(spark, keyed_df):
    a = sorted(r.doc_id for r in fixed_n_sample(keyed_df, 9).collect())
    b = sorted(
        r.doc_id for r in fixed_n_sample(keyed_df.repartition(17), 9).collect()
    )
    assert a == b


def test_fixed_n_rejects_bad_n(spark, keyed_df):
    with pytest.raises(ValueError, match="n must be"):
        fixed_n_sample(keyed_df, 0)


# ---- leakage_safe_split ----

@pytest.fixture(scope="module")
def clusters_df(spark):
    # 40 clusters, sizes 1-4: doc i belongs to cluster i // 4 * 4 .. no —
    # make membership explicit: cluster_id = min doc_id of each group of
    # (1 + id % 4) consecutive docs
    rows, doc = [], 0
    for _ in range(40):
        size = 1 + doc % 4
        cid = doc
        for _ in range(size):
            rows.append((doc, cid))
            doc += 1
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def test_split_never_straddles_clusters(spark, clusters_df):
    out = leakage_safe_split(clusters_df, {"train": 0.6, "val": 0.2, "test": 0.2})
    n_violations = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert n_violations == 0


def test_split_disjoint_exhaustive(spark, clusters_df):
    out = leakage_safe_split(clusters_df, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == clusters_df.count()  # every row gets a verdict
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    assert "train" in splits  # 0.8 of 40 clusters: vanishing miss odds


def test_split_granule_is_cluster_not_doc(spark, clusters_df):
    # same docs, cluster-keyed vs doc-keyed hashing must differ for SOME
    # multi-member cluster (else the leakage guarantee is vacuous)
    by_cluster = leakage_safe_split(
        clusters_df, {"train": 0.5, "test": 0.5}
    ).withColumnRenamed("split", "s_cl")
    by_doc = leakage_safe_split(
        clusters_df, {"train": 0.5, "test": 0.5}, cluster_col="doc_id"
    ).select("doc_id", F.col("split").alias("s_doc"))
    joined = by_cluster.join(by_doc, "doc_id")
    assert joined.filter("s_cl != s_doc").count() > 0


def test_split_fractions_must_sum_to_one(spark, clusters_df):
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(clusters_df, {"train": 0.8, "test": 0.1})


# ---- hot_keys ----

def test_hot_keys_exact_with_ties(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("c",)] * 3 + [("b",)] * 3 + [("d",)] * 1, "k string"
    )
    out = hot_keys(df, "k", top_k=3).collect()
    # tie between b and c at n=3 breaks to key ASC
    assert [(r.key, r.n) for r in out] == [("a", 5), ("b", 3), ("c", 3)]
    assert out[0].share == pytest.approx(5 / 12)


def test_hot_keys_share_sums_to_one_when_unlimited(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    out = hot_keys(df, "k", top_k=100)
    assert abs(sum(r.share for r in out.collect()) - 1.0) < 1e-12


# ---- equi_width_histogram ----

def test_histogram_exact_small(spark):
    df = spark.createDataFrame(
        [(None if v is None else float(v),) for v in [0, 1, 2, 3, 4, 5, 10, 11, None]],
        "x double",
    )
    out = {r.bin_id: (r.lo, r.hi, r.n) for r in
           equi_width_histogram(df, "x", 4).collect()}
    # min 0, max 11 → w = 11 div 4 + 1 = 3; bins [0,2][3,5][6,8][9,11]
    assert out == {0: (0, 2, 3), 1: (3, 5, 3), 3: (9, 11, 2)}  # bin 2 empty


def test_histogram_counts_cover_all_nonnull(spark):
    df = spark.range(1000).select((F.col("id") * 7 % 313).cast("double").alias("x"))
    out = equi_width_histogram(df, "x", 12)
    assert out.agg(F.sum("n")).first()[0] == 1000
    bad = out.filter((F.col("lo") > F.col("hi")) | (F.col("n") <= 0)).count()
    assert bad == 0


def test_histogram_degenerate_single_value(spark):
    df = spark.createDataFrame([(42.5,)] * 9, "x double")
    rows = equi_width_histogram(df, "x", 12).collect()
    assert len(rows) == 1 and (rows[0].bin_id, rows[0].n) == (0, 9)
    assert rows[0].lo <= 42 <= rows[0].hi


# ---- salted_equi_join ----

@pytest.fixture(scope="module")
def skewed_fact(spark):
    # 999 of 1000 rows share one key — the shape salting exists for
    return spark.createDataFrame(
        [(i, "hot" if i else "cold", float(i % 10)) for i in range(1000)],
        "event_id long, k string, v double",
    )


def test_salted_join_equals_plain_join(spark, skewed_fact):
    dim = spark.createDataFrame([("hot", 2), ("cold", 5)], "k string, wt long")
    for n_salts in (1, 8):
        got = (
            salted_equi_join(skewed_fact, dim, on="k", uniq_col="event_id",
                             n_salts=n_salts)
            .groupBy("k").agg(F.count("*").alias("n"), F.sum("wt").alias("s"))
        )
        want = (
            skewed_fact.join(dim, "k")
            .groupBy("k").agg(F.count("*").alias("n"), F.sum("wt").alias("s"))
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_spreads_hot_key(spark, skewed_fact):
    dim = spark.createDataFrame([("hot", 2), ("cold", 5)], "k string, wt long")
    out = salted_equi_join(skewed_fact, dim, on="k", uniq_col="event_id", n_salts=8)
    # the physical join key must include the salt → 8 distinct (k, salt)
    # groups for the hot key; verify via the pre-drop internal column by
    # recomputing the salt expression (xxhash64 % 8 over event_id)
    n_groups = (
        skewed_fact.filter("k = 'hot'")
        .select(F.pmod(F.xxhash64("event_id"), F.lit(8)).alias("s"))
        .distinct().count()
    )
    assert n_groups == 8
    assert "_salt" not in out.columns


def test_salted_join_rejects_column_collision(spark, skewed_fact):
    dim = spark.createDataFrame([("hot", 1.0)], "k string, v double")  # v collides
    with pytest.raises(ValueError, match="overlapping"):
        salted_equi_join(skewed_fact, dim, on="k", uniq_col="event_id")
