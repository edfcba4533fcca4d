"""Round-5 session-11 operators: Z-order layout, equi-depth quantile bins,
sliding event-time windows.

Each test pins the property the DuckDB value-hash oracle cannot see —
Morton-key bit layout vs a Python reference, the pruning win Z-order
exists for (shard bounding boxes narrow on BOTH axes, unlike a 1-D sort),
equi-depth bins actually being equi-depth, and sliding windows assigning
every event to exactly two windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facematch_spark.operators.layout import zorder_key, zorder_sql_expr


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    m = (1 << bits) - 1
    x &= m
    y &= m
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (1, 1), (5, 9), (65535, 65535),
           (65535, 0), (12345, 54321), (-1, 3), (70000, 2)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key(F.col("x"), F.col("y"))).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_py(x, y), (x, y)


def test_zorder_sql_expr_matches_column_form(spark):
    import duckdb

    pts = [(x, y) for x in range(0, 300, 7) for y in range(0, 300, 11)]
    df = spark.createDataFrame(pts, "x long, y long")
    spark_z = sorted(
        (r.x, r.y, r.z)
        for r in df.withColumn("z", zorder_key(F.col("x"), F.col("y"))).collect()
    )
    con = duckdb.connect()
    duck_z = sorted(
        con.execute(
            "SELECT x, y, " + zorder_sql_expr("x", "y") + " AS z FROM "
            "(SELECT unnest($1) AS x, unnest($2) AS y)",
            [[p[0] for p in pts], [p[1] for p in pts]],
        ).fetchall()
    )
    assert spark_z == duck_z


def test_zorder_shards_bound_both_axes(spark):
    # THE pruning property: carve a 64x64 uniform grid into ~16 shards.
    # Under a 1-D sort on x, each shard spans the FULL y range (64 values).
    # Under the Morton order, every shard must cover a small rectangle —
    # both side lengths far below the full extent.
    from facematch_spark.operators.shard import shard_plan

    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "one", F.lit(1)
    )
    z = df.withColumn("zkey", zorder_key(F.col("x"), F.col("y")))
    sharded = shard_plan(z, key=["zkey", "x", "y"], bytes_col="one",
                         target_bytes=256)
    boxes = (
        sharded.groupBy("shard_id")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(boxes) == 16
    # 256 points of a Morton curve tile exactly one 16x16 quadrant here
    # (power-of-two grid, power-of-two shard size): side <= 15 on BOTH axes.
    for r in boxes:
        assert r.dx <= 15 and r.dy <= 15, (r.dx, r.dy)


def test_quantile_bins_equi_depth(spark):
    import __spark_entry__ as E

    rows = E.queries()["q_quantile_bins"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    total = sum(r.n for r in rows)
    for r in rows:
        # deciles: each bin holds ~10% (ties on boundaries allowed slack)
        assert abs(r.n / total - 0.1) < 0.02, (r.bin, r.n, total)
    # bins are ordered, contiguous value ranges
    by_bin = sorted(rows, key=lambda r: r.bin)
    assert [r.bin for r in by_bin] == list(range(10))
    for lo_r, hi_r in zip(by_bin, by_bin[1:]):
        assert lo_r.hi <= hi_r.lo


def test_events_sliding_double_counts_each_event(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["q_events_sliding"](spark, sf)
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()
    got = out.agg(F.sum("n_events").alias("s")).collect()[0].s
    # 2h window, 1h slide: every event lands in exactly two windows
    assert got == 2 * n_events


# ---- blocking family: SNM + length-band edit distance ----

def test_edit_distance_banding_is_lossless(spark):
    # the blocking theorem: band-adjacency must find EVERY pair with
    # d <= 0.2*max_len — compare against the unblocked all-pairs scan on a
    # corpus engineered to cross band boundaries (lengths straddle k*128).
    import random

    from facematch_spark.operators.blocking import edit_distance_pairs

    rng = random.Random(7)
    base = "".join(rng.choice("abcdef ") for _ in range(400))
    rows = []
    for i in range(40):
        # mutate 0..120 chars off the base: some pairs within threshold,
        # some out; lengths drift across the 128-band boundary
        s = list(base)
        for _ in range(rng.randrange(0, 120)):
            s[rng.randrange(len(s))] = rng.choice("abcdef ")
        txt = "".join(s) + "x" * rng.randrange(0, 60)
        rows.append((i, txt, "en"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df).select("id_a", "id_b").collect()
    }

    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    a, b = df.alias("a"), df.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.levenshtein(F.col("a.text"), F.col("b.text")).cast("long").alias("d"),
            F.greatest(
                F.length(F.col("a.text")), F.length(F.col("b.text"))
            ).cast("long").alias("ml"),
        )
        .filter(F.col("d") * 5 <= F.col("ml"))
    )
    want = {(r.id_a, r.id_b) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_snm_candidates_window_bound(spark):
    from facematch_spark.operators.blocking import snm_candidates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = 5
    cands = snm_candidates(docs, window=w)
    n_docs = docs.count()
    n_cands = cands.count()
    # exactly (w-1) successors per rank, minus the truncated tail
    assert n_cands == (n_docs - w + 1) * (w - 1) + sum(range(w - 1))
    # per-doc degree bound: each doc meets at most 2*(w-1) others
    deg = (
        cands.selectExpr("id_a AS d").union(cands.selectExpr("id_b AS d"))
        .groupBy("d").count().agg(F.max("count")).collect()[0][0]
    )
    assert deg <= 2 * (w - 1)


def test_snm_rank_is_partition_invariant(spark):
    from facematch_spark.operators.blocking import snm_candidates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {(r.id_a, r.id_b) for r in snm_candidates(docs.repartition(2)).collect()}
    b = {(r.id_a, r.id_b) for r in snm_candidates(docs.repartition(16)).collect()}
    assert a == b


def test_q4_decorrelates_to_semi_join(spark):
    import __spark_entry__ as E

    plan = E.queries()["q4_order_priority"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_gapfill_dense_and_sum_preserving(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["q_gapfill_hours"](spark, sf)
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n_types = ev.select("event_type").distinct().count()
    hours = out.select("hour").distinct().count()
    assert out.count() == hours * n_types          # dense grid
    s = out.agg(F.sum("n_events")).collect()[0][0]
    assert s == ev.count()                          # nothing lost
    assert out.filter(F.col("n_events") == 0).count() > 0  # zeros explicit
