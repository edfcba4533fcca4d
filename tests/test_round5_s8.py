"""Round-5 session-8 operators: CDC merge/upsert, interval-overlap join,
document chunking, distributed prefix-sum shard planning."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------- merge upsert


def _base(spark):
    return spark.createDataFrame(
        [Row(k=i, val=f"v{i}", n=i * 10) for i in range(1, 6)]
    )


def _changes(spark, rows):
    # rows: (k, val, n, op, seq)
    return spark.createDataFrame(
        [Row(k=k, val=v, n=n, op=op, seq=s) for k, v, n, op, s in rows]
    )


def test_merge_upsert_semantics(spark):
    from facematch_spark.operators.merge import merge_upsert

    ch = _changes(
        spark,
        [
            (2, "v2-new", 999, "U", 1),   # update existing
            (4, "ignored", 0, "D", 1),    # delete existing
            (9, "v9", 90, "U", 1),        # insert new key
            (7, "gone", 0, "D", 1),       # delete of absent key: no-op
        ],
    )
    out = {r["k"]: r for r in merge_upsert(_base(spark), ch, "k").collect()}
    assert set(out) == {1, 2, 3, 5, 9}
    assert (out[2]["val"], out[2]["n"]) == ("v2-new", 999)
    assert out[1]["val"] == "v1"  # untouched base row passes through
    assert (out[9]["val"], out[9]["n"]) == ("v9", 90)


def test_merge_upsert_latest_seq_wins(spark):
    from facematch_spark.operators.merge import merge_upsert

    # same key changed twice in one batch: seq order decides, including a
    # delete-then-reinsert (seq 1 D, seq 2 U resurrects with new payload).
    ch = _changes(
        spark,
        [
            (3, "first", 1, "U", 1),
            (3, "second", 2, "U", 2),
            (5, "x", 0, "D", 1),
            (5, "re", 7, "U", 2),
        ],
    )
    out = {r["k"]: r for r in merge_upsert(_base(spark), ch, "k").collect()}
    assert out[3]["val"] == "second"
    assert (out[5]["val"], out[5]["n"]) == ("re", 7)


def test_merge_upsert_duplicate_key_seq_raises(spark):
    from facematch_spark.operators.merge import merge_upsert

    ch = _changes(spark, [(3, "a", 1, "U", 1), (3, "b", 2, "U", 1)])
    with pytest.raises(ValueError, match="duplicate"):
        merge_upsert(_base(spark), ch, "k")


def test_merge_upsert_plan_has_no_window_sort(spark):
    from facematch_spark.operators.merge import merge_upsert

    ch = _changes(spark, [(2, "u", 1, "U", 1)])
    plan = (
        merge_upsert(_base(spark), ch, "k", check_unique=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # map-side-combinable hash aggregate, not the window row_number form
    assert "Window" not in plan
    assert "partial_max_by" in plan.lower() or "HashAggregate" in plan


# ------------------------------------------------------- interval overlap join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _intervals(spark, rows):
    # rows: (id, start_s, end_s) relative to a fixed epoch
    return spark.createDataFrame(
        [Row(iid=i, start=_ts(a), end=_ts(b)) for i, a, b in rows]
    )


def test_interval_overlap_exact_vs_bruteforce(spark):
    from facematch_spark.operators.temporal import interval_overlap_pairs

    # deliberately spans bin boundaries (bin_s=100): overlaps crossing bins,
    # touching endpoints, containment, disjoint neighbors.
    rows = [
        (1, 0, 50),
        (2, 40, 160),    # crosses bins 0 and 1; overlaps 1 and 3
        (3, 160, 160),   # zero-length, touches 2's endpoint
        (4, 161, 250),
        (5, 90, 410),    # long: covers bins 0..4, overlaps 2,3,4,6
        (6, 400, 401),
        (7, 1000, 1100), # isolated
    ]
    df = _intervals(spark, rows)
    got = {
        (r["l_iid"], r["r_iid"])
        for r in interval_overlap_pairs(
            df, df, ["iid"], ["iid"], l_start="start", l_end="end",
            r_start="start", r_end="end", bin_s=100,
        ).collect()
    }
    expect = {
        (a, c)
        for a, s1, e1 in rows
        for c, s2, e2 in rows
        if s1 <= e2 and s2 <= e1
    }
    assert got == expect
    # sanity on the fixture: at least one overlapping pair shares NO bin
    # start, i.e. is found only because both cover a common middle bin
    assert (2, 5) in got and (3, 2) in got and (7, 1) not in got


def test_interval_overlap_pair_sharing_many_bins_emitted_once(spark):
    from facematch_spark.operators.temporal import interval_overlap_pairs

    df = _intervals(spark, [(1, 0, 1000), (2, 0, 1000)])
    out = interval_overlap_pairs(
        df, df, ["iid"], ["iid"], l_start="start", l_end="end",
        r_start="start", r_end="end", bin_s=100,
    ).collect()
    # 11 shared bins, but exactly 4 pair rows: (1,1) (1,2) (2,1) (2,2)
    assert len(out) == 4


# ------------------------------------------------------------------ chunking


def test_chunk_documents_exact(spark):
    from facematch_spark.operators.text import chunk_documents

    text = "abcdefghij" * 5  # 50 chars
    df = spark.createDataFrame([Row(doc_id=1, text=text), Row(doc_id=2, text="")])
    out = chunk_documents(df, size=20, stride=15)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: offsets 0,15,30,45 -> 4 chunks; last one short (5 chars)
    assert [rows[(1, i)]["chunk_text"] for i in range(4)] == [
        text[0:20], text[15:35], text[30:50], text[45:50],
    ]
    assert all(rows[(1, i)]["n_chunks"] == 4 for i in range(4))
    # consecutive chunks overlap by size - stride chars
    assert rows[(1, 0)]["chunk_text"][15:] == rows[(1, 1)]["chunk_text"][:5]
    # empty doc still yields exactly one (empty) chunk
    assert rows[(2, 0)]["chunk_text"] == "" and rows[(2, 0)]["n_chunks"] == 1


def test_chunk_documents_map_only_plan(spark):
    from facematch_spark.operators.text import chunk_documents

    df = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_bad_params_raise(spark):
    from facematch_spark.operators.text import chunk_documents

    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        chunk_documents(df, size=10, stride=11)
    with pytest.raises(ValueError):
        chunk_documents(df, size=10, stride=0)


# ---------------------------------------------------------------- shard plan


def test_shard_plan_matches_naive_global_window(spark):
    from pyspark.sql import Window as W

    from facematch_spark.operators.shard import shard_plan

    rows = spark.createDataFrame(
        [Row(key=i, nbytes=(i * 37) % 100 + 1) for i in range(200)]
    )
    naive = rows.withColumn(
        "cum_bytes",
        F.sum("nbytes").over(W.orderBy("key").rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    ).withColumn(
        "shard_id", F.floor((F.col("cum_bytes") - F.col("nbytes")) / F.lit(500)).cast("long")
    )
    expect = {r["key"]: (r["cum_bytes"], r["shard_id"]) for r in naive.collect()}
    for nparts in (2, 8):
        got = {
            r["key"]: (r["cum_bytes"], r["shard_id"])
            for r in shard_plan(rows, "key", "nbytes", 500, num_partitions=nparts).collect()
        }
        assert got == expect, f"nparts={nparts}"


def test_shard_plan_no_single_reducer_window(spark):
    from facematch_spark.operators.shard import shard_plan

    rows = spark.createDataFrame([Row(key=i, nbytes=10) for i in range(50)])
    plan = (
        shard_plan(rows, "key", "nbytes", 100, num_partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every Window node must carry a partition spec (the naive form plans
    # Window [partition spec is empty] -> one task for all rows)
    for line in plan.splitlines():
        if "Window [" in line or "WindowExec" in line:
            assert "_pid" in line or "windowspecdefinition(_pid" in line, line


def test_shard_plan_shards_contiguous_and_sized(spark):
    from facematch_spark.operators.shard import shard_plan

    rows = spark.createDataFrame([Row(key=i, nbytes=7) for i in range(300)])
    out = sorted(
        shard_plan(rows, "key", "nbytes", 100).collect(), key=lambda r: r["key"]
    )
    # shard ids are monotone in key order and dense from 0
    ids = [r["shard_id"] for r in out]
    assert ids == sorted(ids) and ids[0] == 0
    assert set(ids) == set(range(max(ids) + 1))
    # every shard except the last spans >= target bytes once its successor
    # starts (a row starts a new shard only past the target boundary)
    totals = {}
    for r in out:
        totals[r["shard_id"]] = totals.get(r["shard_id"], 0) + r["nbytes"]
    for sid in range(max(ids)):
        assert totals[sid] >= 100 - 7 + 1  # >= target - (rowsize - 1)


def test_shard_plan_composite_key(spark):
    from pyspark.sql import Window as W

    from facematch_spark.operators.shard import shard_plan

    rows = spark.createDataFrame(
        [Row(a=i // 7, b=i % 7, nbytes=(i * 13) % 50 + 1) for i in range(150)]
    )
    naive = rows.withColumn(
        "cum_bytes",
        F.sum("nbytes").over(
            W.orderBy("a", "b").rowsBetween(W.unboundedPreceding, 0)
        ).cast("long"),
    )
    expect = {(r["a"], r["b"]): r["cum_bytes"] for r in naive.collect()}
    got = {
        (r["a"], r["b"]): r["cum_bytes"]
        for r in shard_plan(rows, ["a", "b"], "nbytes", 100, num_partitions=5).collect()
    }
    assert got == expect


# ------------------------------------------------- property tests (hypothesis)


def test_merge_upsert_matches_dict_replay_property(spark):
    """Property: merge_upsert equals a driver-side dict replay of the change
    log in (rank, seq) order — an oracle independent of Spark and SQL."""
    from hypothesis import given, settings, strategies as st

    from facematch_spark.operators.merge import merge_upsert

    key_s = st.integers(min_value=0, max_value=6)

    @settings(max_examples=10, deadline=None)
    @given(
        base_keys=st.sets(key_s, min_size=0, max_size=5),
        changes=st.lists(
            st.tuples(key_s, st.sampled_from(["U", "D"])), min_size=0, max_size=10
        ),
    )
    def check(base_keys, changes):
        # seq = position in the log (unique per key automatically? no —
        # unique per (key, position) since positions are distinct)
        base = [(k, f"base{k}") for k in sorted(base_keys)]
        log = [(k, f"chg{i}", op, i) for i, (k, op) in enumerate(changes)]
        expect = {k: v for k, v in base}
        for k, v, op, _ in log:  # replay in seq order
            if op == "D":
                expect.pop(k, None)
            else:
                expect[k] = v
        bdf = spark.createDataFrame(base, "k long, val string") if base else (
            spark.createDataFrame([], "k long, val string"))
        cdf = spark.createDataFrame(log, "k long, val string, op string, seq long") if log else (
            spark.createDataFrame([], "k long, val string, op string, seq long"))
        got = {r["k"]: r["val"] for r in merge_upsert(bdf, cdf, "k").collect()}
        assert got == expect

    check()


def test_interval_overlap_matches_bruteforce_property(spark):
    """Property: interval_overlap_pairs equals the O(N^2) overlap predicate
    on random interval sets, for any bin width."""
    from hypothesis import given, settings, strategies as st

    from facematch_spark.operators.temporal import interval_overlap_pairs

    sec = st.integers(min_value=0, max_value=500)

    @settings(max_examples=8, deadline=None)
    @given(
        spans=st.lists(st.tuples(sec, sec), min_size=1, max_size=10),
        bin_s=st.sampled_from([7, 100, 1000]),
    )
    def check(spans, bin_s):
        rows = [(i, min(a, b), max(a, b)) for i, (a, b) in enumerate(spans)]
        df = _intervals(spark, rows)
        got = {
            (r["l_iid"], r["r_iid"])
            for r in interval_overlap_pairs(
                df, df, ["iid"], ["iid"], l_start="start", l_end="end",
                r_start="start", r_end="end", bin_s=bin_s,
            ).collect()
        }
        expect = {
            (i, j)
            for i, s1, e1 in rows
            for j, s2, e2 in rows
            if s1 <= e2 and s2 <= e1
        }
        assert got == expect

    check()
