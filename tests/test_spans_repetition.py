"""Round-5 additions: exact-substring duplicate spans (Lee et al. 2022
shape) and Gopher-style repetition screens (Rae et al. 2021 A1.1)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


# ---------------------------------------------------------------- spans


def test_duplicate_spans_basic_merge(spark):
    from facematch_spark.operators.dedup import duplicate_spans

    # two docs share a 40-char run; k=10 windows covering it must merge into
    # ONE maximal span per doc, at the right offsets.
    shared = "0123456789" * 4  # 40 chars
    a = "aaaaa" + shared + "bbbbbbbb"  # span at 6..46 (1-based, end excl)
    b = "cc" + shared + "dd"  # span at 3..43
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(_docs(spark, [a, b]), k=10).collect()
    }
    # NOTE: `shared` repeats its own 10-gram internally ("9012345678" etc.
    # appear 4x within one doc) — but within-doc repeats don't create
    # duplication; cross-doc sharing does, and here every window of `shared`
    # appears in both docs, so coverage is exactly the shared run.
    assert out[0] == (6, 6 + 40, 40)
    assert out[1] == (3, 3 + 40, 40)


def test_duplicate_spans_gap_splits_islands(spark):
    from facematch_spark.operators.dedup import duplicate_spans

    # two shared runs separated by a long unique middle → two spans, not one.
    run1, run2 = "x" * 20, "y" * 20
    a = run1 + "-unique-middle-part-alpha-" + run2
    b = run1 + "=differently=unique=beta==" + run2
    out = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_spans(_docs(spark, [a, b]), k=10)
        .filter("doc_id = 0")
        .collect()
    )
    assert out == [(1, 21), (47, 67)]


def test_duplicate_spans_within_doc_repeat_not_flagged(spark):
    from facematch_spark.operators.dedup import duplicate_spans

    # doc 0 repeats a block internally; no other doc shares it → no spans.
    rows = ["zqzqzqzqzqzqzqzqzqzqzqzqzqzqzq", "totally different content here"]
    assert duplicate_spans(_docs(spark, rows), k=10).count() == 0


def test_duplicate_spans_short_docs_excluded(spark):
    from facematch_spark.operators.dedup import duplicate_spans

    rows = ["short", "short"]  # len 5 < k → no windows at all
    assert duplicate_spans(_docs(spark, rows), k=10).count() == 0


def test_duplicate_spans_hash_grams_parity(spark, tiny_df):
    """xxhash64-keyed shuffle diet must produce byte-identical spans on the
    fixture corpus (collisions are the only delta and are ~2⁻⁶⁴ here)."""
    from facematch_spark.operators.dedup import duplicate_spans

    docs = tiny_df.selectExpr(
        "xxhash64(repo, path, commit) AS doc_id", "content AS text"
    )
    exact = set(map(tuple, duplicate_spans(docs, k=30).collect()))
    hashed = set(map(tuple, duplicate_spans(docs, k=30, hash_grams=True).collect()))
    assert exact == hashed
    assert exact  # the fixture plants dup families — spans must exist


def test_duplicate_spans_plan_no_cartesian(spark, tiny_df):
    from facematch_spark.operators.dedup import duplicate_spans

    docs = tiny_df.selectExpr(
        "xxhash64(repo, path, commit) AS doc_id", "content AS text"
    )
    plan = duplicate_spans(docs, k=30)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ----------------------------------------------------------- repetition


def test_repetition_scores_degenerate_doc(spark):
    from facematch_spark.operators.text import repetition_scores

    # "a a a a" — 7 chars, 4 tokens all dup; 3 occurrences of 2-gram "a a"
    # (len 3) → top/dup 2-gram mass 9/7; 2 occurrences of "a a a" → 10/7.
    row = repetition_scores(_docs(spark, ["a a a a"])).collect()[0]
    assert row["dup_token_frac"] == 1.0
    assert row["top_2gram_frac"] == round(9 / 7, 4)
    assert row["dup_2gram_frac"] == round(9 / 7, 4)
    assert row["top_3gram_frac"] == round(10 / 7, 4)


def test_repetition_scores_unique_doc(spark):
    from facematch_spark.operators.text import repetition_scores

    # all-unique tokens: no dup mass; top 2-gram has count 1 and ties break
    # to the lexicographically smallest gram ("alpha beta", len 10 over 22).
    row = repetition_scores(_docs(spark, ["alpha beta gamma delta"])).collect()[0]
    assert row["dup_token_frac"] == 0.0
    assert row["dup_2gram_frac"] == 0.0
    assert row["top_2gram_frac"] == round(10 / 22, 4)


def test_repetition_scores_tiny_docs_zero_grams(spark):
    from facematch_spark.operators.text import repetition_scores

    # one-token and empty-ish docs: gram relations are empty → coalesced 0s,
    # and every input doc still yields exactly one output row.
    out = repetition_scores(_docs(spark, ["solo", " "]))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r["top_2gram_frac"] == 0.0
        assert r["top_3gram_frac"] == 0.0
        assert r["dup_2gram_frac"] == 0.0
        assert r["dup_token_frac"] == 0.0


def test_span_stats_actions(spark):
    from facematch_spark.operators.dedup import duplicate_span_stats

    shared = "0123456789" * 5  # 50 chars
    rows = [
        shared,                         # doc 0: 100% duplicated → drop
        shared + "x" * 60,              # doc 1: 50/110 dup'd → cut
        "совершенно уникальный текст без повторов вообще!!",  # doc 2: keep
    ]
    got = {
        r["doc_id"]: (r["dup_chars"], r["dup_frac"], r["action"])
        for r in duplicate_span_stats(_docs(spark, rows), k=10).collect()
    }
    assert got[0] == (50, 1.0, "drop")
    assert got[1] == (50, round(50 / 110, 4), "cut")
    assert got[2] == (0, 0.0, "keep")
    assert len(got) == 3  # every doc appears


# ------------------------------------------------ within-doc repeated spans


def test_within_doc_spans_degenerate_doc_one_full_span(spark):
    from pyspark.sql import Row

    from facematch_spark.operators.dedup import within_doc_repeated_spans

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="X" * 50),            # every 20-gram identical
            Row(doc_id=2, text="".join(chr(97 + (i * 7) % 26) + str(i) for i in range(30))),  # no repeats
        ]
    )
    out = within_doc_repeated_spans(df, k=20).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"]) for r in out} == {(1, 1, 51)}


def test_within_doc_spans_two_islands_and_cross_doc_excluded(spark):
    from pyspark.sql import Row

    from facematch_spark.operators.dedup import within_doc_repeated_spans

    block = "the quick brown fox jumps"  # 25 chars -> six 20-gram windows
    filler1 = "".join(chr(33 + i) for i in range(80))  # 80 distinct chars
    doc1 = block + filler1 + block       # two in-doc copies, far apart
    # doc3/doc4 share a block ACROSS docs but have no in-doc repeat
    doc3 = "zzzz" + block
    doc4 = block + "qqqq"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=doc1), Row(doc_id=3, text=doc3), Row(doc_id=4, text=doc4)]
    )
    out = within_doc_repeated_spans(df, k=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    # only doc 1 is flagged; cross-doc-only repetition is the OTHER operator
    assert set(by_doc) == {1}
    spans = sorted(by_doc[1])
    # copy 1 windows at pos 1..6 -> span [1, 26); copy 2 at 106..111 -> [106, 131)
    assert spans == [(1, 26), (106, 131)]
