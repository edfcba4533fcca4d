"""Round-5 session-7 operators: PII redaction, TF-IDF top terms, bucketed
co-located join (exchange-free plan), CUBE metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------- PII redact


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_pii_redact_counts_and_tokens(spark):
    from facematch_spark.operators.text import pii_redact

    df = _docs(
        spark,
        [
            (1, "mail me at a.b-c_1%x@sub.ex-a.io today"),
            (2, "server 192.168.0.1 and 10.0.255.254 up"),
            (3, "call 555-123-4567 or 555 987 6543 now"),
            (4, "no pii here at all"),
            (5, "two mails x@y.io z@w.org one ip 1.2.3.4 one tel 111-222-3333"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 0, 0)
    assert out[1]["redacted_text"] == "mail me at <EMAIL> today"
    assert (out[2]["n_email"], out[2]["n_ipv4"]) == (0, 2)
    assert out[2]["redacted_text"] == "server <IP> and <IP> up"
    assert out[3]["n_phone"] == 2
    assert out[3]["redacted_text"] == "call <PHONE> or <PHONE> now"
    assert out[4]["redacted_text"] == "no pii here at all"
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (2, 1, 1)


def test_pii_redact_order_email_before_numbers(spark):
    # an email whose local part is digit runs must be consumed by the email
    # pass, not chewed into a phone-shaped match later
    from facematch_spark.operators.text import pii_redact

    df = _docs(spark, [(1, "reach 555-123-4567@ex.io please")])
    r = pii_redact(df).collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 0
    assert r["redacted_text"] == "reach <EMAIL> please"


# ---------------------------------------------------------------- TF-IDF


def test_tfidf_hand_computed(spark):
    import math

    from facematch_spark.operators.text import tfidf_top_terms

    # 3 docs; "common" is in all (idf=0), "rare" only in doc 1
    df = _docs(
        spark,
        [
            (1, "common rare rare mid"),
            (2, "common mid"),
            (3, "common"),
        ],
    )
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_top_terms(df, k=2).collect()}
    # doc 1: rare tf=2 df=1 score=2*ln(3); mid tf=1 df=2 score=ln(1.5); common 0
    assert out[(1, 1)]["term"] == "rare"
    assert out[(1, 1)]["score"] == pytest.approx(round(2 * math.log(3.0), 4))
    assert out[(1, 2)]["term"] == "mid"
    # doc 3 has only the zero-idf term; it still ranks (score 0), ties n/a
    assert out[(3, 1)]["term"] == "common" and out[(3, 1)]["score"] == 0.0


def test_tfidf_tie_breaks_lexicographic(spark):
    from facematch_spark.operators.text import tfidf_top_terms

    # two terms with identical tf and df in the same doc -> same score;
    # rank 1 must go to the lexicographically smaller term
    df = _docs(spark, [(1, "zeta alpha"), (2, "zeta alpha")])
    out = {(r["doc_id"], r["rank"]): r["term"] for r in tfidf_top_terms(df, k=2).collect()}
    assert out[(1, 1)] == "alpha" and out[(1, 2)] == "zeta"


# ---------------------------------------------------------------- bucketed join


def test_bucketed_join_plan_is_exchange_free(spark, sf_dir="/root/testdata/sf0.001"):
    from facematch_spark.operators.bucketed import bucketed_customer_order_stats

    # force the strategy question to be answered by bucketing, not broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_customer_order_stats(spark, sf_dir, n_buckets=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # neither Shuffle nor Broadcast
        # and the values equal the plain (shuffled) join + agg
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        expect = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_custkey", "c_mktsegment")
            .agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                    "sum_cents"
                ),
            )
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------- cube


def test_cube_metrics_grouping_sets(spark):
    import __spark_entry__ as e

    out = e.queries()["q_cube_metrics"](spark, "/root/testdata/sf0.001").collect()
    rows = {(r["priority"], r["yr"]): r for r in out}
    total = rows[("ALL", -1)]
    # the grand-total cell equals the sum over the finest cells
    fine = [r for (p, y), r in rows.items() if p != "ALL" and y != -1]
    assert total["n_orders"] == sum(r["n_orders"] for r in fine)
    assert total["sum_cents"] == sum(r["sum_cents"] for r in fine)
    # all four grouping-set shapes are present
    assert any(p == "ALL" and y != -1 for (p, y) in rows)
    assert any(p != "ALL" and y == -1 for (p, y) in rows)
