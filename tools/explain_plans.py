"""Dump formatted physical plans for the engine's key operators and grep
them for the properties that matter at 100 TB:

  * parquet scans carry PushedFilters / pruned ReadSchema (column pruning)
  * small dims go broadcast (BroadcastHashJoin), big self-joins stay
    shuffle-partitioned (SortMergeJoin/ShuffledHashJoin on the band key)
  * hot paths sit inside WholeStageCodegen spans
  * no Exchange appears twice in a row on the same keys (redundant shuffle)

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from facematch_spark.config import DedupeConfig  # noqa: E402
from facematch_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def summarize(name: str, df, expect: list[str] | None = None, forbid: list[str] | None = None) -> None:
    p = plan_of(df)
    n_exchange = len(re.findall(r"\bExchange\b", p))
    n_codegen = len(re.findall(r"WholeStageCodegen", p))
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", p)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    print(f"\n=== {name}")
    print(f"  exchanges={n_exchange} codegen_spans={n_codegen} joins={joins}")
    for pf in pushed[:3]:
        print(f"  PushedFilters: [{pf[:100]}]")
    for pat in expect or []:
        tag = "OK " if re.search(pat, p) else "MISS"
        print(f"  {tag} expect {pat}")
    for pat in forbid or []:
        tag = "BAD" if re.search(pat, p) else "OK "
        print(f"  {tag} forbid {pat}")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    # 1. filter + projection pushdown into the scan
    q = docs.filter(F.col("n_chars") > 300).select("doc_id", "n_chars")
    summarize("scan pushdown", q, expect=[r"PushedFilters: \[.*GreaterThan", r"ReadSchema: .*doc_id"])

    # 2. LSH candidate join: shuffle join on band key, no cartesian
    from facematch_spark.operators.dedup import doc_signatures
    from facematch_spark.operators.lsh import candidate_pairs

    cfg = DedupeConfig(jaccard_threshold=0.5)
    sigs = doc_signatures(docs, cfg)
    summarize(
        "LSH candidates", candidate_pairs(sigs, cfg),
        forbid=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    )

    # 3. exact jaccard shingle join
    from facematch_spark.operators.dedup import ngram_jaccard_pairs

    summarize("ngram jaccard", ngram_jaccard_pairs(docs, 9, 0.5), forbid=[r"CartesianProduct"])

    # 4. dim join should broadcast
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy("o_orderpriority").count()
    summarize("fact-dim join", j, expect=[r"BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"])

    # 5. brute-force cosine: broadcasted corpus (partition-local cross), window top-k
    from facematch_spark.operators.similarity import cosine_topk_bruteforce

    # the matmul runs in an Arrow mapInPandas stage over a broadcast corpus
    # matrix — the plan must contain NO join and NO exchange at all (queries
    # stay where they are; only the small corpus moves, via sc.broadcast)
    summarize(
        "cosine topk", cosine_topk_bruteforce(emb, emb, 3),
        expect=[r"MapInPandas"], forbid=[r"Join"],
    )

    # 6. top-k: TakeOrderedAndProject (limit pushed into sort)
    topk = li.orderBy(F.desc("l_extendedprice")).limit(5)
    summarize("global topk", topk, expect=[r"TakeOrderedAndProject"])

    # 7. containment: the gram build side must be pruned by a LEFT-SEMI join
    # against the distinct probe grams BEFORE the candidate join (round-3
    # fix — without it the build shuffle is proportional to total text
    # volume), and no cartesian anywhere
    from facematch_spark.operators.dedup import containment_pairs

    summarize(
        "containment", containment_pairs(docs, k=16),
        expect=[r"LeftSemi"], forbid=[r"CartesianProduct"],
    )

    # 8. multi-probe ANN: probe→home equi-join (shuffle or broadcast hash —
    # never a nested-loop/cartesian), window top-k stays a single exchange
    from facematch_spark.operators.similarity import ann_topk_lsh

    summarize(
        "ann multiprobe", ann_topk_lsh(emb, k=3, n_bits=4, n_tables=4),
        forbid=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    )

    # 9. stratified sample: pure per-row predicate — NO exchange, NO join,
    # whole plan one codegen span over the scan (round-5 map-only contract)
    from facematch_spark.operators.sampling import stratified_sample

    samp = stratified_sample(docs, {"en": 0.5, "fr": 0.25}, default_rate=0.05)
    summarize("stratified sample", samp, forbid=[r"Exchange", r"Join"])

    # 10. composed curation: representative election must stay a partial-agg
    # hash aggregate (max_by), never a window sort; no cartesian anywhere
    from facematch_spark.plans.curation import curate

    summarize(
        "curation pipeline",
        curate(docs, 9, 0.5, rates={"en": 0.5}, default_rate=0.05),
        expect=[r"HashAggregate.*max_by|max_by"],
        forbid=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    )

    # 11. cross-corpus decontamination: side-aware PPJoin — equi-join on the
    # shared shingle hash, never a cartesian/nested-loop across corpora
    from facematch_spark.operators.dedup import ngram_jaccard_pairs_between

    half_a = docs.filter("doc_id % 2 = 0")
    half_b = docs.filter("doc_id % 2 = 1")
    summarize(
        "cross-corpus pairs", ngram_jaccard_pairs_between(half_a, half_b, 9, 0.5),
        forbid=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    )

    # 12. as-of join: the union-sort-window form must have NO join node —
    # one exchange on the key, one sort, a window
    from facematch_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "user_id", "ts")
    summarize(
        "as-of join",
        asof_join(ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
                  payload={"o_orderkey": "m"}, tie_col="o_orderkey"),
        expect=[r"Window"],
        forbid=[r"SortMergeJoin", r"BroadcastHashJoin", r"ShuffledHashJoin",
                r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    )

    # 13. range join: binned decomposition — an equi-join (hash on _bin),
    # never a nested-loop over the raw range predicate
    from facematch_spark.operators.temporal import range_join_count

    summarize(
        "range join (binned)",
        range_join_count(ev.select("event_id", "ts"), ev.select("ts"), "ts", "ts", 300),
        expect=[r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"],
        forbid=[r"CartesianProduct", r"BroadcastNestedLoop"],
    )

    # 14. duplicate spans: equi-joins only; scan prunes to (doc_id, text)
    from facematch_spark.operators.dedup import duplicate_spans

    summarize(
        "duplicate spans",
        duplicate_spans(docs, k=30),
        expect=[r"ReadSchema: .*doc_id.*text|ReadSchema: .*text"],
        forbid=[r"CartesianProduct", r"BroadcastNestedLoop"],
    )

    # 15. KMV sketch: the prefilter must sit BEFORE the dedup exchange
    # (map-side hv < tau), joins on grp are broadcastable
    from facematch_spark.operators.sketch import kmv_distinct

    # the hv < τ prefilter folds into the grp-join's residual condition and
    # executes INSIDE the survivors localCheckpoint (eager at construction),
    # so the final plan only shows the post-checkpoint joins; static SMJs on
    # the tiny checkpointed group lists become broadcasts under AQE at
    # runtime (checkpointed RDDs carry no static stats)
    summarize(
        "kmv distinct sketch",
        kmv_distinct(orders, "o_orderpriority", "o_custkey", k=64),
        forbid=[r"CartesianProduct", r"BroadcastNestedLoop"],
    )

    # 16. PII redaction: pure map-only scan-side transform — no exchange,
    # no join, one codegen span
    from facematch_spark.operators.text import pii_redact

    summarize("pii redact", pii_redact(docs), forbid=[r"Exchange", r"Join"])

    # 17. bucketed co-located join: with broadcast off, join + same-key
    # groupBy must run with ZERO exchanges of any kind — the shuffles were
    # paid once, inside the bucketed write
    from facematch_spark.operators.bucketed import bucketed_customer_order_stats

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        summarize(
            "bucketed join",
            bucketed_customer_order_stats(spark, sf, n_buckets=8),
            expect=[r"SortMergeJoin"],
            forbid=[r"Exchange"],
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    # 18. CDC merge: the map-side-combinable hash-aggregate form — no
    # window sort, no join node (the anti-join shape would scan base twice)
    from facematch_spark.operators.merge import merge_upsert

    base = orders.select("o_orderkey", "o_orderstatus")
    ch = base.limit(10).select(
        "*", F.lit("U").alias("op"), F.lit(1).cast("long").alias("seq")
    )
    summarize(
        "merge upsert",
        merge_upsert(base, ch, "o_orderkey", check_unique=False),
        expect=[r"max_by"],
        forbid=[r"Window", r"SortMergeJoin", r"CartesianProduct"],
    )

    # 19. chunking: map-only, zero exchange, zero Python
    from facematch_spark.operators.text import chunk_documents

    summarize(
        "text chunk",
        chunk_documents(docs),
        forbid=[r"Exchange", r"Join", r"BatchEvalPython", r"ArrowEvalPython"],
    )

    # 20. interval overlap join: bin equi-join only — a naive overlap
    # predicate with no equi key would plan a nested-loop cartesian
    from facematch_spark.operators.temporal import interval_overlap_pairs

    events = spark.read.parquet(f"{sf}/events.parquet")
    iv = events.select(
        F.col("event_id").alias("iid"), F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 600 SECOND")).alias("end"),
    )
    summarize(
        "interval overlap join",
        interval_overlap_pairs(iv, iv, ["iid"], ["iid"], l_start="start",
                               l_end="end", r_start="start", r_end="end"),
        forbid=[r"CartesianProduct", r"BroadcastNestedLoop"],
    )

    # 21. salted equi-join: the physical join keys must include the salt
    # (that IS the mechanism — without it the hot key hashes to one reducer)
    from facematch_spark.operators.skew import salted_equi_join

    fact = events.select("event_id", "event_type", "value")
    dim = fact.select("event_type").distinct().select(
        "event_type", F.length("event_type").cast("long").alias("wt")
    )
    summarize(
        "salted equi-join",
        salted_equi_join(fact, dim, on="event_type", uniq_col="event_id"),
        expect=[r"_salt"],
        forbid=[r"CartesianProduct", r"BroadcastNestedLoop"],
    )

    # 22. fixed-n sample: the rank window must carry a partition spec (a
    # global ORDER BY window would be a single-task scale bug), and Spark's
    # WindowGroupLimit must fire MAP-SIDE — the rnk <= n filter is pushed
    # below the exchange, so only ~n rows per stratum per input partition
    # cross the shuffle (the docstring's prefilter advice made automatic)
    from facematch_spark.operators.sampling import fixed_n_sample

    summarize(
        "fixed-n sample",
        fixed_n_sample(docs.select("doc_id", "lang"), 30),
        expect=[r"WindowGroupLimit", r"hashpartitioning\(lang"],
        forbid=[r"SinglePartition", r"CartesianProduct"],
    )

    # 23. heavy-hitter report: TakeOrderedAndProject (top-k without a
    # global sort), map-side partial aggregation before the key shuffle
    from facematch_spark.operators.dedup import char_shingles
    from facematch_spark.operators.profile import hot_keys

    summarize(
        "hot keys",
        hot_keys(char_shingles(docs, 9), "shingle", top_k=20),
        expect=[r"TakeOrderedAndProject", r"partial_count"],
        forbid=[r"Exchange rangepartitioning"],  # no global sort
    )

    # 24. histogram: map-only binning after a broadcast of the 1-row
    # bounds — no shuffle of the fact rows except the |bins|-key agg
    from facematch_spark.operators.profile import equi_width_histogram

    summarize(
        "equi-width histogram",
        equi_width_histogram(orders, "o_totalprice", 12),
        expect=[r"BroadcastNestedLoopJoin|BroadcastHashJoin", r"partial_count"],
        forbid=[r"CartesianProduct", r"Exchange rangepartitioning"],
    )

    # 25. snowflake join (TPC-H Q5 shape): every dim broadcast, the date
    # filter pushed into the orders scan, no cartesian anywhere
    import __spark_entry__ as E

    summarize(
        "q5 snowflake join",
        E.queries()["q5_region_volume"](spark, sf),
        expect=[r"BroadcastHashJoin", r"GreaterThanOrEqual\(o_orderdate"],
        forbid=[r"CartesianProduct", r"BroadcastNestedLoop"],
    )

    # 26. partition-pruned layout: the 3-day filter resolves against
    # directory names at planning time (PartitionFilters), never a row scan
    summarize(
        "partition-pruned scan",
        E.queries()["q_partition_prune"](spark, sf),
        expect=[r"PartitionFilters: \[.*event_date"],
        forbid=[r"CartesianProduct"],
    )

    # 27. line dedup: no global sort, no cartesian; the reassembly groups
    # on doc_id (hashpartitioning), the detection on the line key
    summarize(
        "line-level corpus dedup",
        E.queries()["text_line_dedup"](spark, sf),
        expect=[r"hashpartitioning\(doc_id"],
        forbid=[r"CartesianProduct", r"Exchange rangepartitioning"],
    )

    # 28. snapshot diff: one full-outer join on the key over (key, hash)
    # projections — full rows never cross the exchange
    summarize(
        "snapshot diff",
        E.queries()["q_table_diff"](spark, sf),
        expect=[r"FullOuter", r"md5"],
        forbid=[r"CartesianProduct", r"BroadcastNestedLoop"],
    )

    # 29. rolling time-range window: frame rides one hash exchange on the
    # key; no global sort
    summarize(
        "rolling 30d window",
        E.queries()["q_rolling_window"](spark, sf),
        expect=[r"hashpartitioning\(o_custkey", r"RangeFrame, -2592000"],
        forbid=[r"Exchange rangepartitioning", r"CartesianProduct"],
    )

    spark.stop()


if __name__ == "__main__":
    main()
