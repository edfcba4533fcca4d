"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-dup pipeline on sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2 +
the training-data-pipeline suites); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-runnable ANSI SQL twins; since round 3 EVERY
queries() entry has one (approximate ops ship as verified-recall reports
whose per-query exact values the oracle recomputes with its own SQL, and
the hash-family SimHash variant is SQL-reproducible end to end).

Column names are aligned pairwise (driver hashes values after sorting
columns by name). Float outputs are rounded identically on both sides;
integer-ratio doubles (Jaccard) are bit-exact by IEEE semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from facematch_spark.config import DedupeConfig

# documents-table dedup config: char 9-grams over raw text, threshold 0.5
# (25 planted near-dup pairs at sf0.01).
K = 9
JT = 0.5
TK = 3  # token-shingle width for the token-mode Jaccard query
SPAN_K = 30  # duplicate-span window width (chars) — Lee et al. use 50 BPE
# tokens on web text; 30 chars fits the short fixture docs (median ~300)
DOC_CFG = DedupeConfig(jaccard_threshold=JT, normalize=True)
# stratified-sampling rates for q_sample_stratified (es/de fall through to
# the default, exercising the otherwise-branch of the threshold CASE)
SAMPLE_RATES = {"en": 0.5, "fr": 0.25, "zh": 0.1}
SAMPLE_DEFAULT_RATE = 0.05
# leakage-safe split fractions (q_curation_split) and fixed-n sample size
SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
FIXED_N = 30


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Session-scoped LAZY-READER cache: ``spark.read.parquet`` lists the
    # path and reads the footer schema on every call (~80 ms here), and a
    # full bench issues ~100 of them for the same handful of tables.
    # Cached is the unmaterialized DataFrame (a plan + resolved schema) —
    # NOT data, NOT results: every action still scans the parquet input.
    # Keyed on the session object so a new/restarted session never sees a
    # stale relation.
    cache = getattr(spark, "_fm_table_cache", None)
    if cache is None:
        cache = {}
        spark._fm_table_cache = cache
    key = (sf_dir, name)
    if key not in cache:
        cache[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return cache[key]


def _ann_recall_report(
    spark: SparkSession,
    emb: DataFrame,
    build_ann,
    gate: float,
    max_queries: int = 20_000,
) -> DataFrame:
    """Recall@1 verification for an approximate top-k result: a query scores
    a hit when the EXACT brute-force nearest neighbor appears anywhere in its
    approximate top-k. Returns one row PER evaluated query —
    ``(query_id, true_nn, recall_pass)`` — where ``true_nn`` is the exact
    brute-force nearest neighbor (bit-reproducible by the DuckDB oracle's own
    exact-NN SQL, so the oracle verifies real values, not a trivial count)
    and ``recall_pass`` is the GLOBAL ``recall@1 ≥ gate`` verdict repeated on
    every row: a recall regression flips the column everywhere and fails the
    value hash. (Per-row hit flags can't be oracled — DuckDB cannot rerun the
    approximate path — so the contract bit is global by design.)

    The exact twin is O(n_queries × N): above ``max_queries`` the evaluation
    SAMPLES queries deterministically (order by md5(vec_id), limit — seedless
    and SQL-reproducible) so the verification harness stays affordable at
    large corpora; recall estimation doesn't need every query. The ANN index
    itself always builds over the FULL corpus.

    ``build_ann`` is a callable(emb) -> top-k DataFrame, invoked on the
    CACHED embeddings, and its (tiny) result is localCheckpointed before the
    hit join: without the cut the whole ANN DAG re-executes inside the
    semi-join with its higher-order cosine expressions duplicated across
    operators by projection collapse (measured 163 s vs 15 s at sf0.1)."""
    from facematch_spark.operators.similarity import cosine_topk_bruteforce

    emb = emb.cache()
    n = emb.count()
    ann = build_ann(emb).localCheckpoint()
    queries_df = emb
    if n > max_queries:
        queries_df = (
            emb.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
            .orderBy("_h", "vec_id")
            .limit(max_queries)
            .drop("_h")
        )
    truth = cosine_topk_bruteforce(queries_df, emb, k=1).select(
        "query_id", F.col("neighbor_id").alias("true_nn")
    ).localCheckpoint()
    n_q = truth.count()
    hits = truth.join(
        ann,
        (truth.query_id == ann.query_id) & (truth.true_nn == ann.neighbor_id),
        "left_semi",
    ).count()
    emb.unpersist()
    return truth.withColumn(
        "recall_pass", F.lit(bool(hits / max(n_q, 1) >= gate))
    )


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact near-dup dataflow over the sf0.001 documents corpus —
    PPJoin-filtered n-gram Jaccard pairs (``ngram_jaccard_pairs``: prefix +
    length + positional filters, all lossless) → union-find clustering;
    returns verified near-dup pairs with their cluster ids. The
    MinHash/LSH approximation of the same pipeline is exercised by the
    ``dedup_minhash_lsh`` query and the scaling bench."""
    from facematch_spark.operators.cluster import connected_components
    from facematch_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    pairs = ngram_jaccard_pairs(docs, K, JT).localCheckpoint()
    clusters = connected_components(pairs.select("id_a", "id_b"))
    lab = clusters.withColumnRenamed("file_id", "id_a").withColumnRenamed("cluster_id", "cluster")
    return pairs.join(lab, "id_a").select("id_a", "id_b", "jaccard", "cluster")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- generic relational operators (SURVEY.md §2.1-2.8) ----

    def q1_pricing_summary(spark, sf):
        # TPC-H Q1 shape: scan → filter → groupBy 2 cols → multi-agg → sort.
        li = _t(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)), 2).alias("revenue"),
                F.count("*").cast("long").alias("count_order"),
                F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
            )
        )
    q["q1_pricing_summary"] = q1_pricing_summary

    def q3_top_orders(spark, sf):
        # 3-way join (broadcast dims) → agg → top-10 (TakeOrderedAndProject).
        cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderkey")
            .agg(F.round(F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10)
        )
    q["q3_top_orders"] = q3_top_orders

    def q_topk_per_group(spark, sf):
        # window top-k per group (W1/W2 analog: ranking, utils.py:270-298).
        from pyspark.sql import Window as W

        cust = _t(spark, sf, "customer")
        w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        return (
            cust.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), F.col("rank").cast("int").alias("rank"))
        )
    q["q_topk_per_group"] = q_topk_per_group

    def q_anti_join(spark, sf):
        # left-anti (J2/U2 analog: incremental resume skip, utils.py:178-186).
        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        return (
            orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
            .select("o_orderkey", "o_orderstatus")
        )
    q["q_anti_join"] = q_anti_join

    def q_semi_join(spark, sf):
        # left-semi (EXISTS) + agg.
        part = _t(spark, sf, "part")
        li = _t(spark, sf, "lineitem")
        return (
            part.join(li, part.p_partkey == li.l_partkey, "left_semi")
            .groupBy("p_brand")
            .agg(F.count("*").cast("long").alias("n_parts"))
        )
    q["q_semi_join"] = q_semi_join

    def q_union_distinct(spark, sf):
        # set ops (U1/U3 analog).
        c = _t(spark, sf, "customer").select(F.col("c_nationkey").cast("int").alias("nationkey"))
        s = _t(spark, sf, "supplier").select(F.col("s_nationkey").cast("int").alias("nationkey"))
        return c.union(s).distinct()
    q["q_union_distinct"] = q_union_distinct

    def q_window_running(spark, sf):
        # running aggregate window (O1 analog: ordered accumulation).
        from pyspark.sql import Window as W

        orders = _t(spark, sf, "orders")
        w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        return orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum(F.round("o_totalprice", 4)).over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias("running_total"),
            F.row_number().over(w).cast("int").alias("order_seq"),
        )
    q["q_window_running"] = q_window_running

    def q_agg_stats(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
            F.round(F.avg("value"), 4).alias("avg_v"),
        )
    q["q_agg_stats"] = q_agg_stats

    def q_rollup_counts(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").cast("long").alias("n"))
            .select(
                F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                "n",
            )
        )
    q["q_rollup_counts"] = q_rollup_counts

    def q_cube_metrics(spark, sf):
        # full CUBE over (priority, order-year): all four grouping sets in
        # one pass (Expand), the other half of the GROUPING SETS family next
        # to q_rollup_counts. Money sums in integer cents — exact at any
        # accumulation order, so the value hash is stable by construction.
        o_ = _t(spark, sf, "orders").withColumn(
            "yr", F.year("o_orderdate").cast("long")
        )
        return (
            o_.cube("o_orderpriority", "yr")
            .agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("long")
                ).alias("sum_cents"),
            )
            .select(
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                F.coalesce(F.col("yr"), F.lit(-1)).alias("yr"),
                "n_orders",
                "sum_cents",
            )
        )
    q["q_cube_metrics"] = q_cube_metrics

    def q_bucketed_join(spark, sf):
        # bucketed co-located join: both sides written bucketed by the join
        # key once, then join + same-key groupBy run with ZERO exchanges
        # (plan-asserted in tests/tools). The entry returns the per-customer
        # stats; the oracle joins the raw tables directly.
        from facematch_spark.operators.bucketed import bucketed_customer_order_stats

        return bucketed_customer_order_stats(spark, sf, n_buckets=8)
    q["q_bucketed_join"] = q_bucketed_join

    def q_sessionize(spark, sf):
        # sessionization: lag-gap + running session counter per user (the
        # batch form of session_window; guide "Common OLAP patterns").
        from pyspark.sql import Window as W

        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        gap = us - F.lag(us).over(w)
        with_new = ev.withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
        )
        sess = with_new.withColumn(
            "session_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
        return sess.groupBy("user_id").agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.count("*").cast("long").alias("n_events"),
        )
    q["q_sessionize"] = q_sessionize

    def q_pivot_daily(spark, sf):
        # pivot: event_type columns × day rows (counts). The pivot column set
        # is the STATIC testdata taxonomy (TESTDATA.md events generator) —
        # passing it explicitly avoids the extra distinct-collect job Spark
        # otherwise runs to infer pivot values (a driver round-trip in an
        # entry query), and keeps the output schema fixed, matching the
        # oracle's hardcoded FILTER columns.
        types = ["click", "error", "purchase", "signup", "view"]
        ev = _t(spark, sf, "events")
        return (
            ev.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
            .groupBy("day")
            .pivot("event_type", types)
            .count()
            .na.fill(0)
        )
    q["q_pivot_daily"] = q_pivot_daily

    def q_events_hourly(spark, sf):
        # event-time tumbling window, batch form (streaming twin below).
        from facematch_spark.streaming.incremental import windowed_event_counts

        ev = _t(spark, sf, "events")
        out = windowed_event_counts(ev)
        return out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    q["q_events_hourly"] = q_events_hourly

    def q_asof_join(spark, sf):
        # backward as-of join (events ← most recent order of the same
        # customer at event time) via the union-sort-window form — no join
        # node, one shuffle; ties on order date break to max orderkey.
        from facematch_spark.operators.temporal import asof_join

        ev = _t(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
        return asof_join(
            ev,
            _t(spark, sf, "orders"),
            "user_id",
            "o_custkey",
            "ts",
            "o_orderdate",
            payload={
                "o_orderkey": "matched_orderkey",
                "o_orderdate": "matched_orderdate",
                "o_totalprice": "matched_totalprice",
            },
            tie_col="o_orderkey",
        )
    q["q_asof_join"] = q_asof_join

    def q_range_join(spark, sf):
        # keyless point-interval range join: per event, count events in the
        # strictly-preceding 5-minute window, via the 2-probe binned
        # equi-join decomposition (exact residual on full timestamps).
        from facematch_spark.operators.temporal import range_join_count

        ev = _t(spark, sf, "events").select("event_id", "ts")
        return range_join_count(ev, ev, "ts", "ts", 300, out_col="n_prev_5min")
    q["q_range_join"] = q_range_join

    def q_scd2_history(spark, sf):
        # SCD type-2 history build from a change log: each key's versions get
        # [valid_from, valid_to) intervals via lead() — ONE key shuffle, one
        # per-key sort; the open (current) version carries a null valid_to.
        # With merge_upsert and asof_join this completes the CDC/warehouse
        # triplet (apply changes / build history / query history as-of).
        from pyspark.sql import Window as W

        orders = _t(spark, sf, "orders")
        w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        return orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version"),
            F.lead("o_orderdate").over(w).isNull().alias("is_current"),
        )
    q["q_scd2_history"] = q_scd2_history

    def q_merge_upsert(spark, sf):
        # CDC MERGE INTO semantics over immutable parquet (update matched /
        # delete tombstoned / insert new, latest-change-wins) — ONE map-side-
        # combinable shuffle, no window sort (operators/merge.py). The change
        # batch is derived deterministically from orders so the DuckDB twin
        # can rebuild it verbatim; money as integer cents so values are exact.
        from facematch_spark.operators.merge import merge_upsert

        base = _t(spark, sf, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderpriority",
        )
        k = F.col("o_orderkey")
        updates = base.filter(k % 10 == 0).select(
            "o_orderkey",
            "o_custkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("cents") + 100).alias("cents"),
            "o_orderpriority",
            F.lit("U").alias("op"),
            F.lit(1).cast("long").alias("seq"),
        )
        deletes = base.filter((k % 10 != 0) & (k % 17 == 3)).select(
            "*", F.lit("D").alias("op"), F.lit(1).cast("long").alias("seq")
        )
        inserts = base.filter(k % 100 == 7).select(
            (k + 10_000_000).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "cents",
            "o_orderpriority",
            F.lit("U").alias("op"),
            F.lit(1).cast("long").alias("seq"),
        )
        changes = updates.unionByName(deletes).unionByName(inserts)
        return merge_upsert(base, changes, "o_orderkey")
    q["q_merge_upsert"] = q_merge_upsert

    def q_interval_join(spark, sf):
        # interval×interval overlap join, no equi key: per user session
        # (30-min-gap sessionization → [min ts, max ts] span), count OTHER
        # users' sessions overlapping it. Lossless bin decomposition for any
        # bin width (operators/temporal.py interval_overlap_pairs); sessions
        # feed both join sides, so the relation is checkpointed once.
        from pyspark.sql import Window as W

        from facematch_spark.operators.temporal import interval_overlap_pairs

        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        gap = us - F.lag(us).over(w)
        sess = (
            ev.withColumn(
                "new_sess", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
            )
            .withColumn(
                "session_id",
                F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
            )
            .groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
            .localCheckpoint()
        )
        pairs = interval_overlap_pairs(
            sess, sess, ["user_id", "session_id"], ["user_id", "session_id"],
            l_start="s_start", l_end="s_end", r_start="s_start", r_end="s_end",
            bin_s=3600,
        ).filter(F.col("l_user_id") != F.col("r_user_id"))
        counts = pairs.groupBy("l_user_id", "l_session_id").agg(
            F.count("*").cast("long").alias("n_overlap")
        )
        return (
            sess.join(
                counts,
                (sess.user_id == counts.l_user_id) & (sess.session_id == counts.l_session_id),
                "left",
            )
            .select(
                "user_id",
                "session_id",
                F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
            )
        )
    q["q_interval_join"] = q_interval_join

    def text_chunk(spark, sf):
        # fixed-size overlapping character chunking (LLM pre-tokenization) —
        # map-only explode(sequence)+substring, zero shuffle, zero Python.
        from facematch_spark.operators.text import chunk_documents

        return chunk_documents(_t(spark, sf, "documents"), size=256, stride=200)
    q["text_chunk"] = text_chunk

    def q_shard_plan(spark, sf):
        # output-shard planning via the two-pass DISTRIBUTED prefix sum
        # (operators/shard.py) — no single-reducer global window anywhere;
        # only the (key, bytes) projection enters the operator, so the
        # pinned pid relation never carries document payloads.
        from facematch_spark.operators.shard import shard_plan

        docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        return shard_plan(docs, "doc_id", "n_chars", target_bytes=4096)
    q["q_shard_plan"] = q_shard_plan

    def streaming_event_counts(spark, sf):
        # the SAME aggregation executed by the Structured Streaming engine
        # (availableNow trigger → memory sink), proving the streaming path.
        from facematch_spark.streaming.incremental import run_streaming_event_counts

        out = run_streaming_event_counts(spark, f"{sf}/events.parquet")
        return out.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    q["streaming_event_counts"] = streaming_event_counts

    def dedup_within_doc_spans(spark, sf):
        # within-document repeated-substring spans (closes duplicate_spans'
        # documented cross-doc-only delta vs Lee et al.'s suffix-array form);
        # clean docs never position-explode (distinct-vs-position prefilter).
        from facematch_spark.operators.dedup import within_doc_repeated_spans

        return within_doc_repeated_spans(_t(spark, sf, "documents"), k=20)
    q["dedup_within_doc_spans"] = dedup_within_doc_spans

    def text_pack_plan(spark, sf):
        # sequence packing for training: chunks (in global doc/chunk order)
        # greedily packed into fixed-token-budget sequences — chunking +
        # whitespace token estimate + the distributed prefix sum; no
        # single-reducer window anywhere.
        from facematch_spark.operators.shard import shard_plan
        from facematch_spark.operators.text import chunk_documents, tokens_col

        chunks = chunk_documents(_t(spark, sf, "documents"), size=256, stride=200)
        with_tok = chunks.select(
            "doc_id",
            "chunk_id",
            F.size(tokens_col("chunk_text")).cast("long").alias("n_tokens"),
        )
        packed = shard_plan(with_tok, ["doc_id", "chunk_id"], "n_tokens", target_bytes=512)
        return packed.select(
            "doc_id",
            "chunk_id",
            "n_tokens",
            F.col("cum_bytes").alias("cum_tokens"),
            F.col("shard_id").alias("seq_id"),
        )
    q["text_pack_plan"] = text_pack_plan

    def q_temperature_sample(spark, sf):
        # temperature-balanced multilingual resampling (XLM-R/mT5 mix):
        # rarest language keeps 100%, others keep (n_min/n_l)^(1-alpha);
        # alpha=0.5 so the rate is one correctly-rounded sqrt — bit-identical
        # in any IEEE engine, hence value-hash-oracle-able.
        from facematch_spark.operators.sampling import temperature_sample

        docs = _t(spark, sf, "documents").select("doc_id", "lang")
        return temperature_sample(docs, alpha=0.5).select(
            "doc_id", "lang", "sample_key"
        )
    q["q_temperature_sample"] = q_temperature_sample

    def streaming_join_attrib(spark, sf):
        # stream-stream time-bounded inner join under the actual streaming
        # engine (both sides watermarked; state bounded by the horizon) —
        # error events attributed to same-user clicks in the preceding day.
        from facematch_spark.streaming.incremental import streaming_click_error_join

        return streaming_click_error_join(spark, f"{sf}/events.parquet")
    q["streaming_join_attrib"] = streaming_join_attrib

    def q_profile(spark, sf):
        # single-pass per-column profiler (nulls / exact distinct / min /
        # max) — the screen a pipeline runs on a new drop before anything
        # else; one scan, Expand-planned distinct aggregates.
        from facematch_spark.operators.profile import profile_table

        return profile_table(_t(spark, sf, "documents"))
    q["q_profile"] = q_profile

    def q_percentiles(spark, sf):
        # exact interpolated percentiles (Spark `percentile` ==
        # DuckDB `quantile_cont` bit-for-bit — probed, not assumed).
        # Scale note: exact percentile buffers per-group value counts on
        # the reducer — right up to ~10^8 distinct values/group; past that
        # the engine path is approx_percentile(ε) (deterministic
        # GK-sketch, but not SQL-twin-able) — documented tradeoff.
        li = _t(spark, sf, "lineitem")
        p = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
        return (
            li.groupBy("l_returnflag")
            .agg(p.alias("ps"), F.count("*").cast("long").alias("n_rows"))
            .select(
                "l_returnflag",
                F.col("ps")[0].alias("p50"),
                F.col("ps")[1].alias("p90"),
                F.col("ps")[2].alias("p99"),
                "n_rows",
            )
        )
    q["q_percentiles"] = q_percentiles

    def q_distinct_sketch(spark, sf):
        # KMV k-minimum-values distinct-count sketch (deterministic, unlike
        # HLL — hence SQL-oracle-able): per order priority, estimate the
        # distinct customer count (k=64, ~12.5% theoretical error) next to
        # the exact count. The operator's adaptive map-side prefilter is
        # output-identical to this textbook form by construction.
        from facematch_spark.operators.sketch import kmv_distinct

        orders = _t(spark, sf, "orders")
        est = kmv_distinct(orders, "o_orderpriority", "o_custkey", k=64)
        exact = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
            F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
        )
        return est.join(exact, "grp").select(
            F.col("grp").alias("o_orderpriority"), "est_distinct", "exact_distinct"
        )
    q["q_distinct_sketch"] = q_distinct_sketch

    def streaming_dedup_fps(spark, sf):
        # streaming exact-dedup under the REAL engine: document stream →
        # md5 fingerprint → state-store dropDuplicates → append sink; row
        # set == batch DISTINCT (deterministic because only the key is
        # projected).
        from facematch_spark.streaming.incremental import streaming_exact_dedup

        return streaming_exact_dedup(spark, f"{sf}/documents.parquet")
    q["streaming_dedup_fps"] = streaming_dedup_fps

    # ---- dedup suite over documents (the engine's core, §2.2-2.4/2.10) ----

    def dedup_exact_groups(spark, sf):
        from facematch_spark.operators.dedup import exact_duplicates

        return exact_duplicates(_t(spark, sf, "documents"))
    q["dedup_exact_groups"] = dedup_exact_groups

    def dedup_ngram_jaccard(spark, sf):
        # exact char-9-gram Jaccard pairs ≥ 0.5 via distributed shingle
        # equi-join — the recall oracle for the LSH path.
        from facematch_spark.operators.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(_t(spark, sf, "documents"), K, JT)
    q["dedup_ngram_jaccard"] = dedup_ngram_jaccard

    def dedup_ngram_jaccard_token(spark, sf):
        # exact 3-TOKEN-shingle Jaccard pairs ≥ 0.5 — same PPJoin pipeline,
        # token shingle mode (whitespace tokens joined by single spaces).
        from facematch_spark.operators.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(_t(spark, sf, "documents"), TK, JT, shingle_kind="token")
    q["dedup_ngram_jaccard_token"] = dedup_ngram_jaccard_token

    def dedup_clusters(spark, sf):
        # distributed union-find over the exact-Jaccard edge relation.
        from facematch_spark.operators.dedup import dedup_clusters as dc

        return dc(_t(spark, sf, "documents"), K, JT)
    q["dedup_clusters"] = dedup_clusters

    def dedup_containment(spark, sf):
        # substring containment dups (suffix path) via prefix-gram join.
        from facematch_spark.operators.dedup import containment_pairs

        return containment_pairs(_t(spark, sf, "documents"), k=16)
    q["dedup_containment"] = dedup_containment

    def dedup_minhash_lsh(spark, sf):
        # scale path with exact verification: MinHash → banding LSH
        # candidates → exact Jaccard over the same shingle kernels →
        # threshold. SQL-oracle-able: candidate recall is 1.0 at this
        # corpus/config (deterministic seed; miss prob (1-j⁴)³² ≈ 6e-20 at
        # the planted-dup Jaccard ≥ 0.92), so output equals the brute-force
        # normalized-Jaccard join. The estimate-only variant
        # (minhash_lsh_pairs) stays recall-gated in pytest.
        from facematch_spark.operators.dedup import minhash_lsh_exact_pairs

        return minhash_lsh_exact_pairs(_t(spark, sf, "documents"), DOC_CFG)
    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def report_top_edges(spark, sf):
        # report path (S7/S8/W2/O2/O3): deterministic top-5/bottom-5 edge
        # rows over the exact n-gram-Jaccard pair relation — the same rows
        # the HTML/CSV report sinks render (report.py), in oracle-checkable
        # DataFrame form.
        from facematch_spark.operators.dedup import ngram_jaccard_pairs
        from facematch_spark.report import top_bottom_edges_df

        pairs = ngram_jaccard_pairs(_t(spark, sf, "documents"), K, JT)
        return top_bottom_edges_df(pairs, edges=5)
    q["report_top_edges"] = report_top_edges

    def dedup_simhash(spark, sf):
        # SimHash Hamming-ball pairs (radius 8) via pigeonhole chunk join —
        # md5 hash family, so the WHOLE operator is SQL-reproducible and
        # DuckDB-oracled. The xxhash-kernel variant (simhash_pairs) is the
        # pipeline fast path, recall-gated ≥1.0-within-radius in pytest.
        from facematch_spark.operators.dedup import simhash_md5_pairs

        return simhash_md5_pairs(_t(spark, sf, "documents"), k=K, hamming_max=8)
    q["dedup_simhash"] = dedup_simhash

    def dedup_duplicate_spans(spark, sf):
        # exact-substring duplicate SPANS (Lee et al. 2022 shape): maximal
        # per-doc char intervals covered by 30-char windows that also occur
        # in another document — the "cut the span, keep the doc" manifest.
        from facematch_spark.operators.dedup import duplicate_spans

        return duplicate_spans(_t(spark, sf, "documents"), k=SPAN_K)
    q["dedup_duplicate_spans"] = dedup_duplicate_spans

    def dedup_span_stats(spark, sf):
        # the trainer-facing manifest over the spans: per doc, duplicated
        # chars / fraction and a keep/cut/drop action (drop ≥ 0.8).
        from facematch_spark.operators.dedup import duplicate_span_stats

        return duplicate_span_stats(_t(spark, sf, "documents"), k=SPAN_K)
    q["dedup_span_stats"] = dedup_span_stats

    # ---- text analysis suite ----

    def text_token_count(spark, sf):
        from facematch_spark.operators.text import token_count

        return token_count(_t(spark, sf, "documents"))
    q["text_token_count"] = text_token_count

    def text_quality(spark, sf):
        from facematch_spark.operators.text import quality_score

        return quality_score(_t(spark, sf, "documents"))
    q["text_quality"] = text_quality

    def text_langid(spark, sf):
        from facematch_spark.operators.text import lang_id

        return lang_id(_t(spark, sf, "documents"))
    q["text_langid"] = text_langid

    def text_fingerprint(spark, sf):
        from facematch_spark.operators.text import fingerprint

        return fingerprint(_t(spark, sf, "documents"))
    q["text_fingerprint"] = text_fingerprint

    def text_repetition(spark, sf):
        # Gopher-style repetition screens (Rae et al. 2021 A1.1): top-2/3-
        # gram char fraction, duplicated-2-gram char mass, duplicated-token
        # fraction — the standard pre-training repetition filter family.
        from facematch_spark.operators.text import repetition_scores

        return repetition_scores(_t(spark, sf, "documents"))
    q["text_repetition"] = text_repetition

    def text_pii_redact(spark, sf):
        # PII scrubbing (C4/Dolma-style anonymization). The fixture corpus
        # deliberately contains no PII-shaped strings (verified: zero digit
        # runs), so the entry PLANTS deterministic PII per doc — 1-2 emails,
        # one IPv4, a phone on every third doc, via expressions the oracle
        # reproduces verbatim — then proves the scrubber removes it (counts
        # + redacted text + fingerprint are all value-hashed).
        from facematch_spark.operators.text import pii_redact

        docs = _t(spark, sf, "documents")
        did = F.col("doc_id").cast("string")
        planted = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" contact u"), did, F.lit("@ex-a.io"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(F.lit(" cc u"), did, F.lit("b@ex-b.org")),
                ).otherwise(F.lit("")),
                F.lit(" ip 10.1."), (F.col("doc_id") % 254).cast("string"), F.lit(".7"),
                F.when(F.col("doc_id") % 3 == 0, F.lit(" tel 555-123-4567")).otherwise(
                    F.lit("")
                ),
            ).alias("text"),
        )
        return pii_redact(planted)
    q["text_pii_redact"] = text_pii_redact

    def text_tfidf(spark, sf):
        # per-doc top-3 salient terms by TF-IDF (tf × ln(N/df), ties term-asc)
        # — the standard cheap salience/keyword extraction over a corpus.
        from facematch_spark.operators.text import tfidf_top_terms

        return tfidf_top_terms(_t(spark, sf, "documents"), k=3)
    q["text_tfidf"] = text_tfidf

    # ---- similarity search over embeddings ----

    def ann_cosine_topk(spark, sf):
        from facematch_spark.operators.similarity import cosine_topk_bruteforce

        emb = _t(spark, sf, "embeddings")
        return cosine_topk_bruteforce(emb, emb, k=3)
    q["ann_cosine_topk"] = ann_cosine_topk

    def ann_lsh_topk(spark, sf):
        # LSH-bucketed ANN (random hyperplanes, corpus-scaled n_bits) as a
        # VERIFIED-RECALL report: the approximate path runs against the exact
        # brute-force top-1 twin and the query returns one (query_id,
        # true_nn, recall_pass) row per query — the oracle recomputes
        # true_nn exactly, and the driver turns red if LSH recall@1 ever
        # drops below the 0.9 contract.
        from facematch_spark.operators.similarity import ann_topk_lsh

        emb = _t(spark, sf, "embeddings")
        return _ann_recall_report(
            spark, emb, lambda e: ann_topk_lsh(e, k=3, n_bits=None, n_tables=8), gate=0.9
        )
    q["ann_lsh_topk"] = ann_lsh_topk

    def ann_ivf_topk(spark, sf):
        # IVF coarse-quantizer ANN (inverted lists + n_probe), same
        # verified-recall report shape as ann_lsh_topk. n_lists=None so the
        # entry path exercises the operator's own ~√N list-count scaling
        # (a pinned small constant here would hide the scale default from
        # the recall gate — the round-2 ann-lsh n_bits lesson). n_probe is
        # the recall/cost knob and stays explicit: this fixture's embeddings
        # are only weakly clustered (near-random — IVF's worst case), so the
        # 0.9 recall contract needs probing 14 of the ~√N=22 lists (measured
        # recall@1 0.958; 6 probes → 0.72). On real embedding corpora with
        # genuine cluster structure a much smaller fixed n_probe reaches the
        # same recall, which is where IVF's √N per-query cost comes from.
        from facematch_spark.operators.similarity import ann_topk_ivf

        emb = _t(spark, sf, "embeddings")
        return _ann_recall_report(
            spark, emb, lambda e: ann_topk_ivf(e, k=3, n_lists=None, n_probe=14), gate=0.9
        )
    q["ann_ivf_topk"] = ann_ivf_topk

    def dedup_embedding_cosine(spark, sf):
        # embedding-cosine near-dup pairs: every unordered pair with
        # round(cosine, 6) >= 0.3 — EXACT (gated broadcast matmul), the
        # recall oracle for embedding_near_dup_pairs_lsh (the LSH-bucketed
        # scale path, recall-gated >= 0.99 on planted near-dups in pytest).
        # The fixture's embeddings are near-orthogonal (max pairwise cosine
        # ~0.51 at every SF), so the threshold sits at 0.3 to exercise a
        # real ~1k-pair result the oracle value-hashes; production near-dup
        # thresholds (0.9+) are a parameter, not a different code path.
        from facematch_spark.operators.similarity import embedding_near_dup_pairs

        emb = _t(spark, sf, "embeddings")
        return embedding_near_dup_pairs(emb, threshold=0.3)
    q["dedup_embedding_cosine"] = dedup_embedding_cosine

    # ---- training-data curation (engine additions) ----

    def dedup_representatives(spark, sf):
        # the keep/drop manifest: per exact-Jaccard duplicate cluster, elect
        # one representative (longest doc, ties to min doc_id) and report
        # the cluster size — one row per cluster, singletons included.
        from facematch_spark.operators.dedup import cluster_representatives

        return cluster_representatives(_t(spark, sf, "documents"), K, JT)
    q["dedup_representatives"] = dedup_representatives

    def q_sample_stratified(spark, sf):
        # deterministic per-language sampling: membership is a pure per-row
        # hash predicate (map-only, no shuffle) — reproducible across runs,
        # partitionings and engines, consistent under corpus growth, and
        # nested across rates (0.1 ⊂ 0.25 at the same salt).
        from facematch_spark.operators.sampling import stratified_sample

        return stratified_sample(
            _t(spark, sf, "documents"), SAMPLE_RATES, default_rate=SAMPLE_DEFAULT_RATE
        )
    q["q_sample_stratified"] = q_sample_stratified

    def q5_region_volume(spark, sf):
        # TPC-H Q5 shape: a 6-table snowflake (fact lineitem + orders,
        # dims customer/supplier/nation/region) — the declared join graph
        # lets Catalyst reorder the tree and broadcast every dim; revenue is
        # summed in integer 1e-4-dollar units (price-cents × discount
        # complement in percent) so the result is exact under ANY
        # accumulation order — float sums would hash-flicker vs DuckDB.
        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        s = _t(spark, sf, "supplier")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        rev = (
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long"))
        )
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(
                s,
                (F.col("l_suppkey") == F.col("s_suppkey"))
                & (F.col("c_nationkey") == F.col("s_nationkey")),
            )
            .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
            .filter(
                (F.col("r_name") == "ASIA")
                & (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            )
            .groupBy("n_name")
            .agg(F.sum(rev).alias("revenue_e4"))
        )
    q["q5_region_volume"] = q5_region_volume

    def dedup_cluster_stats(spark, sf):
        # the dedup summary a corpus report leads with: the cluster-size
        # distribution (how many singletons, pairs, k-plexes) — two
        # |clusters|-row aggregations past the clustering itself.
        from facematch_spark.operators.dedup import dedup_clusters

        clusters = dedup_clusters(_t(spark, sf, "documents"), K, JT)
        sizes = clusters.groupBy("cluster_id").agg(
            F.count("*").alias("cluster_size")
        )
        return sizes.groupBy("cluster_size").agg(
            F.count("*").alias("n_clusters")
        )
    q["dedup_cluster_stats"] = dedup_cluster_stats

    def streaming_enrich_counts(spark, sf):
        # stream-static join under the real engine: event stream × broadcast
        # static dim, then exact-integer aggregation in complete mode — the
        # enrichment shape production streams run against slowly-changing
        # dimensions; equals the batch join+agg bit-for-bit.
        from facematch_spark.streaming.incremental import streaming_static_enrich

        return streaming_static_enrich(spark, f"{sf}/events.parquet")
    q["streaming_enrich_counts"] = streaming_enrich_counts

    def text_line_dedup(spark, sf):
        # C4/CCNet line-level boilerplate scrub. The fixture is single-line,
        # so the entry PLANTS a deterministic multi-line shape (the
        # text_pii_redact pattern): a license header on even docs, a
        # generator banner on every third doc, the doc's own text (which the
        # fixture genuinely duplicates across docs — those lines are removed
        # too, the real dedup at work), and a unique signature line that
        # must always survive.
        from facematch_spark.operators.text import line_dedup

        docs = _t(spark, sf, "documents")
        planted = docs.select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.when(F.col("doc_id") % 2 == 0, F.lit("license: apache-2.0")),
                F.when(F.col("doc_id") % 3 == 0, F.lit("generated by fm-gen v1")),
                F.col("text"),
                F.concat(F.lit("sig "), F.md5(F.col("doc_id").cast("string"))),
            ).alias("text"),
        )
        return line_dedup(planted, min_docs=2)
    q["text_line_dedup"] = text_line_dedup

    def q_corpus_shuffle(spark, sf):
        # deterministic global training shuffle: epoch order = rank in the
        # md5-keyed total order. Rank is the distributed prefix sum
        # (shard_plan over 1-byte rows — cum_bytes IS the rank), never a
        # global ORDER BY window (single-task at scale); shard_id = the
        # 100-doc epoch file the row lands in. Same salt-keyed determinism
        # contract as the samplers: reproducible, partition-invariant.
        from facematch_spark.operators.shard import shard_plan

        docs = _t(spark, sf, "documents").select(
            "doc_id",
            F.md5(
                F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))
            ).alias("skey"),
            F.lit(1).alias("one"),
        )
        plan = shard_plan(docs, key=["skey", "doc_id"], bytes_col="one", target_bytes=100)
        return plan.select(
            "doc_id", F.col("cum_bytes").alias("shuffle_rank"), "shard_id"
        )
    q["q_corpus_shuffle"] = q_corpus_shuffle

    def q_partition_prune(spark, sf):
        # write-once date-partitioned layout, then a 3-day query whose scan
        # prunes at PLANNING time (PartitionFilters = directory listing, not
        # data IO — explain check 26 asserts it; at 100 TB with daily
        # partitions this is O(days asked), not O(corpus)). Money summed as
        # integer cents, exact under any accumulation order.
        from facematch_spark.operators.partitioned import daily_event_layout

        ev = daily_event_layout(spark, _t(spark, sf, "events"))
        return (
            ev.filter(
                F.col("event_date").between(
                    F.lit("2024-01-07").cast("date"),
                    F.lit("2024-01-09").cast("date"),
                )
            )
            .groupBy(
                F.col("event_date").cast("string").alias("event_date"),
                F.col("event_type"),
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
            )
        )
    q["q_partition_prune"] = q_partition_prune

    def q_rolling_window(spark, sf):
        # time-RANGE rolling aggregate (30-day rolling spend per customer) —
        # the sliding-window shape q_window_running (rows-frame) doesn't
        # cover: the frame is an event-time interval, so same-day peers
        # enter together. One shuffle on the key, integer cents (exact under any
        # accumulation order).
        from pyspark.sql import Window as W

        o = _t(spark, sf, "orders")
        w = (
            W.partitionBy("o_custkey")
            .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
            .rangeBetween(-30 * 86400, 0)
        )
        cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
        return o.select(
            "o_orderkey",
            "o_custkey",
            F.sum(cents).over(w).alias("rolling_cents_30d"),
        )
    q["q_rolling_window"] = q_rolling_window

    def q_funnel(spark, sf):
        # ordered funnel (view -> click -> purchase, strictly increasing ts
        # per user): each stage's entry time is the min event time AFTER the
        # previous stage's — three tiny per-user aggs joined on user_id, the
        # same hash partitioning reused across all three (no windows, no
        # per-user event sorting).
        ev = _t(spark, sf, "events").select("user_id", "event_type", "ts")
        t1 = (
            ev.filter(F.col("event_type") == "view")
            .groupBy("user_id")
            .agg(F.min("ts").alias("t1"))
        )
        t2 = (
            ev.filter(F.col("event_type") == "click")
            .join(t1, "user_id")
            .filter(F.col("ts") > F.col("t1"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t2"))
        )
        t3 = (
            ev.filter(F.col("event_type") == "purchase")
            .join(t2, "user_id")
            .filter(F.col("ts") > F.col("t2"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t3"))
        )
        return (
            t1.select(F.lit("1_view").alias("stage"))
            .unionByName(t2.select(F.lit("2_click").alias("stage")))
            .unionByName(t3.select(F.lit("3_purchase").alias("stage")))
            .groupBy("stage")
            .agg(F.count("*").alias("n_users"))
        )
    q["q_funnel"] = q_funnel

    def q_table_diff(spark, sf):
        # snapshot reconciliation: diff the documents table against a
        # deterministically mutated twin (drop %97, edit %31, insert %53
        # under shifted ids) — one full-outer join on (key, content-hash),
        # 16 bytes/row on the wire regardless of row width. md5 mode so the
        # oracle reproduces the hash verbatim (xxhash64 is the fast path).
        from facematch_spark.operators.diff import snapshot_diff

        docs = _t(spark, sf, "documents").select("doc_id", "lang", "text")
        new = (
            docs.filter(F.col("doc_id") % 97 != 0)
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 31 == 0, F.concat(F.col("text"), F.lit(" v2"))
                ).otherwise(F.col("text")),
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 53 == 0).select(
                    (F.col("doc_id") + 1000000000).alias("doc_id"),
                    F.col("lang"),
                    F.concat(
                        F.lit("new doc "), F.col("doc_id").cast("string")
                    ).alias("text"),
                )
            )
        )
        return snapshot_diff(docs, new, "doc_id", use_md5=True)
    q["q_table_diff"] = q_table_diff

    def q_outlier_iqr(spark, sf):
        # Tukey-fence outlier screen per group (the data-quality gate before
        # training on numeric features): quartiles from the tiny per-group
        # agg, fences broadcast back, outliers re-aggregated. percentile ==
        # DuckDB quantile_cont bit-for-bit (probed — see q_percentiles);
        # fence arithmetic is 3 IEEE ops on identical doubles, so the
        # verdicts are cross-engine exact.
        ev = _t(spark, sf, "events")
        fences = (
            ev.groupBy("event_type")
            .agg(
                F.percentile("value", 0.25).alias("q1"),
                F.percentile("value", 0.75).alias("q3"),
            )
            .select(
                "event_type",
                (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("lo"),
                (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("hi"),
            )
        )
        return (
            ev.join(F.broadcast(fences), "event_type")
            .filter((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_outliers"),
                F.min("value").alias("out_min"),
                F.max("value").alias("out_max"),
            )
        )
    q["q_outlier_iqr"] = q_outlier_iqr

    def q_sample_weighted(spark, sf):
        # length-proportional Bernoulli sample (char-budgeted subcorpus in
        # fewer rows): P(keep) = n_chars / max(n_chars), md5-keyed so the
        # verdicts are map-only, partition-invariant and reproducible.
        from facematch_spark.operators.sampling import weighted_sample

        docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        return weighted_sample(docs, "n_chars")
    q["q_sample_weighted"] = q_sample_weighted

    def q_json_extract(spark, sf):
        # semi-structured extraction: events.props is a JSON blob; pull the
        # typed field JVM-side (get_json_object — no Python, codegen) and
        # aggregate it like any column. The canonical "logs arrive as JSON"
        # shape; schema-on-read without an inference scan.
        ev = _t(spark, sf, "events")
        k = F.get_json_object("props", "$.k").cast("long")
        return ev.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.countDistinct(k).alias("n_distinct_k"),
        )
    q["q_json_extract"] = q_json_extract

    def q_zscore(spark, sf):
        # per-group z-score normalization (feature scaling before training)
        # with CROSS-ENGINE-EXACT moments: sums are integer cents (exact
        # under any accumulation order), mean/stddev derive from those ints
        # by a fixed sequence of IEEE ops, sqrt is correctly rounded — so
        # every z is bit-identical in any ANSI engine. The float-sum form
        # would hash-flicker with partitioning.
        ev = _t(spark, sf, "events")
        cents = F.round(F.col("value") * 100, 0).cast("long")
        stats = ev.groupBy("event_type").agg(
            F.sum(cents).alias("s1"),
            F.sum(cents * cents).alias("s2"),
            F.count("*").alias("n"),
        )
        s1d, s2d, nd = (F.col(c).cast("double") for c in ("s1", "s2", "n"))
        b = stats.select(
            "event_type",
            (s1d / nd).alias("mean_c"),
            F.sqrt((s2d - s1d * s1d / nd) / nd).alias("sd_c"),
        )
        return ev.join(F.broadcast(b), "event_type").select(
            "event_id",
            "event_type",
            ((cents.cast("double") - F.col("mean_c")) / F.col("sd_c")).alias("z"),
        )
    q["q_zscore"] = q_zscore

    def q_cooccurrence(spark, sf):
        # co-occurrence / market-basket pairs: for each unordered pair of
        # event types, how many users did both — distinct(user, type), one
        # self-join on user_id with the canonical type_a < type_b pair
        # dedup (the P4 pattern at the behavioral level). Output is bounded
        # by |types|² regardless of corpus size.
        ut = _t(spark, sf, "events").select("user_id", "event_type").distinct()
        a, b = ut.alias("a"), ut.alias("b")
        return (
            a.join(
                b,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.event_type") < F.col("b.event_type")),
            )
            .groupBy(
                F.col("a.event_type").alias("type_a"),
                F.col("b.event_type").alias("type_b"),
            )
            .agg(F.count("*").alias("n_users"))
        )
    q["q_cooccurrence"] = q_cooccurrence

    def q_percent_rank(spark, sf):
        # tie-stable rank features per group: percent_rank and cume_dist
        # are pure functions of the value's position among DISTINCT values
        # (peers share a verdict), so they are deterministic under ties —
        # unlike ntile, which splits peer groups by arbitrary position and
        # can never be value-hashed. Exact rational doubles both engines.
        from pyspark.sql import Window as W

        o = _t(spark, sf, "orders")
        w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
        return o.select(
            "o_orderkey",
            "o_orderpriority",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
    q["q_percent_rank"] = q_percent_rank

    def q_zorder_layout(spark, sf):
        # Z-order (Morton) clustering — the Delta/Iceberg ZORDER BY analog:
        # interleave (user_id, props.k) bits into one key, carve contiguous
        # key ranges into files via shard_plan, and emit each file's
        # (x, y) bounding box — the zone-map footprint that proves scans on
        # EITHER dimension prune. The footprint table IS the evidence: each
        # shard covers a narrow rectangle, not a full-range stripe.
        from facematch_spark.operators.layout import zorder_key
        from facematch_spark.operators.shard import shard_plan

        ev = _t(spark, sf, "events").select(
            "event_id",
            F.col("user_id").alias("x"),
            F.get_json_object("props", "$.k").cast("long").alias("y"),
        )
        z = ev.withColumn("zkey", zorder_key(F.col("x"), F.col("y"))).withColumn(
            "one", F.lit(1)
        )
        sharded = shard_plan(z, key=["zkey", "event_id"], bytes_col="one",
                             target_bytes=1000)
        return sharded.groupBy("shard_id").agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    q["q_zorder_layout"] = q_zorder_layout

    def q_quantile_bins(spark, sf):
        # equi-DEPTH histogram (quantile binning — the feature-bucketing /
        # data-profiling complement of q_histogram's equi-width form): the
        # 9 decile boundaries from one tiny agg, bin = #boundaries strictly
        # below the value (identical interpolated boundaries both engines —
        # percentile == quantile_cont bit-for-bit, see q_percentiles).
        o = _t(spark, sf, "orders")
        cuts = o.agg(
            F.percentile(
                "o_totalprice", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
            ).alias("bs")
        )
        binned = o.crossJoin(F.broadcast(cuts)).select(
            F.size(
                F.filter("bs", lambda b: F.col("o_totalprice") > b)
            ).cast("long").alias("bin"),
            "o_totalprice",
        )
        return binned.groupBy("bin").agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    q["q_quantile_bins"] = q_quantile_bins

    def q_events_sliding(spark, sf):
        # OVERLAPPING (sliding) event-time windows — 2h span, 1h slide:
        # every event lands in exactly two windows. q_events_hourly covers
        # the tumbling case; this is the built-in window() in its sliding
        # form (map-side window assignment — no self-join against a window
        # dimension), the load-smoothing aggregation dashboards run.
        ev = _t(spark, sf, "events")
        return (
            ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "win_start"
                ),
                "event_type",
                "n_events",
            )
        )
    q["q_events_sliding"] = q_events_sliding

    def q4_order_priority(spark, sf):
        # TPC-H Q4 shape: correlated EXISTS with an inequality against the
        # OUTER column (late-shipping lineitem for the order) — Catalyst
        # decorrelates it to a left-semi join on l_orderkey with the
        # residual l_shipdate > o_orderdate + 90d as the join condition.
        # Declared AS the subquery (spark.sql) so the decorrelation is the
        # optimizer's, not hand-lowered.
        o = _t(spark, sf, "orders")
        l = _t(spark, sf, "lineitem")
        o.createOrReplaceTempView("_q4_orders")
        l.createOrReplaceTempView("_q4_lineitem")
        return spark.sql("""
            SELECT o_orderpriority, count(*) AS n_orders
            FROM _q4_orders o
            WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
              AND o.o_orderdate <  TIMESTAMP '1995-07-01'
              AND EXISTS (
                  SELECT 1 FROM _q4_lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
              )
            GROUP BY o_orderpriority
        """)
    q["q4_order_priority"] = q4_order_priority

    def q_gapfill_hours(spark, sf):
        # time-series gap filling: the hourly count per event_type over the
        # FULL [min, max] hour span with missing (hour, type) cells as
        # explicit zeros — the densification every dashboard/forecast
        # ingest needs. The grid is sequence(min,max,1h) × distinct types:
        # both sides tiny aggregates, so the grid build is broadcast-scale
        # no matter how large the fact table; the one wide shuffle is the
        # counts groupBy.
        ev = _t(spark, sf, "events").select(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        # the fact table is scanned ONCE (into the groupBy); bounds and the
        # type list derive from the aggregated counts relation, which is
        # tiny (hours × types) — pinned once for its three consumers.
        counts = (
            ev.groupBy("h", "event_type")
            .agg(F.count("*").alias("n_events"))
            .localCheckpoint()
        )
        hours = (
            counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
            .select(
                F.explode(
                    F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
                ).alias("h")
            )
        )
        grid = hours.crossJoin(F.broadcast(counts.select("event_type").distinct()))
        return grid.join(counts, ["h", "event_type"], "left").select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    q["q_gapfill_hours"] = q_gapfill_hours

    def dedup_snm(spark, sf):
        # sorted-neighborhood dedup (Hernandez & Stolfo SIGMOD'95): rank
        # once on a normalized prefix key via the distributed prefix sum,
        # compare each doc with its 4 successors, verify candidates with
        # the SAME exact char-9-gram Jaccard tier as the PPJoin path —
        # the cheap-blocking member of the candidate-generator family
        # (window-local misses are the method's documented trade).
        from facematch_spark.operators.blocking import snm_pairs

        return snm_pairs(_t(spark, sf, "documents"), K, JT, window=5)
    q["dedup_snm"] = dedup_snm

    def dedup_edit_distance(spark, sf):
        # relative edit-distance near-dups (d <= 0.2·max_len) via lossless
        # length-band blocking (|len_a-len_b| <= d bounds band skew to ±1)
        # + same-language blocks; levenshtein runs as one JVM expression
        # on the banded join. Applied to a BOUNDED slice exactly as the
        # operator docs prescribe (the in-block join is quadratic): the
        # 512 md5-smallest doc_ids — a deterministic constant-size slice
        # at any corpus scale (at sf0.01 that is the whole 500-doc table,
        # so the oracle row set is unchanged). Measured un-sliced at
        # sf0.1: 1291 s — the cliff is real, hence the slice.
        from facematch_spark.operators.blocking import edit_distance_pairs

        d = _t(spark, sf, "documents")
        sliced = (
            d.withColumn("_h", F.md5(F.col("doc_id").cast("string")))
            .orderBy("_h", "doc_id")  # TakeOrderedAndProject, K-bounded
            .limit(512)
            .drop("_h")
        )
        return edit_distance_pairs(sliced)
    q["dedup_edit_distance"] = dedup_edit_distance

    def q_triangle_count(spark, sf):
        # per-vertex triangle counts on the part co-purchase graph via
        # degree-ordering orientation (Schank & Wagner '05 / Suri &
        # Vassilvitskii WWW'11): the (degree, id) total order caps the
        # oriented out-degree at O(sqrt m), so the wedge self-join is
        # hub-skew-proof and each triangle closes exactly once.
        from facematch_spark.operators.graph import (
            copurchase_edges,
            local_triangle_counts,
        )

        return local_triangle_counts(copurchase_edges(_t(spark, sf, "lineitem")))
    q["q_triangle_count"] = q_triangle_count

    def q_pagerank(spark, sf):
        # 3-round PageRank over the co-purchase graph in integer
        # micro-units with explicit floor division each step — the
        # quantization makes an ITERATIVE algorithm bit-exact in any
        # engine, so the oracle is a real value-hashed unrolled-CTE twin
        # instead of the weaker rows-only check.
        from facematch_spark.operators.graph import copurchase_edges, pagerank_int

        return pagerank_int(copurchase_edges(_t(spark, sf, "lineitem")), iterations=3)
    q["q_pagerank"] = q_pagerank

    def q_retention_cohorts(spark, sf):
        # cohort retention matrix: users grouped by first-seen day, counted
        # once per (cohort, days-since-cohort) period they returned in.
        # Both shuffles key on user_id (first-seen agg + the join back);
        # the matrix itself is bounded by days², not corpus size.
        from pyspark.sql import Window as W

        ev = _t(spark, sf, "events").select(
            "user_id", F.date_trunc("DAY", "ts").alias("day")
        )
        # first-seen day as a window min over the SAME user_id partitioning
        # the rest of the query needs: one scan, one shuffle, no agg+join
        # round trip back onto the fact table.
        r = (
            ev.withColumn("cohort", F.min("day").over(W.partitionBy("user_id")))
            .select(
                "user_id",
                "cohort",
                F.datediff(F.col("day"), F.col("cohort")).cast("long").alias("period"),
            )
            .distinct()
        )
        return r.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"), "period"
        ).agg(F.count("*").alias("n_users"))
    q["q_retention_cohorts"] = q_retention_cohorts

    def q_markov_transitions(spark, sf):
        # event-type transition counts + probabilities per user journey:
        # lead() over (ts, event_id) — event_id breaks timestamp ties so
        # the successor is a total-order function of the data. One shuffle
        # on user_id, one tiny groupBy; p = n / row-total is a SINGLE
        # integer division (correctly rounded, engine-independent), never
        # a float accumulation.
        from pyspark.sql import Window as W

        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        seq = ev.select(
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(w).alias("dst_type"),
        ).filter(F.col("dst_type").isNotNull())
        counts = seq.groupBy("src_type", "dst_type").agg(
            F.count("*").alias("n_transitions")
        )
        totals = W.partitionBy("src_type")
        return counts.select(
            "src_type",
            "dst_type",
            "n_transitions",
            (
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(totals)
            ).alias("p_transition"),
        )
    q["q_markov_transitions"] = q_markov_transitions

    def q_skyline(spark, sf):
        # 2-D Pareto frontier (min price, max size) via ONE distributed
        # prefix scan (generalized shard_plan two-pass — operators/scan.py)
        # instead of the O(N²) dominance join; the DuckDB oracle
        # deliberately IS the NOT-EXISTS dominance form, so two independent
        # formulations must agree. Prices are only compared, never summed —
        # float-safe across engines.
        from facematch_spark.operators.scan import skyline_2d

        return skyline_2d(
            _t(spark, sf, "part").select("p_partkey", "p_retailprice", "p_size"),
            minimize_col="p_retailprice",
            maximize_col="p_size",
        )
    q["q_skyline"] = q_skyline

    def q_expectations(spark, sf):
        # Deequ/Great-Expectations-style data-quality report: six checks in
        # ONE scan (the five column checks share a single aggregate row,
        # unpivoted like q_profile) plus one left-anti FK probe; the
        # fixture makes both verdicts live (price-range and date-horizon
        # checks fail, the rest pass).
        o = _t(spark, sf, "orders")
        agg = o.agg(
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("long").alias("orderkey_not_null"),
            (F.count("*") - F.countDistinct("o_orderkey"))
            .cast("long").alias("orderkey_unique"),
            F.sum(
                F.when(
                    (F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 200000), 1
                ).otherwise(0)
            ).cast("long").alias("totalprice_in_range"),
            F.sum(
                F.when(F.expr("o_orderdate >= TIMESTAMP '2000-01-01'"), 1).otherwise(0)
            ).cast("long").alias("orderdate_before_2000"),
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin(
                        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
                    ),
                    1,
                ).otherwise(0)
            ).cast("long").alias("priority_known"),
        )
        col_checks = agg.selectExpr(
            "stack(5, "
            "'orderkey_not_null', orderkey_not_null, "
            "'orderkey_unique', orderkey_unique, "
            "'totalprice_in_range', totalprice_in_range, "
            "'orderdate_before_2000', orderdate_before_2000, "
            "'priority_known', priority_known) AS (check_name, n_violations)"
        )
        fk = (
            o.join(
                _t(spark, sf, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti",
            )
            .agg(F.count("*").cast("long").alias("n_violations"))
            .select(F.lit("custkey_fk_customer").alias("check_name"), "n_violations")
        )
        return col_checks.unionByName(fk).select(
            "check_name", "n_violations", (F.col("n_violations") == 0).alias("passed")
        )
    q["q_expectations"] = q_expectations

    def q_incremental_agg(spark, sf):
        # incremental aggregate maintenance: per-priority (count, sum, min,
        # max) states computed separately for the historical slice and the
        # new-arrivals slice, then MERGED state-to-state — the base slice
        # is never rescanned when a delta lands. The oracle recomputes from
        # the full table, so equality IS the maintenance-correctness proof.
        # Money in integer cents (exact under any accumulation order).
        o = _t(spark, sf, "orders").select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            "o_orderdate",
        )

        def state(df):
            return df.groupBy("o_orderpriority").agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum("cents").alias("sum_cents"),
                F.min("cents").alias("min_cents"),
                F.max("cents").alias("max_cents"),
            )

        base = state(o.filter(F.expr("o_orderdate < TIMESTAMP '1998-01-01'")))
        delta = state(o.filter(F.expr("o_orderdate >= TIMESTAMP '1998-01-01'")))
        return (
            base.unionByName(delta)
            .groupBy("o_orderpriority")
            .agg(
                F.sum("n_orders").cast("long").alias("n_orders"),
                F.sum("sum_cents").alias("sum_cents"),
                F.min("min_cents").alias("min_cents"),
                F.max("max_cents").alias("max_cents"),
            )
        )
    q["q_incremental_agg"] = q_incremental_agg

    def q_mode_per_group(spark, sf):
        # deterministic mode: each user's most frequent event type, ties
        # broken to the lexicographically smallest type (total order, so
        # the answer is a function of the data — plain mode() is not).
        # row_number under a rank<=1 filter plans as WindowGroupLimit: the
        # per-user sort never materializes whole partitions.
        from pyspark.sql import Window as W

        counts = (
            _t(spark, sf, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n_events"))
        )
        w = W.partitionBy("user_id").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        return (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    q["q_mode_per_group"] = q_mode_per_group

    def q_except_all(spark, sf):
        # multiset difference with duplicate accounting: per-(user, type)
        # event instances in the first half of the month EXCEPT ALL those
        # in the second half — each late occurrence cancels exactly one
        # early occurrence (set EXCEPT would erase the multiplicity).
        # Spark's exceptAll lowers to a replicate-by-count-difference plan,
        # no join explosion; grouped afterwards to a bounded report.
        ev = _t(spark, sf, "events").select("user_id", "event_type", "ts")
        a = ev.filter(F.expr("ts < TIMESTAMP '2024-01-16'")).drop("ts")
        b = ev.filter(F.expr("ts >= TIMESTAMP '2024-01-16'")).drop("ts")
        return (
            a.exceptAll(b)
            .groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n_remaining"))
        )
    q["q_except_all"] = q_except_all

    def q_intersect_all(spark, sf):
        # multiset intersection (the EXCEPT ALL sibling): per-(user, type)
        # event instances present in BOTH month halves, with multiplicity
        # min(count_a, count_b) — Spark's intersectAll plans the same
        # replicate-by-count shape, no join explosion.
        ev = _t(spark, sf, "events").select("user_id", "event_type", "ts")
        a = ev.filter(F.expr("ts < TIMESTAMP '2024-01-16'")).drop("ts")
        b = ev.filter(F.expr("ts >= TIMESTAMP '2024-01-16'")).drop("ts")
        return (
            a.intersectAll(b)
            .groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n_common"))
        )
    q["q_intersect_all"] = q_intersect_all

    def q17_small_qty_revenue(spark, sf):
        # TPC-H Q17 shape: correlated SCALAR subquery (per-part average
        # threshold) left to Catalyst — it decorrelates to an aggregate +
        # join, never a per-row re-scan. Quantities are integral doubles
        # (1..50), so per-part sums/avg are EXACT and 0.2·avg is the same
        # IEEE double in any engine; revenue reported in integer cents
        # per brand.
        _t(spark, sf, "lineitem").createOrReplaceTempView("_q17_l")
        _t(spark, sf, "part").createOrReplaceTempView("_q17_p")
        return spark.sql("""
            SELECT p.p_brand,
                   count(*) AS n_small,
                   sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                       AS revenue_cents
            FROM _q17_l l JOIN _q17_p p ON p.p_partkey = l.l_partkey
            WHERE l.l_quantity < (
                SELECT 0.2 * avg(l2.l_quantity)
                FROM _q17_l l2 WHERE l2.l_partkey = l.l_partkey
            )
            GROUP BY p.p_brand
        """)
    q["q17_small_qty_revenue"] = q17_small_qty_revenue

    def q13_order_count_dist(spark, sf):
        # TPC-H Q13 shape: customer × filtered-orders LEFT join, count per
        # customer, then the distribution of those counts — the zero
        # bucket exists only because the join is OUTER (filtering to
        # urgent orders leaves some customers with none).
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        per_cust = (
            c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
        )
        return per_cust.groupBy("c_count").agg(F.count("*").alias("n_custs"))
    q["q13_order_count_dist"] = q13_order_count_dist

    def q_sketch_merge(spark, sf):
        # mergeable-sketch proof: per-(priority, order-year) KMV states
        # (k smallest distinct hashes — k·8 bytes per shard) merged by
        # union + re-rank into the per-priority estimate. The oracle
        # computes the DIRECT unsharded KMV, so hash-green IS the
        # mergeability proof (the global k-minima all survive their own
        # shard's state).
        from facematch_spark.operators.sketch import kmv_distinct_sharded

        o = _t(spark, sf, "orders").withColumn("_yr", F.year("o_orderdate"))
        return kmv_distinct_sharded(
            o, group_col="o_orderpriority", value_col="o_custkey",
            shard_col="_yr", k=64,
        ).withColumnRenamed("grp", "priority")
    q["q_sketch_merge"] = q_sketch_merge

    def q_pareto_revenue(spark, sf):
        # Pareto (80/20) concentration report: parts in descending revenue
        # order with the exact running total and a head flag — via the
        # DISTRIBUTED prefix SUM (scan.py), never a global single-task
        # window. Descending order is the negated key; (−rev, partkey) is
        # unique so the scan is well-defined. The head rule is the
        # "first byte" convention shard_plan uses: a part is in the top-80
        # head iff its revenue STARTS before the 80% line — in integers,
        # exclusive_cum · 10 < total · 8 (no float thresholds anywhere).
        from facematch_spark.operators.scan import prefix_agg

        rev = (
            _t(spark, sf, "lineitem")
            .groupBy("l_partkey")
            .agg(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                ).alias("revenue_cents")
            )
            .withColumn("_negrev", -F.col("revenue_cents"))
            # consumed by the scan AND the total — pin once (house rule):
            # a re-evaluation would repeat the full lineitem scan+shuffle.
            .localCheckpoint()
        )
        scanned = prefix_agg(
            rev, key=["_negrev", "l_partkey"], value_col="revenue_cents",
            agg="sum", out_col="_excl_cum",
        )
        total = rev.agg(F.sum("revenue_cents").alias("_total"))
        return (
            scanned.crossJoin(F.broadcast(total))
            .select(
                F.col("l_partkey").alias("part_id"),
                "revenue_cents",
                (F.coalesce(F.col("_excl_cum"), F.lit(0)) + F.col("revenue_cents"))
                .alias("cum_cents"),
                (
                    F.coalesce(F.col("_excl_cum"), F.lit(0)) * 10
                    < F.col("_total") * 8
                ).alias("in_top80"),
            )
        )
    q["q_pareto_revenue"] = q_pareto_revenue

    def q_anomaly_mad(spark, sf):
        # robust outlier screen: median absolute deviation per priority
        # (MAD tolerates the heavy tail that wrecks the z-score screen —
        # the IQR entry's sibling). Exact medians both passes: Spark
        # `percentile` is bit-equal to DuckDB `quantile_cont` (probed at
        # the percentiles entry); |x−med| > 3·mad is single-op double
        # arithmetic on identical inputs, so the verdict is
        # engine-independent. Two scans by necessity (MAD is not
        # one-pass); both aggregates shuffle only |groups| rows.
        o = _t(spark, sf, "orders").select("o_orderpriority", "o_totalprice")
        med = o.groupBy("o_orderpriority").agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("med")
        )
        dev = o.join(F.broadcast(med), "o_orderpriority").withColumn(
            "_dev", F.abs(F.col("o_totalprice") - F.col("med"))
        )
        stats = dev.groupBy("o_orderpriority").agg(
            F.first("med").alias("med"),
            F.expr("percentile(_dev, 0.5)").alias("mad"),
        )
        return (
            dev.drop("med")
            .join(F.broadcast(stats), "o_orderpriority")
            .groupBy("o_orderpriority")
            .agg(
                F.first("med").alias("med"),
                F.first("mad").alias("mad"),
                F.sum(
                    F.when(F.col("_dev") > 3 * F.col("mad"), 1).otherwise(0)
                ).cast("long").alias("n_outliers"),
            )
        )
    q["q_anomaly_mad"] = q_anomaly_mad

    def q_array_hof(spark, sf):
        # higher-order array functions entirely inside codegen: tokenize,
        # transform(lower), filter(len>3), aggregate(sum of lengths) — no
        # explode/shuffle, no Python. The len>3 filter also erases any
        # split() empty-string edge, keeping the DuckDB list_* twin exact.
        d = _t(spark, sf, "documents")
        toks = F.split(F.col("text"), " ")
        longs = F.filter(
            F.transform(toks, lambda t: F.lower(t)),
            lambda t: F.length(t) > 3,
        )
        return d.select(
            "doc_id",
            F.size(longs).cast("long").alias("n_long_tokens"),
            F.aggregate(
                longs, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).alias("chars_long_tokens"),
        )
    q["q_array_hof"] = q_array_hof

    def q_merge_join_stats(spark, sf):
        # explicit sort-merge join: the fact-fact strategy when BOTH sides
        # are too big to broadcast or hash (spill-safe — sort runs off-heap
        # and merges stream). MERGE hint + plan assertion completes the
        # join-strategy family (broadcast q3 / shuffle-hash verify / salted
        # q_salted_join / bucketed zero-exchange q_bucketed_join / SMJ
        # here). Money in integer cents as everywhere.
        l = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders").hint("merge")
        return (
            l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus", "l_returnflag")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                ).alias("sum_cents"),
            )
        )
    q["q_merge_join_stats"] = q_merge_join_stats

    def streaming_merge_apply_q(spark, sf):
        # streaming CDC apply: three deterministic change waves (update /
        # delete / re-update-after-delete) streamed one micro-batch each
        # through a foreachBatch MERGE loop onto a persisted snapshot.
        # The oracle computes the ONE-SHOT merge (max-seq winner per key),
        # so hash-green proves the loop neither loses nor reorders changes
        # — including the delete-then-reinsert that spans batches 2→3.
        from facematch_spark.streaming.incremental import streaming_merge_apply

        base = _t(spark, sf, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderpriority",
        )
        k = F.col("o_orderkey")
        w1 = base.filter(k % 10 == 0).select(
            "o_orderkey", "o_custkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("cents") + 100).alias("cents"),
            "o_orderpriority",
            F.lit("U").alias("op"), F.lit(1).cast("long").alias("seq"),
        )
        w2 = base.filter(k % 17 == 3).select(
            "*", F.lit("D").alias("op"), F.lit(2).cast("long").alias("seq")
        )
        w3 = base.filter(k % 20 == 0).select(
            "o_orderkey", "o_custkey",
            F.lit("Y").alias("o_orderstatus"),
            (F.col("cents") + 200).alias("cents"),
            "o_orderpriority",
            F.lit("U").alias("op"), F.lit(3).cast("long").alias("seq"),
        )
        return streaming_merge_apply(spark, base, [w1, w2, w3], "o_orderkey")
    q["streaming_merge_apply"] = streaming_merge_apply_q

    def q_regression_slope(spark, sf):
        # per-type OLS trend of event value over time, EXACTLY: hour index
        # and value-cents are integers, so every sufficient statistic
        # (n, Σx, Σy, Σxy, Σx²) is an exact int64 sum — order-independent —
        # and the closed-form slope/intercept are single divisions of
        # exact integers (correctly rounded, engine-independent). The
        # float-sum regr_slope() path would hash-flicker; this never can.
        # One map-side-combinable shuffle of 5 longs per group.
        ev = _t(spark, sf, "events").select(
            "event_type",
            (
                F.unix_timestamp("ts") - F.lit(1704067200)
            ).cast("long").alias("_sec"),
            F.round(F.col("value") * 100, 0).cast("long").alias("_cents"),
        ).withColumn("_hr", F.expr("_sec div 3600"))
        # precondition: _sec >= 0 (fixture timestamps are all >= the
        # 2024-01-01 epoch offset above). Spark `div` truncates toward zero
        # while the DuckDB oracle's `//` floors — they agree only on
        # nonnegative operands, so a fixture with pre-2024 events would
        # need floor() on both sides (cf. the same note in kmeans.py).
        s = ev.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum("_hr").alias("sx"),
            F.sum("_cents").alias("sy"),
            F.sum(F.col("_hr") * F.col("_cents")).alias("sxy"),
            F.sum(F.col("_hr") * F.col("_hr")).alias("sxx"),
        )
        num = s["n"] * F.col("sxy") - F.col("sx") * F.col("sy")
        den = s["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
        return s.select(
            "event_type",
            "n",
            (num.cast("double") / den.cast("double")).alias("slope_cents_per_hr"),
            (
                (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
                / den.cast("double")
            ).alias("intercept_cents"),
        )
    q["q_regression_slope"] = q_regression_slope

    def q_link_prediction(spark, sf):
        # link prediction on the co-purchase graph: Resource-Allocation
        # index (Σ 1/deg(common neighbor), integer micro-units — chosen
        # over Adamic-Adar because 1/ln(deg) rides a libm log whose last
        # bit differs across engines), top-10 candidates per canonical
        # lower vertex. Baskets capped at ≤5 distinct parts — the
        # documented hub-capping practice applied, bounding the wedge
        # fan-out Σ deg(w)².
        from facematch_spark.operators.graph import link_prediction_ra

        ip = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
        ok = (
            ip.groupBy("l_orderkey")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= 5)
            .select("l_orderkey")
        )
        ip2 = ip.join(ok, "l_orderkey", "left_semi")
        a, b = ip2.alias("a"), ip2.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
            .distinct()
        )
        return link_prediction_ra(edges, top_k=10)
    q["q_link_prediction"] = q_link_prediction

    def q_gini_diversity(spark, sf):
        # behavioral-diversity feature: Gini impurity of each user's
        # event-type mix, 1 − Σ(n_i/n)² = 1 − Σn_i²/n² — chosen over
        # Shannon entropy deliberately: entropy needs a libm log (last-bit
        # engine-dependent), while Σn_i² and n² are exact int64 and the
        # verdict is ONE division (same exact-rational policy as the
        # regression/PageRank/RA entries). Two tiny keyed shuffles.
        counts = (
            _t(spark, sf, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n_i"))
        )
        return (
            counts.groupBy("user_id")
            .agg(
                F.sum("n_i").alias("n"),
                F.sum(F.col("n_i") * F.col("n_i")).alias("sq"),
            )
            .select(
                "user_id",
                "n",
                (
                    F.lit(1.0)
                    - F.col("sq").cast("double")
                    / (F.col("n") * F.col("n")).cast("double")
                ).alias("gini"),
            )
        )
    q["q_gini_diversity"] = q_gini_diversity

    def q_kmeans(spark, sf):
        # deterministic distributed k-means (Lloyd's, k=4, 2 rounds) over
        # integer-quantized embeddings (operators/kmeans.py): exact int64
        # distances, floor-of-double centroid updates (int div semantics
        # differ across engines on negatives — documented), md5-ordered
        # init, ties to smallest centroid id. The oracle unrolls both
        # rounds in SQL — three independent implementations (Spark,
        # DuckDB, a Python replay in pytest) produce identical
        # assignments, closing the "iterative ML is not oracle-able" gap
        # the same way the integer PageRank does.
        from facematch_spark.operators.kmeans import kmeans_int

        return kmeans_int(
            spark, _t(spark, sf, "embeddings"), k=4, iterations=2
        )
    q["q_kmeans"] = q_kmeans

    def q_sample_fixed_n(spark, sf):
        # exactly-n-per-stratum deterministic sample: rank by (md5, key)
        # inside each language, keep rank <= n — the eval-set carve-out a
        # rate-based sample can't produce (a rate yields a binomial count).
        from facematch_spark.operators.sampling import fixed_n_sample

        docs = _t(spark, sf, "documents").select("doc_id", "lang")
        return fixed_n_sample(docs, FIXED_N)
    q["q_sample_fixed_n"] = q_sample_fixed_n

    def q_curation_split(spark, sf):
        # dedup-aware train/val/test split: the verdict hashes the doc's
        # duplicate-CLUSTER id, so near-duplicates can never straddle splits
        # (the classic eval-leakage bug made structurally impossible).
        from facematch_spark.operators.dedup import dedup_clusters
        from facematch_spark.operators.sampling import leakage_safe_split

        docs = _t(spark, sf, "documents")
        clusters = dedup_clusters(docs, K, JT)
        return (
            leakage_safe_split(clusters, SPLIT_FRACTIONS)
            .join(docs.select("doc_id", "lang"), "doc_id")
            .select("doc_id", "lang", "cluster_id", "split_key", "split")
        )
    q["q_curation_split"] = q_curation_split

    def q_hot_keys(spark, sf):
        # heavy-hitter diagnostic over the shingle key space — the report
        # every salting threshold in this engine is tuned against (hot
        # shingles → PPJoin prefix tiers, hot bands → LSH salted tier).
        from facematch_spark.operators.dedup import char_shingles
        from facematch_spark.operators.profile import hot_keys

        sh = char_shingles(_t(spark, sf, "documents"), K)
        return hot_keys(sh, "shingle", top_k=20)
    q["q_hot_keys"] = q_hot_keys

    def q_histogram(spark, sf):
        # integer-exact equi-width histogram (floor-dollars, integer width /
        # bounds / bin ids — no float division, so bit-identical across
        # engines and accumulation orders). Two passes: pruned min/max agg,
        # then map-only binning + |bins|-row aggregation.
        from facematch_spark.operators.profile import equi_width_histogram

        return equi_width_histogram(_t(spark, sf, "orders"), "o_totalprice", 12)
    q["q_histogram"] = q_histogram

    def q_salted_join(spark, sf):
        # the generic deterministic salted equi-join: 5 event types over all
        # events is the extreme-skew join shape (5 reducers at any scale);
        # salting by xxhash64(event_id) spreads each type over 8 reducers
        # while keeping the result multiset identical to the plain join.
        from facematch_spark.operators.skew import salted_equi_join

        ev = _t(spark, sf, "events")
        dim = (
            ev.select("event_type").distinct()
            .withColumn("wt", F.length("event_type").cast("long"))
        )
        joined = salted_equi_join(ev, dim, on="event_type", uniq_col="event_id")
        return joined.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("long") * F.col("wt")
            ).alias("weighted_cents"),
        )
    q["q_salted_join"] = q_salted_join

    def dedup_decontaminate(spark, sf):
        # eval-decontamination: drop train docs (even doc_ids) that
        # near-dup anything in the held-out set (odd doc_ids) at exact
        # char-9-gram Jaccard >= 0.5; returns the audit trail — each
        # dropped doc with its strongest held-out match.
        from facematch_spark.operators.dedup import decontaminate

        docs = _t(spark, sf, "documents")
        train = docs.filter(F.col("doc_id") % 2 == 0)
        held = docs.filter(F.col("doc_id") % 2 == 1)
        _, contaminated = decontaminate(train, held, K, JT)
        return contaminated
    q["dedup_decontaminate"] = dedup_decontaminate

    def curation_pipeline(spark, sf):
        # the composed curation flow: quality gate (length >= 100) →
        # near-dup clustering + representative election → per-language
        # stratified sample — one SQL-verifiable statement end-to-end.
        from facematch_spark.plans.curation import curate

        return curate(
            _t(spark, sf, "documents"), K, JT,
            rates=SAMPLE_RATES, default_rate=SAMPLE_DEFAULT_RATE,
        )
    q["curation_pipeline"] = curation_pipeline

    # ---- multimodal plumbing ----

    def multimodal_meta(spark, sf):
        from facematch_spark.operators.multimodal import extract_metadata, make_media_df

        media = make_media_df(spark, _t(spark, sf, "documents"))
        return extract_metadata(media)
    q["multimodal_meta"] = multimodal_meta

    def multimodal_frames(spark, sf):
        from facematch_spark.operators.multimodal import make_media_df, sample_frames

        media = make_media_df(spark, _t(spark, sf, "documents"), kind="video")
        frames = sample_frames(media)
        return frames.groupBy("media_id").agg(F.count("*").cast("long").alias("n_frames"))
    q["multimodal_frames"] = multimodal_frames

    # Registration-order rotation (VERDICT r05 next-round item 1): the
    # driver's correctness gate hashes the FIRST 50 registered entries, and
    # rounds 1-5 always registered the same core block first, so the 56
    # entries added later have never had a driver-side correctness row (all
    # are green under the local gate replica, tools/check_oracle.py). Rotate
    # the never-driver-verified entries to the front of the dict — 46 of
    # them plus 4 flagship canaries fill the 50-slot window — so this
    # round's CORRECTNESS artifact attests the other half of the contract.
    # Order only: the name→builder mapping, every plan, and every oracle SQL
    # string are unchanged. streaming_merge_apply stays out of the window
    # (its foreachBatch loop is wall-clock bounded — COVERAGE.md tracks it).
    _window = [
        # 4 canaries: driver-green in r04+r05, the flagship dedup dataflow
        "dedup_minhash_lsh", "dedup_clusters", "dedup_ngram_jaccard",
        "report_top_edges",
        # 46 never-driver-verified entries (registration sessions 7-15)
        "dedup_embedding_cosine", "dedup_representatives",
        "q_sample_stratified", "q5_region_volume", "dedup_cluster_stats",
        "streaming_enrich_counts", "text_line_dedup", "q_corpus_shuffle",
        "q_partition_prune", "q_funnel", "q_sample_weighted",
        "q_cooccurrence", "q_zorder_layout", "q_quantile_bins",
        "q4_order_priority", "q_gapfill_hours", "dedup_snm",
        "dedup_edit_distance", "q_triangle_count", "q_pagerank",
        "q_retention_cohorts", "q_markov_transitions", "q_skyline",
        "q_expectations", "q_incremental_agg", "q_except_all",
        "q_intersect_all", "q17_small_qty_revenue", "q13_order_count_dist",
        "q_sketch_merge", "q_pareto_revenue", "q_anomaly_mad",
        "q_merge_join_stats", "q_regression_slope", "q_link_prediction",
        "q_gini_diversity", "q_kmeans", "q_sample_fixed_n",
        "q_curation_split", "q_hot_keys", "q_histogram", "q_salted_join",
        "dedup_decontaminate", "curation_pipeline", "multimodal_meta",
        "multimodal_frames",
    ]
    assert len(_window) == 50 and set(_window) <= set(q)
    return {**{k: q[k] for k in _window}, **{k: v for k, v in q.items() if k not in _window}}


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

# DuckDB-side whitespace class written out to equal Java's \\s exactly
# ([ \\t\\n\\x0B\\f\\r]): the Spark operators split/normalize with Java \\s,
# and RE2's \\s omits vertical tab (\\x0B), so a document containing \\x0B
# would tokenize differently on the two sides if the oracles used '\\s'.
_WSC = r" \t\n\x0b\f\r"

def _shingles_cte(tbl: str = "documents") -> str:
    """The exact-Jaccard CTE block over an arbitrary docs relation (the
    curation oracle runs it over a quality-filtered CTE, every other oracle
    over the raw table)."""
    return f"""
sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {K}) AS shingle
  FROM {tbl}, UNNEST(range(1, length(text) - {K - 2})) AS t(i)
),
card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
jpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
  FROM jpairs
  JOIN card ca ON ca.doc_id = id_a
  JOIN card cb ON cb.doc_id = id_b
)
"""


_SHINGLES_CTE = f"""
sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {K}) AS shingle
  FROM documents, UNNEST(range(1, length(text) - {K - 2})) AS t(i)
),
card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
jpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
  FROM jpairs
  JOIN card ca ON ca.doc_id = id_a
  JOIN card cb ON cb.doc_id = id_b
)
"""


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(round(l_extendedprice * (1 - l_discount), 4)), 2) AS revenue,
               count(*) AS count_order,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """

    o["q3_top_orders"] = """
        SELECT o_orderkey,
               round(sum(round(l_extendedprice * (1 - l_discount), 4)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """

    o["q_topk_per_group"] = """
        SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal, CAST(rank AS INT) AS rank
        FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
            FROM customer
        )
        WHERE rank <= 3
    """

    o["q_anti_join"] = """
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    """

    o["q_semi_join"] = """
        SELECT p_brand, count(*) AS n_parts FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        GROUP BY p_brand
    """

    o["q_union_distinct"] = """
        SELECT DISTINCT nationkey FROM (
            SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
            UNION ALL
            SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
        )
    """

    o["q_window_running"] = """
        SELECT o_custkey, o_orderkey,
               round(sum(round(o_totalprice, 4)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
        FROM orders
    """

    o["q_agg_stats"] = """
        SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
               round(min(value), 6) AS min_v, round(max(value), 6) AS max_v,
               round(avg(value), 4) AS avg_v
        FROM events GROUP BY event_type
    """

    o["q_rollup_counts"] = """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """

    o["q_cube_metrics"] = """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(year(o_orderdate), -1) AS yr,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM orders
        GROUP BY CUBE (o_orderpriority, year(o_orderdate))
    """

    o["q_bucketed_join"] = """
        SELECT c_custkey, c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    """

    o["q_sessionize"] = """
        WITH lagged AS (
            SELECT user_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_sess,
                   ts, event_id
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM lagged
        )
        SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM sess GROUP BY user_id
    """

    o["q_pivot_daily"] = """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*) FILTER (event_type = 'click')    AS click,
               count(*) FILTER (event_type = 'error')    AS error,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup')   AS signup,
               count(*) FILTER (event_type = 'view')     AS view
        FROM events GROUP BY 1
    """

    _hourly = """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """
    o["q_events_hourly"] = _hourly

    o["q_asof_join"] = """
        WITH ranked AS (
            SELECT e.event_id, e.user_id, e.ts, e.event_type,
                   o.o_orderkey, o.o_orderdate, o.o_totalprice,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id, ts, event_type,
               o_orderkey AS matched_orderkey,
               o_orderdate AS matched_orderdate,
               o_totalprice AS matched_totalprice
        FROM ranked WHERE rn = 1
    """

    o["q_range_join"] = """
        SELECT e.event_id, e.ts,
               CAST(count(f.ts) AS BIGINT) AS n_prev_5min
        FROM events e LEFT JOIN events f
          ON f.ts >= e.ts - INTERVAL 300 SECOND AND f.ts < e.ts
        GROUP BY e.event_id, e.ts
    """
    o["dedup_within_doc_spans"] = """
        WITH pos AS (
            SELECT doc_id, i AS pos, substr(text, CAST(i AS INT), 20) AS g
            FROM (
                SELECT doc_id, text, unnest(range(1, length(text) - 18)) AS i
                FROM documents WHERE length(text) >= 20
            )
        ),
        dpos AS (
            SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                       count(*) OVER (PARTITION BY doc_id, g) AS n
                FROM pos
            ) WHERE n >= 2
        ),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
                        THEN 1 ELSE 0 END AS b
            FROM dpos
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM brk
        )
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + 20 AS BIGINT) AS span_end,
               CAST(max(pos) + 20 - min(pos) AS BIGINT) AS span_len
        FROM isl GROUP BY doc_id, island
    """

    o["text_pack_plan"] = rf"""
        WITH chunks AS (
            SELECT doc_id, pos // 200 AS chunk_id,
                   len(list_filter(
                       regexp_split_to_array(
                           substring(text, CAST(pos + 1 AS INT), 256), '[{_WSC}]+'),
                       x -> x != '')) AS n_tokens
            FROM (
                SELECT doc_id, text,
                       CAST(unnest(generate_series(0, greatest(length(text) - 1, 0), 200))
                           AS BIGINT) AS pos
                FROM documents
            )
        ),
        c AS (
            SELECT doc_id, chunk_id, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       ORDER BY doc_id, chunk_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM chunks
        )
        SELECT doc_id, chunk_id, n_tokens, cum_tokens,
               (cum_tokens - n_tokens) // 512 AS seq_id
        FROM c
    """

    o["q_temperature_sample"] = """
        WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        nmin AS (SELECT min(n) AS n_min FROM counts),
        rates AS (
            SELECT lang,
                   lpad(lower(hex(least(
                       CAST(floor(sqrt(n_min / n) * 4294967296.0) AS BIGINT),
                       4294967295))), 8, '0') AS threshold
            FROM counts, nmin
        )
        SELECT d.doc_id, d.lang,
               substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS sample_key
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < r.threshold
    """

    o["streaming_join_attrib"] = """
        SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id
        FROM events e JOIN events c
          ON c.user_id = e.user_id
         AND e.event_type = 'error' AND c.event_type = 'click'
         AND c.ts >= e.ts - INTERVAL 86400 SECOND AND c.ts < e.ts
    """

    o["q_scd2_history"] = """
        SELECT o_custkey, o_orderkey,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               CAST(row_number() OVER w AS BIGINT) AS version,
               lead(o_orderdate) OVER w IS NULL AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """

    o["q_merge_upsert"] = """
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   o_orderpriority
            FROM orders
        ),
        changes AS (
            SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
                   cents + 100 AS cents, o_orderpriority, 'U' AS op
            FROM base WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, cents, o_orderpriority, 'D'
            FROM base WHERE o_orderkey % 10 <> 0 AND o_orderkey % 17 = 3
            UNION ALL
            SELECT o_orderkey + 10000000, o_custkey, 'N', cents, o_orderpriority, 'U'
            FROM base WHERE o_orderkey % 100 = 7
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, cents, o_orderpriority
        FROM changes WHERE op = 'U'
        UNION ALL
        SELECT * FROM base
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
    """

    o["q_interval_join"] = """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
            FROM (
                SELECT user_id, ts,
                       CAST(sum(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS session_id
                FROM flagged
            )
            GROUP BY user_id, session_id
        )
        SELECT s.user_id, s.session_id,
               CAST(count(t.user_id) AS BIGINT) AS n_overlap
        FROM sess s LEFT JOIN sess t
          ON t.user_id <> s.user_id
         AND s.s_start <= t.s_end AND t.s_start <= s.s_end
        GROUP BY s.user_id, s.session_id
    """

    o["text_chunk"] = """
        SELECT doc_id,
               pos // 200 AS chunk_id,
               pos AS chunk_start,
               substring(text, CAST(pos + 1 AS INT), 256) AS chunk_text,
               CAST(len(generate_series(0, greatest(length(text) - 1, 0), 200)) AS BIGINT)
                   AS n_chunks
        FROM (
            SELECT doc_id, text,
                   CAST(unnest(generate_series(0, greatest(length(text) - 1, 0), 200)) AS BIGINT)
                       AS pos
            FROM documents
        )
    """

    o["q_shard_plan"] = """
        WITH c AS (
            SELECT doc_id, n_chars,
                   CAST(sum(n_chars) OVER (
                       ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_bytes
            FROM documents
        )
        SELECT doc_id, n_chars, cum_bytes,
               (cum_bytes - n_chars) // 4096 AS shard_id
        FROM c
    """

    o["streaming_event_counts"] = _hourly

    _prof_cols = ["doc_id", "text", "lang", "source", "n_chars"]
    o["q_profile"] = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val
           FROM documents"""
        for c in _prof_cols
    )

    o["q_percentiles"] = """
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.9) AS p90,
               quantile_cont(l_extendedprice, 0.99) AS p99,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """

    o["q_distinct_sketch"] = """
        WITH hv AS (
            SELECT DISTINCT o_orderpriority AS grp,
                   ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS hv
            FROM orders
        ),
        ranked AS (
            SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
            FROM hv
        ),
        est AS (
            SELECT grp,
                   round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                              ELSE 63.0 * 4294967296.0 / max(hv) END, 2) AS est_distinct
            FROM ranked WHERE rn <= 64 GROUP BY grp
        ),
        exact AS (
            SELECT o_orderpriority AS grp,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
            FROM orders GROUP BY 1
        )
        SELECT e.grp AS o_orderpriority, e.est_distinct, x.exact_distinct
        FROM est e JOIN exact x USING (grp)
    """

    o["streaming_dedup_fps"] = """
        SELECT DISTINCT md5(text) AS fp FROM documents
    """

    o["dedup_exact_groups"] = """
        SELECT md5(text) AS fp, count(*) AS group_size, min(doc_id) AS rep_id
        FROM documents GROUP BY md5(text)
    """

    o["dedup_ngram_jaccard"] = f"""
        WITH {_SHINGLES_CTE}
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {JT}
    """

    # token-shingle twin: tokens = maximal non-whitespace runs; shingle =
    # TK consecutive tokens joined by single spaces (list_slice bounds are
    # inclusive in DuckDB; range() upper bound is exclusive). Whitespace is
    # the explicit Java-\s class (see _WSC).
    o["dedup_ngram_jaccard_token"] = rf"""
        WITH tk AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '[{_WSC}]+'), x -> len(x) > 0) AS toks
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + {TK - 1} AS INT)), ' ') AS shingle
            FROM tk, UNNEST(range(1, len(toks) - {TK - 2})) AS u(i)
            WHERE len(toks) >= {TK}
        ),
        card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        jpairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        FROM jpairs
        JOIN card ca ON ca.doc_id = id_a
        JOIN card cb ON cb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= {JT}
    """

    o["report_top_edges"] = f"""
        WITH {_SHINGLES_CTE},
        e AS (SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {JT}),
        t AS (
            SELECT 'top' AS which,
                   CAST(row_number() OVER (ORDER BY jaccard DESC, id_a ASC, id_b ASC) AS INT) AS pos,
                   id_a, id_b, jaccard
            FROM e
        ),
        b AS (
            SELECT 'bottom' AS which,
                   CAST(row_number() OVER (ORDER BY jaccard ASC, id_a ASC, id_b ASC) AS INT) AS pos,
                   id_a, id_b, jaccard
            FROM e
        )
        SELECT * FROM t WHERE pos <= 5
        UNION ALL
        SELECT * FROM b WHERE pos <= 5
    """

    o["dedup_clusters"] = f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        edges AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {JT}),
        sym AS (SELECT id_a AS s, id_b AS d FROM edges
                UNION ALL SELECT id_b, id_a FROM edges),
        cc(node, label) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT sym.d, cc.label FROM cc JOIN sym ON sym.s = cc.node
        )
        SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node
    """

    o["dedup_representatives"] = f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        edges AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {JT}),
        sym AS (SELECT id_a AS s, id_b AS d FROM edges
                UNION ALL SELECT id_b, id_a FROM edges),
        cc(node, label) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT sym.d, cc.label FROM cc JOIN sym ON sym.s = cc.node
        ),
        cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node),
        scored AS (
            SELECT cl.cluster_id, cl.doc_id, CAST(length(d.text) AS BIGINT) AS score
            FROM cl JOIN documents d ON d.doc_id = cl.doc_id
        ),
        sel AS (
            SELECT cluster_id, doc_id, score,
                   row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC) AS rn,
                   count(*) OVER (PARTITION BY cluster_id) AS n_members
            FROM scored
        )
        SELECT cluster_id, n_members, doc_id AS rep_id, score AS rep_score
        FROM sel WHERE rn = 1
    """

    _sample_case = " ".join(
        f"WHEN '{lang}' THEN '{format(int(rate * 2**32), '08x')}'"
        for lang, rate in sorted(SAMPLE_RATES.items())
    )
    o["q_sample_stratified"] = f"""
        SELECT doc_id, text, lang, source, n_chars,
               substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key
        FROM documents
        WHERE substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)
              < CASE lang {_sample_case}
                ELSE '{format(int(SAMPLE_DEFAULT_RATE * 2**32), '08x')}' END
    """

    o["q5_region_volume"] = """
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) AS revenue_e4
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate <  DATE '1997-01-01'
        GROUP BY n_name
    """

    o["dedup_cluster_stats"] = f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        edges AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {JT}),
        sym AS (SELECT id_a AS s, id_b AS d FROM edges
                UNION ALL SELECT id_b, id_a FROM edges),
        cc(node, label) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT sym.d, cc.label FROM cc JOIN sym ON sym.s = cc.node
        ),
        cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node),
        sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1)
        SELECT cluster_size, count(*) AS n_clusters
        FROM sizes GROUP BY cluster_size
    """

    o["streaming_enrich_counts"] = """
        WITH dim AS (
            SELECT DISTINCT event_type,
                   CAST(length(event_type) AS BIGINT) AS wt
            FROM events
        )
        SELECT e.event_type,
               count(*) AS n_events,
               CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT) * d.wt) AS BIGINT) AS weighted_cents
        FROM events e JOIN dim d ON d.event_type = e.event_type
        GROUP BY e.event_type
    """

    o["text_line_dedup"] = """
        WITH planted AS (
            SELECT doc_id,
                   concat_ws(chr(10),
                       CASE WHEN doc_id % 2 = 0 THEN 'license: apache-2.0' END,
                       CASE WHEN doc_id % 3 = 0 THEN 'generated by fm-gen v1' END,
                       text,
                       'sig ' || md5(CAST(doc_id AS VARCHAR))) AS text
            FROM documents
        ),
        split AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM planted),
        pos AS (
            SELECT doc_id, arr, CAST(len(arr) AS BIGINT) AS n_lines,
                   unnest(range(1, len(arr) + 1)) AS i
            FROM split
        ),
        lines AS (SELECT doc_id, n_lines, i AS pos, arr[i] AS line FROM pos),
        bp AS (
            SELECT line
            FROM (SELECT DISTINCT line, doc_id FROM lines)
            GROUP BY line HAVING count(*) >= 2
        )
        SELECT l.doc_id,
               coalesce(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
                                   chr(10) ORDER BY l.pos), '') AS clean_text,
               l.n_lines,
               CAST(count(b.line) AS BIGINT) AS n_removed
        FROM lines l LEFT JOIN bp b ON l.line = b.line
        GROUP BY l.doc_id, l.n_lines
    """

    o["q_corpus_shuffle"] = """
        WITH ranked AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY md5('shuffle:' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS r
            FROM documents
        )
        SELECT doc_id,
               CAST(r AS BIGINT) AS shuffle_rank,
               CAST((r - 1) // 100 AS BIGINT) AS shard_id
        FROM ranked
    """

    o["q_partition_prune"] = """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS event_date,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-07' AND DATE '2024-01-09'
        GROUP BY 1, 2
    """

    o["q_rolling_window"] = """
        SELECT o_orderkey, o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS rolling_cents_30d
        FROM orders
    """

    o["q_funnel"] = """
        WITH t1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        t2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id
        ),
        t3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN t2 ON e.user_id = t2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id
        )
        SELECT '1_view' AS stage, count(*) AS n_users FROM t1
        UNION ALL SELECT '2_click', count(*) FROM t2
        UNION ALL SELECT '3_purchase', count(*) FROM t3
    """

    o["q_table_diff"] = """
        WITH oldt AS (SELECT doc_id, lang, text FROM documents),
        newt AS (
            SELECT doc_id, lang,
                   CASE WHEN doc_id % 31 = 0 THEN text || ' v2' ELSE text END AS text
            FROM documents WHERE doc_id % 97 <> 0
            UNION ALL
            SELECT doc_id + 1000000000, lang, 'new doc ' || CAST(doc_id AS VARCHAR)
            FROM documents WHERE doc_id % 53 = 0
        ),
        oh AS (
            SELECT doc_id, md5(concat_ws(chr(31),
                       coalesce(CAST(lang AS VARCHAR), chr(0)),
                       coalesce(CAST(text AS VARCHAR), chr(0)))) AS h
            FROM oldt
        ),
        nh AS (
            SELECT doc_id, md5(concat_ws(chr(31),
                       coalesce(CAST(lang AS VARCHAR), chr(0)),
                       coalesce(CAST(text AS VARCHAR), chr(0)))) AS h
            FROM newt
        )
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.h IS NULL THEN 'added'
                    WHEN n.h IS NULL THEN 'removed'
                    WHEN o.h <> n.h THEN 'changed' END AS status
        FROM oh o FULL OUTER JOIN nh n ON o.doc_id = n.doc_id
        WHERE (o.h IS NULL OR n.h IS NULL OR o.h <> n.h)
    """

    o["q_outlier_iqr"] = """
        WITH fences AS (
            SELECT event_type,
                   quantile_cont(value, 0.25) AS q1,
                   quantile_cont(value, 0.75) AS q3
            FROM events GROUP BY event_type
        ),
        b AS (
            SELECT event_type,
                   q1 - 1.5 * (q3 - q1) AS lo,
                   q3 + 1.5 * (q3 - q1) AS hi
            FROM fences
        )
        SELECT e.event_type,
               count(*) AS n_outliers,
               min(e.value) AS out_min,
               max(e.value) AS out_max
        FROM events e JOIN b ON e.event_type = b.event_type
        WHERE e.value < b.lo OR e.value > b.hi
        GROUP BY e.event_type
    """

    o["q_sample_weighted"] = """
        WITH wm AS (SELECT max(n_chars) AS w_max FROM documents)
        SELECT doc_id, n_chars,
               substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS sample_key
        FROM documents, wm
        WHERE substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8)
              < lpad(lower(hex(least(
                    CAST(floor(CAST(n_chars AS DOUBLE) / CAST(w_max AS DOUBLE)
                               * 4294967296.0) AS BIGINT),
                    4294967295))), 8, '0')
    """

    o["q_json_extract"] = """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
               CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
               count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS n_distinct_k
        FROM events
        GROUP BY event_type
    """

    o["q_zscore"] = """
        WITH c AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events
        ),
        stats AS (
            SELECT event_type,
                   CAST(sum(cents) AS BIGINT) AS s1,
                   CAST(sum(cents * cents) AS BIGINT) AS s2,
                   count(*) AS n
            FROM c GROUP BY event_type
        ),
        b AS (
            SELECT event_type,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
                   sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS sd_c
            FROM stats
        )
        SELECT c.event_id, c.event_type,
               (CAST(c.cents AS DOUBLE) - b.mean_c) / b.sd_c AS z
        FROM c JOIN b ON c.event_type = b.event_type
    """

    o["q_cooccurrence"] = """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_users
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    """

    o["q_percent_rank"] = """
        SELECT o_orderkey, o_orderpriority,
               percent_rank() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pr,
               cume_dist() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cd
        FROM orders
    """

    from facematch_spark.operators.layout import zorder_sql_expr

    o["q_zorder_layout"] = f"""
        WITH pts AS (
            SELECT event_id, user_id AS x,
                   CAST(props->>'$.k' AS BIGINT) AS y
            FROM events
        ),
        keyed AS (
            SELECT event_id, x, y, {zorder_sql_expr('x', 'y')} AS zkey
            FROM pts
        ),
        ranked AS (
            SELECT x, y,
                   row_number() OVER (ORDER BY zkey, event_id) AS rn
            FROM keyed
        )
        SELECT CAST((rn - 1) // 1000 AS BIGINT) AS shard_id,
               count(*) AS n_rows,
               min(x) AS x_min, max(x) AS x_max,
               min(y) AS y_min, max(y) AS y_max
        FROM ranked
        GROUP BY 1
    """

    o["q_quantile_bins"] = """
        WITH cuts AS (
            SELECT quantile_cont(o_totalprice,
                [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
            FROM orders
        ),
        binned AS (
            SELECT CAST(len(list_filter(bs, b -> o_totalprice > b)) AS BIGINT)
                       AS bin,
                   o_totalprice
            FROM orders, cuts
        )
        SELECT bin, count(*) AS n,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM binned GROUP BY bin
    """

    o["q_events_sliding"] = """
        WITH starts AS (
            SELECT event_type,
                   unnest([date_trunc('hour', ts),
                           date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
            FROM events
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type, count(*) AS n_events
        FROM starts GROUP BY 1, 2
    """

    o["q4_order_priority"] = """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1995-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
    """

    o["q_gapfill_hours"] = """
        WITH ev AS (
            SELECT date_trunc('hour', ts) AS h, event_type FROM events
        ),
        bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
        hours AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds
        ),
        counts AS (
            SELECT h, event_type, count(*) AS n FROM ev GROUP BY 1, 2
        )
        SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
               g.event_type,
               COALESCE(c.n, 0) AS n_events
        FROM (SELECT h, event_type
              FROM hours, (SELECT DISTINCT event_type FROM ev)) g
        LEFT JOIN counts c ON c.h = g.h AND c.event_type = g.event_type
    """

    # SNM: rank on the normalized 12-char prefix key (DuckDB regexp_replace
    # needs the explicit 'g' flag — Spark replaces all matches by default),
    # window-4 successors, verified against the shared exact-Jaccard CTE.
    o["dedup_snm"] = f"""
        WITH snmdocs AS (
            SELECT doc_id, text FROM documents WHERE length(text) >= {K}
        ),
        {_shingles_cte('snmdocs')},
        keyed AS (
            SELECT doc_id,
                   substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                          1, 12) AS skey
            FROM snmdocs
        ),
        ranked AS (
            SELECT doc_id, row_number() OVER (ORDER BY skey, doc_id) AS rn
            FROM keyed
        ),
        cand AS (
            SELECT least(a.doc_id, b.doc_id) AS id_a,
                   greatest(a.doc_id, b.doc_id) AS id_b
            FROM ranked a JOIN ranked b
              ON b.rn > a.rn AND b.rn <= a.rn + 4
        )
        SELECT c.id_a, c.id_b, j.jaccard
        FROM cand c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
        WHERE j.jaccard >= {JT}
    """

    o["dedup_edit_distance"] = """
        WITH sliced AS (
            SELECT doc_id, text, lang
            FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            LIMIT 512
        ),
        d AS (
            SELECT doc_id, text, lang,
                   CAST(length(text) AS BIGINT) AS len,
                   length(text) // 128 AS band
            FROM sliced WHERE length(text) <= 640
        ),
        scored AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
                   greatest(a.len, b.len) AS ml
            FROM d a JOIN d b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND abs(a.band - b.band) <= 1
        )
        SELECT id_a, id_b, dist,
               CAST(1.0 AS DOUBLE) - (dist / ml) AS sim
        FROM scored WHERE dist * 5 <= ml
    """

    # co-purchase graph CTEs shared by the two graph oracles.
    _graph_ctes = """
        ip AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM ip a JOIN ip b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        ed AS (
            SELECT u AS src, v AS dst FROM edges
            UNION ALL SELECT v, u FROM edges
        ),
        deg AS (SELECT src AS p, count(*) AS d FROM ed GROUP BY 1)
    """

    o["q_triangle_count"] = f"""
        WITH {_graph_ctes},
        oriented AS (
            SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                        THEN e.u ELSE e.v END AS src,
                   CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                        THEN e.v ELSE e.u END AS dst
            FROM edges e
            JOIN deg du ON du.p = e.u
            JOIN deg dv ON dv.p = e.v
        ),
        tri AS (
            SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
            FROM oriented o1
            JOIN oriented o2 ON o1.src = o2.src AND o1.dst <> o2.dst
            JOIN oriented o3 ON o3.src = o1.dst AND o3.dst = o2.dst
        ),
        verts AS (
            SELECT a AS part_id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT part_id, count(*) AS n_triangles FROM verts GROUP BY 1
    """

    # PageRank unrolled to 3 rounds: integer micro-units, floor division at
    # every step (// in DuckDB == div in Spark for positive BIGINTs), so
    # the iterative result is bit-exact across engines.
    _pr_round = """
        {out} AS (
            SELECT e.dst AS p,
                   CAST(150000 + (85 * sum({prev}.pr // deg.d)) // 100 AS BIGINT) AS pr
            FROM ed e
            JOIN {prev} ON {prev}.p = e.src
            JOIN deg ON deg.p = e.src
            GROUP BY e.dst
        )
    """
    o["q_pagerank"] = f"""
        WITH {_graph_ctes},
        pr0 AS (SELECT p, CAST(1000000 AS BIGINT) AS pr FROM deg),
        {_pr_round.format(out="pr1", prev="pr0")},
        {_pr_round.format(out="pr2", prev="pr1")},
        {_pr_round.format(out="pr3", prev="pr2")}
        SELECT p AS part_id, pr AS pr_micro FROM pr3
    """

    o["q_retention_cohorts"] = """
        WITH ev AS (
            SELECT user_id, date_trunc('day', ts) AS day FROM events
        ),
        firsts AS (
            SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1
        ),
        r AS (
            SELECT DISTINCT e.user_id, f.cohort,
                   CAST(date_diff('day', f.cohort, e.day) AS BIGINT) AS period
            FROM ev e JOIN firsts f ON e.user_id = f.user_id
        )
        SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, period,
               count(*) AS n_users
        FROM r GROUP BY 1, 2
    """

    o["q_markov_transitions"] = """
        WITH seq AS (
            SELECT event_type AS src_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS dst_type
            FROM events
        ),
        counts AS (
            SELECT src_type, dst_type, count(*) AS n_transitions
            FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT src_type, dst_type, n_transitions,
               CAST(n_transitions AS DOUBLE)
                   / sum(n_transitions) OVER (PARTITION BY src_type)
                   AS p_transition
        FROM counts
    """

    # Skyline oracle: the O(N²) NOT-EXISTS dominance definition — an
    # INDEPENDENT formulation of the frontier, not a mirror of the
    # prefix-scan reduction the Spark side uses.
    o["q_skyline"] = """
        SELECT p_partkey, p_retailprice, p_size
        FROM part m
        WHERE NOT EXISTS (
            SELECT 1 FROM part o
            WHERE o.p_retailprice <= m.p_retailprice
              AND o.p_size >= m.p_size
              AND (o.p_retailprice < m.p_retailprice OR o.p_size > m.p_size)
        )
    """

    o["q_expectations"] = """
        WITH checks AS (
            SELECT 'orderkey_not_null' AS check_name,
                   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violations
            FROM orders
            UNION ALL
            SELECT 'orderkey_unique',
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'totalprice_in_range',
                   CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 200000
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'orderdate_before_2000',
                   CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01'
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'priority_known',
                   CAST(sum(CASE WHEN o_orderpriority NOT IN
                            ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'custkey_fk_customer',
                   CAST((SELECT count(*) FROM orders o
                         WHERE NOT EXISTS (SELECT 1 FROM customer c
                                           WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        )
        SELECT check_name, n_violations, n_violations = 0 AS passed FROM checks
    """

    o["q_incremental_agg"] = """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               min(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS min_cents,
               max(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS max_cents
        FROM orders
        GROUP BY o_orderpriority
    """

    o["q_mode_per_group"] = """
        WITH counts AS (
            SELECT user_id, event_type, count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT user_id, event_type, n_events,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY n_events DESC, event_type ASC
                   ) AS rn
            FROM counts
        )
        SELECT user_id, event_type, n_events FROM ranked WHERE rn = 1
    """

    o["q_except_all"] = """
        WITH a AS (
            SELECT user_id, event_type FROM events
            WHERE ts < TIMESTAMP '2024-01-16'
        ),
        b AS (
            SELECT user_id, event_type FROM events
            WHERE ts >= TIMESTAMP '2024-01-16'
        ),
        ex AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        SELECT user_id, event_type, count(*) AS n_remaining
        FROM ex GROUP BY 1, 2
    """

    o["q17_small_qty_revenue"] = """
        SELECT p.p_brand,
               count(*) AS n_small,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY p.p_brand
    """

    o["q13_order_count_dist"] = """
        WITH per_cust AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS n_custs FROM per_cust GROUP BY c_count
    """

    # Direct (unsharded) KMV — deliberately NOT the shard-merge form the
    # Spark side runs: agreement proves state mergeability.
    o["q_sketch_merge"] = """
        WITH hv AS (
            SELECT DISTINCT o_orderpriority AS priority,
                   ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS hv
            FROM orders
        ),
        ranked AS (
            SELECT priority, hv,
                   row_number() OVER (PARTITION BY priority ORDER BY hv) AS rn
            FROM hv
        )
        SELECT priority,
               round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                          ELSE 63.0 * 4294967296.0 / max(hv) END, 2) AS est_distinct
        FROM ranked WHERE rn <= 64 GROUP BY priority
    """

    o["q_pareto_revenue"] = """
        WITH rev AS (
            SELECT l_partkey AS part_id,
                   CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM lineitem GROUP BY 1
        ),
        scanned AS (
            SELECT part_id, revenue_cents,
                   CAST(sum(revenue_cents) OVER (
                       ORDER BY revenue_cents DESC, part_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS cum_cents,
                   CAST(sum(revenue_cents) OVER () AS BIGINT) AS total
            FROM rev
        )
        SELECT part_id, revenue_cents, cum_cents,
               (cum_cents - revenue_cents) * 10 < total * 8 AS in_top80
        FROM scanned
    """

    o["q_anomaly_mad"] = """
        WITH med AS (
            SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
            FROM orders GROUP BY 1
        ),
        dev AS (
            SELECT o.o_orderpriority, m.med,
                   abs(o.o_totalprice - m.med) AS d
            FROM orders o JOIN med m ON m.o_orderpriority = o.o_orderpriority
        ),
        stats AS (
            SELECT o_orderpriority, any_value(med) AS med,
                   quantile_cont(d, 0.5) AS mad
            FROM dev GROUP BY 1
        )
        SELECT d.o_orderpriority, any_value(s.med) AS med,
               any_value(s.mad) AS mad,
               CAST(sum(CASE WHEN d.d > 3 * s.mad THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM dev d JOIN stats s ON s.o_orderpriority = d.o_orderpriority
        GROUP BY d.o_orderpriority
    """

    o["q_array_hof"] = """
        SELECT doc_id,
               CAST(len(list_filter(
                   list_transform(string_split(text, ' '), t -> lower(t)),
                   t -> length(t) > 3
               )) AS BIGINT) AS n_long_tokens,
               CAST(coalesce(list_sum(list_transform(
                   list_filter(
                       list_transform(string_split(text, ' '), t -> lower(t)),
                       t -> length(t) > 3
                   ),
                   t -> length(t)
               )), 0) AS BIGINT) AS chars_long_tokens
        FROM documents
    """

    o["q_merge_join_stats"] = """
        SELECT o.o_orderstatus, l.l_returnflag,
               count(*) AS n_items,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    """

    # One-shot merge of all three change waves — the streaming loop must
    # land on exactly this snapshot.
    o["streaming_merge_apply"] = """
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                   o_orderpriority
            FROM orders
        ),
        versions AS (
            SELECT *, 'U' AS op, 0 AS seq FROM base
            UNION ALL
            SELECT o_orderkey, o_custkey, 'X', cents + 100, o_orderpriority,
                   'U', 1
            FROM base WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, cents, o_orderpriority,
                   'D', 2
            FROM base WHERE o_orderkey % 17 = 3
            UNION ALL
            SELECT o_orderkey, o_custkey, 'Y', cents + 200, o_orderpriority,
                   'U', 3
            FROM base WHERE o_orderkey % 20 = 0
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY o_orderkey ORDER BY seq DESC
            ) AS rn
            FROM versions
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, cents, o_orderpriority
        FROM ranked WHERE rn = 1 AND op = 'U'
    """

    # floor(epoch()) because DuckDB epoch() keeps fractional seconds while
    # Spark unix_timestamp truncates; DuckDB CAST double->int would ROUND.
    o["q_regression_slope"] = """
        WITH ev AS (
            SELECT event_type,
                   (CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 3600 AS hr,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events
        ),
        s AS (
            SELECT event_type, count(*) AS n,
                   sum(hr) AS sx, sum(cents) AS sy,
                   sum(hr * cents) AS sxy, sum(hr * hr) AS sxx
            FROM ev GROUP BY 1
        )
        SELECT event_type, n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_hr,
               CAST(sy * sxx - sx * sxy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept_cents
        FROM s
    """

    o["q_link_prediction"] = """
        WITH ip AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ok AS (SELECT l_orderkey FROM ip GROUP BY 1 HAVING count(*) <= 5),
        ip2 AS (SELECT ip.* FROM ip SEMI JOIN ok USING (l_orderkey)),
        edges AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM ip2 a JOIN ip2 b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        ed AS (
            SELECT u AS w, v AS n FROM edges
            UNION ALL SELECT v, u FROM edges
        ),
        deg AS (SELECT w, count(*) AS d FROM ed GROUP BY 1),
        wed AS (
            SELECT e.w, e.n, 1000000 // deg.d AS wt
            FROM ed e JOIN deg ON deg.w = e.w
        ),
        pairs AS (
            SELECT a.n AS u, b.n AS v, CAST(sum(a.wt) AS BIGINT) AS score_micro
            FROM wed a JOIN wed b ON a.w = b.w AND a.n < b.n
            GROUP BY 1, 2
        ),
        non_edges AS (
            SELECT p.* FROM pairs p
            ANTI JOIN edges e ON e.u = p.u AND e.v = p.v
        ),
        ranked AS (
            SELECT u, v, score_micro,
                   row_number() OVER (
                       PARTITION BY u ORDER BY score_micro DESC, v ASC
                   ) AS rn
            FROM non_edges
        )
        SELECT u, v, score_micro FROM ranked WHERE rn <= 10
    """

    o["q_gini_diversity"] = """
        WITH c AS (
            SELECT user_id, event_type, count(*) AS n_i
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, CAST(sum(n_i) AS BIGINT) AS n,
               CAST(1.0 AS DOUBLE)
                   - CAST(sum(n_i * n_i) AS DOUBLE)
                   / CAST(sum(n_i) * sum(n_i) AS DOUBLE) AS gini
        FROM c GROUP BY user_id
    """

    # k-means unrolled to 2 Lloyd rounds + final assignment. Centroid
    # update is floor(double division) in BOTH engines (integer // vs div
    # disagree on negatives); struct fields in list_zip lambdas need
    # numeric indices in DuckDB.
    _km_assign = """
    (
        SELECT p.vec_id, c.cid,
               CAST(list_sum(list_transform(list_zip(p.q, c.cq),
                    z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS dist
        FROM pts p CROSS JOIN {cent} c
        QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY dist, c.cid) = 1
    )
    """
    _km_update = """
    (
        SELECT a.cid AS cid, list(c ORDER BY dim) AS cq FROM (
            SELECT {assign}.cid, r.range AS dim,
                   CAST(floor(CAST(sum(p.q[r.range]) AS DOUBLE) / count(*))
                        AS BIGINT) AS c
            FROM {assign} JOIN pts p USING (vec_id), range(1, 65) r
            GROUP BY {assign}.cid, r.range
        ) a GROUP BY a.cid
    )
    """
    o["q_kmeans"] = f"""
        WITH pts AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS q
            FROM embeddings
        ),
        init AS (
            SELECT vec_id,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) - 1 AS cid
            FROM embeddings
        ),
        cent0 AS (
            SELECT i.cid, p.q AS cq FROM init i JOIN pts p USING (vec_id)
            WHERE i.cid < 4
        ),
        a1 AS {_km_assign.format(cent="cent0")},
        cent1 AS {_km_update.format(assign="a1")},
        a2 AS {_km_assign.format(cent="cent1")},
        cent2 AS {_km_update.format(assign="a2")}
        SELECT p.vec_id, c.cid AS cluster
        FROM pts p CROSS JOIN cent2 c
        QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY
            CAST(list_sum(list_transform(list_zip(p.q, c.cq),
                 z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT), c.cid) = 1
    """

    o["q_intersect_all"] = """
        WITH a AS (
            SELECT user_id, event_type FROM events
            WHERE ts < TIMESTAMP '2024-01-16'
        ),
        b AS (
            SELECT user_id, event_type FROM events
            WHERE ts >= TIMESTAMP '2024-01-16'
        ),
        ix AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        SELECT user_id, event_type, count(*) AS n_common
        FROM ix GROUP BY 1, 2
    """

    o["q_sample_fixed_n"] = f"""
        WITH keyed AS (
            SELECT doc_id, lang,
                   substr(md5('fixn:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, lang, sample_key,
                   row_number() OVER (PARTITION BY lang ORDER BY sample_key, doc_id) AS rnk
            FROM keyed
        )
        SELECT doc_id, lang, sample_key, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= {FIXED_N}
    """

    # cumulative split thresholds, generated by the same loop as
    # leakage_safe_split (sorted split names, consecutive half-open hash
    # intervals) so entry and oracle can never disagree on a boundary
    from facematch_spark.operators.sampling import rate_to_hex_threshold

    _split_names = sorted(SPLIT_FRACTIONS)
    _split_case, _cum = "", 0.0
    for _name in _split_names[:-1]:
        _cum += SPLIT_FRACTIONS[_name]
        _split_case += (
            f"WHEN split_key < '{rate_to_hex_threshold(_cum)}' THEN '{_name}' "
        )
    o["q_curation_split"] = f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        edges AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {JT}),
        sym AS (SELECT id_a AS s, id_b AS d FROM edges
                UNION ALL SELECT id_b, id_a FROM edges),
        cc(node, label) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT sym.d, cc.label FROM cc JOIN sym ON sym.s = cc.node
        ),
        cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node),
        keyed AS (
            SELECT cl.doc_id, d.lang, cl.cluster_id,
                   substr(md5('split:' || CAST(cl.cluster_id AS VARCHAR)), 1, 8) AS split_key
            FROM cl JOIN documents d ON d.doc_id = cl.doc_id
        )
        SELECT doc_id, lang, cluster_id, split_key,
               CASE {_split_case}ELSE '{_split_names[-1]}' END AS split
        FROM keyed
    """

    o["q_hot_keys"] = f"""
        WITH sh AS (
            SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {K}) AS shingle
            FROM documents, UNNEST(range(1, length(text) - {K - 2})) AS t(i)
        ),
        c AS (SELECT shingle AS key, count(*) AS n FROM sh GROUP BY 1),
        t AS (SELECT sum(n) AS total FROM c)
        SELECT key, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        FROM c, t
        ORDER BY n DESC, key ASC
        LIMIT 20
    """

    o["q_histogram"] = """
        WITH v AS (
            SELECT CAST(floor(o_totalprice) AS BIGINT) AS v
            FROM orders WHERE o_totalprice IS NOT NULL
        ),
        b AS (SELECT min(v) AS mn, (max(v) - min(v)) // 12 + 1 AS w FROM v)
        SELECT (v.v - b.mn) // b.w AS bin_id,
               b.mn + ((v.v - b.mn) // b.w) * b.w AS lo,
               b.mn + ((v.v - b.mn) // b.w + 1) * b.w - 1 AS hi,
               count(*) AS n
        FROM v, b
        GROUP BY 1, 2, 3
    """

    o["q_salted_join"] = """
        WITH dim AS (
            SELECT DISTINCT event_type,
                   CAST(length(event_type) AS BIGINT) AS wt
            FROM events
        )
        SELECT e.user_id,
               count(*) AS n_events,
               CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT) * d.wt) AS BIGINT) AS weighted_cents
        FROM events e JOIN dim d ON d.event_type = e.event_type
        GROUP BY e.user_id
    """

    o["dedup_decontaminate"] = f"""
        WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
        sha AS (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {K}) AS shingle
          FROM tr, UNNEST(range(1, length(text) - {K - 2})) AS t(i)
        ),
        shb AS (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {K}) AS shingle
          FROM ev, UNNEST(range(1, length(text) - {K - 2})) AS t(i)
        ),
        ca AS (SELECT doc_id, count(*) AS n FROM sha GROUP BY doc_id),
        cb AS (SELECT doc_id, count(*) AS n FROM shb GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sha a JOIN shb b ON a.shingle = b.shingle
          GROUP BY 1, 2
        ),
        hits AS (
          SELECT id_a, id_b, CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS jaccard
          FROM inter JOIN ca ON ca.doc_id = id_a JOIN cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= {JT}
        ),
        ranked AS (
          SELECT id_a, id_b, jaccard,
                 row_number() OVER (PARTITION BY id_a ORDER BY jaccard DESC, id_b ASC) AS rn
          FROM hits
        )
        SELECT id_a AS doc_id, id_b AS matched_eval_id, jaccard
        FROM ranked WHERE rn = 1
    """

    o["curation_pipeline"] = f"""
        WITH RECURSIVE qdocs AS (
            SELECT * FROM documents WHERE length(text) >= 100
        ),
        {_shingles_cte('qdocs')},
        edges AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {JT}),
        sym AS (SELECT id_a AS s, id_b AS d FROM edges
                UNION ALL SELECT id_b, id_a FROM edges),
        cc(node, label) AS (
            SELECT doc_id, doc_id FROM qdocs
            UNION
            SELECT sym.d, cc.label FROM cc JOIN sym ON sym.s = cc.node
        ),
        cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node),
        scored AS (
            SELECT cl.cluster_id, cl.doc_id, CAST(length(d.text) AS BIGINT) AS score
            FROM cl JOIN qdocs d ON d.doc_id = cl.doc_id
        ),
        sel AS (
            SELECT cluster_id, doc_id, score,
                   row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC) AS rn,
                   count(*) OVER (PARTITION BY cluster_id) AS n_members
            FROM scored
        ),
        reps AS (SELECT cluster_id, n_members, doc_id AS rep_id FROM sel WHERE rn = 1)
        SELECT d.doc_id, d.lang, r.cluster_id, r.n_members,
               substr(md5('sample:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS sample_key
        FROM qdocs d JOIN reps r ON r.rep_id = d.doc_id
        WHERE substr(md5('sample:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
              < CASE d.lang {_sample_case}
                ELSE '{format(int(SAMPLE_DEFAULT_RATE * 2**32), '08x')}' END
    """

    o["dedup_containment"] = """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM documents a, documents b
        WHERE a.doc_id != b.doc_id
          AND length(a.text) >= 16
          AND length(a.text) < length(b.text)
          AND position(a.text IN b.text) > 0
    """

    o["text_token_count"] = rf"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '[{_WSC}]+'), x -> x != '')) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9{_WSC}]')) AS n_subwords,
               length(text) AS n_chars_exact
        FROM documents
    """

    _stop = "['the','a','and','of','to','in','is','with','for','on']"
    o["text_quality"] = rf"""
        WITH toks AS (
            SELECT doc_id, text,
                   list_filter(regexp_split_to_array(text, '[{_WSC}]+'), x -> x != '') AS tk
            FROM documents
        )
        SELECT doc_id,
               round(length(text) / greatest(len(tk), 1), 4) AS mean_word_len,
               round(len(list_filter(tk, x -> list_contains({_stop}, lower(x)))) / greatest(len(tk), 1), 4) AS stopword_ratio,
               round((length(text) - length(regexp_replace(text, '[^\w{_WSC}]', '', 'g'))) / greatest(length(text), 1), 4) AS punct_ratio,
               round(length(regexp_replace(text, '[^A-Z]', '', 'g')) / greatest(length(text), 1), 4) AS upper_ratio
        FROM toks
    """

    o["text_langid"] = rf"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '[{_WSC}]+'), x -> x != '') AS tk
            FROM documents
        )
        SELECT doc_id,
               round(len(list_filter(tk, x -> list_contains({_stop}, lower(x)))) / greatest(len(tk), 1), 4) AS en_score,
               CASE WHEN len(list_filter(tk, x -> list_contains({_stop}, lower(x)))) / greatest(len(tk), 1) >= 0.08
                    THEN 'en' ELSE 'unknown' END AS pred_lang
        FROM toks
    """

    o["text_fingerprint"] = rf"""
        SELECT doc_id,
               md5(text) AS fp_exact,
               md5(trim(regexp_replace(lower(text), '[{_WSC}]+', ' ', 'g'))) AS fp_normalized
        FROM documents
    """

    _pii_email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _pii_ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    _pii_phone = r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"
    o["text_pii_redact"] = rf"""
        WITH planted AS (
            SELECT doc_id,
                   text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex-a.io'
                        || CASE WHEN doc_id % 5 = 0
                                THEN ' cc u' || CAST(doc_id AS VARCHAR) || 'b@ex-b.org'
                                ELSE '' END
                        || ' ip 10.1.' || CAST(doc_id % 254 AS VARCHAR) || '.7'
                        || CASE WHEN doc_id % 3 = 0 THEN ' tel 555-123-4567' ELSE '' END
                   AS text
            FROM documents
        ),
        s1 AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_pii_email}')) AS n_email,
                   regexp_replace(text, '{_pii_email}', '<EMAIL>', 'g') AS t1
            FROM planted
        ),
        s2 AS (
            SELECT doc_id, n_email,
                   len(regexp_extract_all(t1, '{_pii_ipv4}')) AS n_ipv4,
                   regexp_replace(t1, '{_pii_ipv4}', '<IP>', 'g') AS t2
            FROM s1
        )
        SELECT doc_id, n_email, n_ipv4,
               len(regexp_extract_all(t2, '{_pii_phone}')) AS n_phone,
               regexp_replace(t2, '{_pii_phone}', '<PHONE>', 'g') AS redacted_text,
               md5(regexp_replace(t2, '{_pii_phone}', '<PHONE>', 'g')) AS redacted_fp
        FROM s2
    """

    o["text_tfidf"] = rf"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '[{_WSC}]+'), x -> x != '') AS tk
            FROM documents
        ),
        tf AS (
            SELECT doc_id, t AS term, count(*) AS tf
            FROM (SELECT doc_id, unnest(tk) AS t FROM toks)
            GROUP BY doc_id, t
        ),
        scored AS (
            SELECT doc_id, term, tf,
                   count(*) OVER (PARTITION BY term) AS df,
                   round(tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
                                 / count(*) OVER (PARTITION BY term)), 4) AS score
            FROM tf
        )
        SELECT doc_id, rank, term, tf, df, score
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
              FROM scored)
        WHERE rank <= 3
    """

    o["text_repetition"] = rf"""
        WITH toks AS (
            SELECT doc_id, greatest(length(text), 1) AS n_chars,
                   list_filter(regexp_split_to_array(text, '[{_WSC}]+'), x -> x != '') AS tk
            FROM documents
        ),
        tok_counts AS (
            SELECT doc_id, t, count(*) AS cnt
            FROM (SELECT doc_id, unnest(tk) AS t FROM toks)
            GROUP BY doc_id, t
        ),
        tok_agg AS (
            SELECT doc_id, sum(cnt) AS n_tok,
                   sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_tok
            FROM tok_counts GROUP BY doc_id
        ),
        g2 AS (
            SELECT doc_id, g, count(*) AS cnt
            FROM (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS g
                  FROM toks WHERE len(tk) >= 2)
            GROUP BY doc_id, g
        ),
        g3 AS (
            SELECT doc_id, g, count(*) AS cnt
            FROM (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk) - 1)]) AS g
                  FROM toks WHERE len(tk) >= 3)
            GROUP BY doc_id, g
        ),
        top2 AS (
            SELECT doc_id, cnt * length(g) AS top2_chars
            FROM (SELECT doc_id, g, cnt,
                         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS rn
                  FROM g2)
            WHERE rn = 1
        ),
        top3 AS (
            SELECT doc_id, cnt * length(g) AS top3_chars
            FROM (SELECT doc_id, g, cnt,
                         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS rn
                  FROM g3)
            WHERE rn = 1
        ),
        dup2 AS (
            SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) AS dup2_chars
            FROM g2 GROUP BY doc_id
        )
        SELECT t.doc_id,
               round(coalesce(top2_chars, 0) / t.n_chars, 4) AS top_2gram_frac,
               round(coalesce(top3_chars, 0) / t.n_chars, 4) AS top_3gram_frac,
               round(coalesce(dup2_chars, 0) / t.n_chars, 4) AS dup_2gram_frac,
               round(coalesce(dup_tok, 0) / greatest(coalesce(n_tok, 0), 1), 4) AS dup_token_frac
        FROM toks t
        LEFT JOIN tok_agg USING (doc_id)
        LEFT JOIN top2 USING (doc_id)
        LEFT JOIN top3 USING (doc_id)
        LEFT JOIN dup2 USING (doc_id)
    """

    _sk = 30  # == SPAN_K
    o["dedup_duplicate_spans"] = f"""
        WITH eligible AS (
            SELECT doc_id, text FROM documents WHERE length(text) >= {_sk}
        ),
        gd AS (
            SELECT doc_id,
                   unnest(list_distinct([substr(text, i, {_sk}) for i in range(1, length(text) - {_sk - 2})])) AS g
            FROM eligible
        ),
        dup AS (SELECT g FROM gd GROUP BY g HAVING count(*) >= 2),
        pos AS (
            SELECT doc_id, i AS pos, substr(text, i, {_sk}) AS g
            FROM (SELECT doc_id, text, unnest(range(1, length(text) - {_sk - 2})) AS i FROM eligible)
        ),
        dpos AS (
            SELECT doc_id, pos FROM pos WHERE g IN (SELECT g FROM dup)
        ),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_sk}
                        THEN 1 ELSE 0 END AS b
            FROM dpos
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM brk
        )
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {_sk} AS BIGINT) AS span_end,
               CAST(max(pos) + {_sk} - min(pos) AS BIGINT) AS span_len
        FROM isl GROUP BY doc_id, island
    """

    _spans_cte = o["dedup_duplicate_spans"]
    o["dedup_span_stats"] = f"""
        WITH spans AS ({_spans_cte}),
        per_doc AS (
            SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_chars
            FROM spans GROUP BY doc_id
        ),
        stats AS (
            SELECT d.doc_id,
                   coalesce(p.dup_chars, 0) AS dup_chars,
                   round(coalesce(p.dup_chars, 0) / greatest(length(d.text), 1), 4) AS dup_frac
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        )
        SELECT doc_id, dup_chars, dup_frac,
               CASE WHEN dup_frac >= 0.8 THEN 'drop'
                    WHEN dup_chars > 0 THEN 'cut'
                    ELSE 'keep' END AS action
        FROM stats
    """

    o["ann_cosine_topk"] = """
        WITH scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   round(
                     (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                      FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                     / (
                       sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                             FROM (SELECT unnest(a.embedding) AS x)))
                       *
                       sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
                             FROM (SELECT unnest(b.embedding) AS y)))
                     ), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """

    o["dedup_embedding_cosine"] = """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(
                 (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                  FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                 / (
                   sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                         FROM (SELECT unnest(a.embedding) AS x)))
                   *
                   sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
                         FROM (SELECT unnest(b.embedding) AS y)))
                 ), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(
                 (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                  FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                 / (
                   sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                         FROM (SELECT unnest(a.embedding) AS x)))
                   *
                   sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
                         FROM (SELECT unnest(b.embedding) AS y)))
                 ), 6) >= 0.3
    """

    o["multimodal_meta"] = """
        SELECT doc_id AS media_id, 'image' AS kind,
               octet_length(encode(text)) AS byte_len,
               sha256(text) AS sha256,
               CAST(NULL AS VARCHAR) AS magic,
               CASE WHEN octet_length(encode(text)) > 0 THEN 'ok' ELSE 'empty' END AS status
        FROM documents
    """

    o["multimodal_frames"] = """
        SELECT doc_id AS media_id,
               least(8, greatest(1, octet_length(encode(text)) // 1024)) AS n_frames
        FROM documents
        WHERE octet_length(encode(text)) > 0
    """

    # dedup_minhash_lsh: the Spark side generates candidates with MinHash
    # banding (deterministic, recall 1.0 at this corpus/config — see the
    # queries() docstring) and verifies with EXACT Jaccard over normalized
    # char-9-gram sets, so the brute-force join below is value-equal.
    # PRECONDITION (beyond the recall caveat): equality holds for ASCII,
    # classify-clean corpora — the kernel shingles UTF-8 BYTES while the
    # oracle's substr is per CHARACTER, and _classify-dropped docs
    # (non-text / empty / > max_content_bytes) never enter the Spark side.
    # Verified for the driver testdata: every documents.parquet doc is pure
    # ASCII and ≤ 577 bytes at all SFs (checked 2026-08-16).
    o["dedup_minhash_lsh"] = f"""
        WITH nd AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '[{_WSC}]+', ' ', 'g')) AS t
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), {K}) AS shingle
            FROM nd, UNNEST(range(1, length(t) - {K - 2})) AS u(i)
        ),
        card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        jpairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        FROM jpairs
        JOIN card ca ON ca.doc_id = id_a
        JOIN card cb ON cb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= {JT}
    """

    # dedup_simhash: md5-family SimHash is SQL-expressible end-to-end —
    # shingle hash = first 15 md5 hex chars as a 60-bit int, per-bit ±1
    # sums, fingerprint reassembly, brute-force Hamming ≤ 8. The Spark side
    # computes the identical fingerprint and prunes candidates with an
    # EXACT pigeonhole join, so outputs match bit for bit.
    _SIM_BITS = 60
    _sums = ",\n               ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(_SIM_BITS)
    )
    _fp = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(_SIM_BITS)
    )
    o["dedup_simhash"] = f"""
        WITH nd AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '[{_WSC}]+', ' ', 'g')) AS t
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), {K}) AS shingle
            FROM nd, UNNEST(range(1, length(t) - {K - 2})) AS u(i)
        ),
        h AS (
            SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
            FROM sh
        ),
        bits AS (
            SELECT doc_id,
               {_sums}
            FROM h GROUP BY doc_id
        ),
        fp AS (SELECT doc_id, ({_fp}) AS fp FROM bits)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 8
    """

    # ann_lsh_topk / ann_ivf_topk: approximate results can't be bit-matched
    # against SQL, but the report's per-query EXACT column can — the Spark
    # query emits (query_id, true_nn, recall_pass) where true_nn is the
    # brute-force nearest neighbor, and the oracle RECOMPUTES that column
    # with the same exact-NN SQL the ann_cosine_topk oracle uses (6-dp
    # rounding + neighbor-id tiebreak), so the hash verifies real values.
    # recall_pass is the global recall@1 ≥ 0.9 verdict repeated per row
    # (DuckDB can't rerun the approximate path, so the contract bit is
    # global); a recall regression flips it everywhere and fails the hash.
    # (The raw top-k paths stay pytest-gated in tests/test_operators.py.)
    # The oracle carries the SAME md5-ordered query sampling as
    # _ann_recall_report (ADVICE r4): above 20k rows both sides evaluate the
    # identical deterministic sample, so the row sets agree at ANY corpus
    # size and the oracle's exact-NN cost stays O(sample × N), never O(N²).
    # At or below 20k rows the LIMIT is a no-op and the rows are unchanged.
    _ann_contract = """
        WITH q AS (
            SELECT vec_id, embedding FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 20000
        ),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   round(
                     (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                      FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                     / (
                       sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                             FROM (SELECT unnest(a.embedding) AS x)))
                       *
                       sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
                             FROM (SELECT unnest(b.embedding) AS y)))
                     ), 6) AS cosine
            FROM q a JOIN embeddings b ON a.vec_id != b.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id AS true_nn,
               CAST(TRUE AS BOOLEAN) AS recall_pass
        FROM ranked WHERE rank = 1
    """
    o["ann_lsh_topk"] = _ann_contract
    o["ann_ivf_topk"] = _ann_contract
    return o
