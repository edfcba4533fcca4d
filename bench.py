"""Benchmark harness. Runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (sec), "unit", "queries": {name: sec}, "sf",
"files_per_sec", ...}.

The headline metric is the end-to-end dedup dataflow (sign → MinHash/LSH →
verify → cluster) over the documents corpus — the BASELINE.json target is
files/sec for exactly this dataflow. Scaling evidence (local[8] vs local[32])
is produced by bench/scaling.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: str, quiet: bool = True) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from facematch_spark.config import DedupeConfig
    from facematch_spark.operators.cluster import connected_components
    from facematch_spark.operators.dedup import minhash_lsh_pairs
    from facematch_spark.session import get_spark

    # tmpfs shuffle dir for the local measurement harness only (a cluster
    # keeps its executor-local disks): this sandbox's shared virtio disk
    # and its page-fault windows otherwise add minutes of variance.
    local_dir = "/dev/shm/fm_spark_local"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name="facematch_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) if cpus.isdigit() else 32, 8),
        extra_conf={"spark.local.dir": local_dir},
    )
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_files = docs.count()
    timings: dict[str, float] = {}

    def _drop_leaked_blocks() -> None:
        # localCheckpoint blocks persist until their DataFrame is GC'd —
        # across 20 queries in one session they pile up in block-manager
        # memory and degrade every later query (measured: multimodal_meta
        # 0.55 s fresh vs 30 s late in a leaky session).
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(m.keySet().toArray()):
            m.get(rid).unpersist()
        # release Python-held broadcast handles so the JVM ContextCleaner
        # can drop their blocks too
        import gc

        gc.collect()

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        _drop_leaked_blocks()

    # ---- headline: end-to-end dedup dataflow over documents ----
    cfg = DedupeConfig(jaccard_threshold=0.5)

    def e2e():
        pairs = minhash_lsh_pairs(docs, cfg).localCheckpoint()
        clusters = connected_components(
            pairs.select("id_a", "id_b"), nodes=docs.select(F.col("doc_id").alias("file_id"))
        )
        clusters.count()

    timed("dedupe_e2e", e2e)

    # ---- per-query timings over the full contract surface ----
    qs = E.queries()
    bench_queries = [
        "q1_pricing_summary", "q3_top_orders", "q_topk_per_group", "q_window_running",
        "q_agg_stats", "q_events_hourly",
        "dedup_exact_groups", "dedup_ngram_jaccard", "dedup_ngram_jaccard_token",
        "dedup_clusters", "dedup_minhash_lsh", "dedup_simhash", "dedup_containment",
        "text_token_count", "text_quality", "text_langid", "text_fingerprint",
        "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
        "multimodal_meta", "multimodal_frames",
    ]
    for name in bench_queries:
        fn = qs[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).write.format("noop").mode("overwrite").save())

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "dedupe_e2e_sec",
        "value": timings["dedupe_e2e"],
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_files": n_files,
        "files_per_sec": round(n_files / timings["dedupe_e2e"], 2),
        "total_sec": total,
        "cpus": cpus,
    }
    spark.stop()
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    print(json.dumps(run_bench(sf_dir, cpus)))
