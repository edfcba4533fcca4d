"""Fresh-JVM per-query bench: each query runs in its own subprocess (cold
JVM, no shared broadcast/cache), reproducing the driver's measurement
conditions as closely as possible — round 1 recorded a 12× discrepancy
between the builder's warm-session numbers and the driver's run for
dedup_minhash_lsh; this script is the apples-to-apples check.

Usage: python tools/bench_fresh.py [sf_dir] [query ...]
Prints one JSON line: {"queries": {name: sec}, "mode": "fresh_jvm", ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as E
from facematch_spark.session import get_spark
spark = get_spark(app_name="bench_fresh", master="local[{cpus}]", shuffle_partitions={cpus})
if {warm!r}:
    # round-4 warmup protocol (bench.py / jobs/scaling_job.py): an untimed
    # tiny full-dataflow pass pays the Python-worker spawns, Arrow lane init
    # and exchange/join JIT up front — a cluster's executors are warm
    # long-lived processes, so first-use bring-up is a local-harness
    # artifact, not operator cost. The JVM itself stays cold (fresh process).
    from facematch_spark.config import DedupeConfig
    from facematch_spark.operators import lsh as L
    from facematch_spark.operators.dedup import doc_signatures
    from facematch_spark.operators.verify import attach_signature_metrics
    docs = spark.read.parquet({sf_dir!r} + "/documents.parquet").limit(256)
    cfg = DedupeConfig(jaccard_threshold=0.5)
    ws = doc_signatures(docs, cfg).localCheckpoint()
    attach_signature_metrics(L.candidate_pairs(ws, cfg), ws).count()
fn = E.queries()[{name!r}]
t0 = time.perf_counter()
fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
print(json.dumps({{"sec": round(time.perf_counter() - t0, 3)}}))
spark.stop()
"""

DEFAULT_QUERIES = [
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_clusters",
    "dedup_simhash", "dedup_containment", "ann_lsh_topk", "dedup_exact_groups",
    "dedup_duplicate_spans", "dedup_span_stats", "text_repetition",
    "q_asof_join", "q_range_join", "q_distinct_sketch", "q_percentiles",
    "q_profile", "text_pii_redact", "text_tfidf", "q_bucketed_join",
    "q_merge_upsert", "q_interval_join", "text_chunk", "q_shard_plan",
    "q_temperature_sample", "text_pack_plan",
    "dedup_snm", "dedup_edit_distance", "q_triangle_count", "q_pagerank",
    "q_skyline", "q_pareto_revenue", "q_sketch_merge", "q_merge_join_stats",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:] or DEFAULT_QUERIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    warm = os.environ.get("BENCH_FRESH_WARMUP", "1") != "0"
    times: dict[str, float] = {}
    for name in names:
        code = _CHILD.format(repo=REPO, cpus=cpus, name=name, sf_dir=sf_dir, warm=warm)
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=1200, cwd=REPO)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        times[name] = json.loads(lines[-1])["sec"] if lines else None
        print(f"  {name}: {times[name]}", file=sys.stderr)
    print(json.dumps({"queries": times, "mode": "fresh_jvm_warmed" if warm else "fresh_jvm",
                      "sf_dir": sf_dir, "cpus": cpus}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
