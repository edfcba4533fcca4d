"""Fine-grained diagnostic twin of scaling_job.py: times each sub-step of
the dedup dataflow so the N-vs-4N efficiency gap can be attributed to a
stage instead of guessed. Prints one JSON line.

Usage: python jobs/scaling_probe.py INPUT_PARQUET CPUS [HEAP]
"""

from __future__ import annotations

import json
import os
import sys
import time

# abspath first: invoked as `python jobs/scaling_probe.py` the raw __file__
# is relative and rsplit would resolve the repo root to "jobs"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from facematch_spark import schema as S
from facematch_spark.config import DedupeConfig
from facematch_spark.operators.lsh import band_explode, tiered_self_join
from facematch_spark.operators.signatures import sign_documents
from facematch_spark.operators.verify import attach_signature_metrics
from facematch_spark.session import get_spark


def main() -> int:
    inp, cpus = sys.argv[1], sys.argv[2]
    heap = sys.argv[3] if len(sys.argv) > 3 else "48g"
    cfg = DedupeConfig(jaccard_threshold=0.5)
    spark = get_spark(
        app_name=f"scaling_probe_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": heap,
            "spark.network.timeout": "300s",
        },
    )
    source = spark.read.schema(S.SOURCE_FILES).parquet(inp).repartition(64)
    n_files = source.count()

    t = {}
    t0 = time.perf_counter()
    sigs = sign_documents(source, cfg).localCheckpoint()
    t["sign"] = time.perf_counter() - t0

    t1 = time.perf_counter()
    bands_df = band_explode(sigs, cfg).localCheckpoint()
    t["bands"] = time.perf_counter() - t1

    t1 = time.perf_counter()
    cands = tiered_self_join(
        bands_df, keys=["band_id", "band_hash"], id_col="file_id",
        cap=cfg.hot_band_cap, salt_buckets=cfg.salt_buckets,
        drop_above=cfg.max_band_group,
    ).localCheckpoint()
    n_cands = cands.count()
    t["cands"] = time.perf_counter() - t1

    t1 = time.perf_counter()
    pairs = (
        attach_signature_metrics(cands, sigs)
        .filter(F.col("minhash_est") >= F.lit(cfg.jaccard_threshold))
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    t["verify"] = time.perf_counter() - t1

    t1 = time.perf_counter()
    edges = pairs.collect()
    t["uf_collect"] = time.perf_counter() - t1

    t1 = time.perf_counter()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edges:
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(x, find(x)) for x in list(parent)]
    t["uf_python"] = time.perf_counter() - t1

    t1 = time.perf_counter()
    labels = spark.createDataFrame(rows, "file_id long, cluster_id long")
    singletons = sigs.select("file_id").join(
        labels.select("file_id"), "file_id", "left_anti"
    ).withColumn("cluster_id", F.col("file_id"))
    all_labels = labels.unionByName(singletons)
    n_clusters = all_labels.select("cluster_id").distinct().count()
    t["label_df"] = time.perf_counter() - t1

    wall = time.perf_counter() - t0
    print(json.dumps({
        "files": n_files, "wall_s": round(wall, 2),
        "files_per_sec": round(n_files / wall, 2),
        "cands": n_cands, "pairs": n_pairs, "clusters": n_clusters,
        "cpus": cpus, "heap": heap,
        "stages": {k: round(v, 2) for k, v in t.items()},
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
