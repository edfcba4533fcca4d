"""Per-query profiling harness for optimization work (guide §1.4/§1.5).

NOT the driver-timed bench (bench.py is frozen): this tool runs a SUBSET of
the contract queries with the same session setup as bench.py (CPU pinning,
tmpfs shuffle dir, leaked-block cleanup, warmup), repeats them, and can dump
``.explain("formatted")`` to a directory — the measurement loop for
OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py q_name [q_name ...] [--repeat N] [--explain DIR]
    python bench_extra.py --all            # every bench.py query
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--explain-suffix", default="", help="file suffix, e.g. _before")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # same healthy-CPU pinning as bench.py
    if os.environ.get("SPARK_GRAFT_PIN", "1") != "0" and hasattr(os, "sched_setaffinity"):
        try:
            import importlib.util as _ilu

            _spec = _ilu.spec_from_file_location(
                "fm_bench_scaling",
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench", "scaling.py"),
            )
            _scaling = _ilu.module_from_spec(_spec)
            sys.modules["fm_bench_scaling"] = _scaling
            _spec.loader.exec_module(_scaling)
            scan = _scaling.fault_scan(sorted(os.sched_getaffinity(0)))
            healthy = [c for c, ms in scan.items() if ms <= _scaling.FAULT_MS_GATE]
            if len(healthy) >= max(len(scan) // 2, 1):
                os.sched_setaffinity(0, healthy)
                excluded = {c: round(ms, 1) for c, ms in scan.items() if ms > _scaling.FAULT_MS_GATE}
                print(f"# pinned {len(healthy)} healthy cpus, excluded {excluded}", file=sys.stderr)
        except Exception as exc:
            print(f"# pin probe failed: {exc}", file=sys.stderr)

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from facematch_spark.config import DedupeConfig
    from facematch_spark.operators import lsh as L
    from facematch_spark.operators.dedup import doc_signatures
    from facematch_spark.operators.verify import attach_signature_metrics
    from facematch_spark.session import get_spark

    local_dir = "/dev/shm/fm_spark_local"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name="facematch_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) if cpus.isdigit() else 32, 8),
        extra_conf={"spark.local.dir": local_dir},
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if not args.no_warm:
        cfg = DedupeConfig(jaccard_threshold=0.5)
        warm_sigs = doc_signatures(docs.limit(256), cfg).localCheckpoint()
        attach_signature_metrics(L.candidate_pairs(warm_sigs, cfg), warm_sigs).count()

    def _drop_leaked_blocks() -> None:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(m.keySet().toArray()):
            m.get(rid).unpersist()
        import gc

        gc.collect()

    _drop_leaked_blocks()

    qs = E.queries()
    names = args.names
    if args.all:
        names = list(qs)
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if args.explain:
            import contextlib
            import io

            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain, f"{name}{args.explain_suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        walls = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            _drop_leaked_blocks()
        out[name] = walls
        print(json.dumps({name: walls}), file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
