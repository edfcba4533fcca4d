"""Kill-mid-stage chaos resume at real scale (VERDICT r4 #7 / north-rule
idempotency): run the CLI pipeline over a ~10k-file corpus, crash the driver
immediately after the pairs checkpoint commits (FM_CHAOS_EXIT_AFTER=pairs —
no Spark shutdown, no cleanup), rerun to completion, and verify against an
uninterrupted clean-room run:

  * clusters are row-identical (byte-equal content) between the resumed
    store and the clean store;
  * the sign-stage lineage proves signatures were NOT recomputed on resume:
    Σ rows_out over lineage_sign == n_files exactly (a recompute would have
    appended a second set of partition rows).

Usage: python tools/chaos_resume.py [n_base] [cpus]
Prints one JSON line with the verdict.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_cli(corpus: str, out: str, cpus: str, env_extra: dict | None = None) -> subprocess.CompletedProcess:
    env = dict(os.environ, **(env_extra or {}))
    return subprocess.run(
        [sys.executable, "-m", "facematch_spark.cli", corpus, "--out", out,
         "--threshold", "0.5", "--master", f"local[{cpus}]"],
        capture_output=True, text=True, timeout=2400, cwd=REPO, env=env,
    )


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 7000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"
    corpus = f"/tmp/fm_chaos_corpus{n_base}.parquet"
    if not os.path.exists(corpus):
        from facematch_spark.fixtures import corpus_to_pandas, generate_corpus

        corpus_to_pandas(generate_corpus(n_base=n_base, seed=11, edge_rows=False)).to_parquet(
            corpus, row_group_size=16384
        )

    import shutil

    store_chaos = "/tmp/fm_chaos_store"
    store_clean = "/tmp/fm_chaos_store_clean"
    for d in (store_chaos, store_clean):
        shutil.rmtree(d, ignore_errors=True)

    # run 1: crash right after the pairs checkpoint commits
    r1 = run_cli(corpus, store_chaos, cpus, {"FM_CHAOS_EXIT_AFTER": "pairs"})
    killed_ok = r1.returncode == 137
    suffix_dirs = os.listdir(store_chaos)
    pairs_done = any(d.startswith("pairs_") for d in suffix_dirs)
    clusters_absent = not any(d.startswith("clusters_") for d in suffix_dirs)

    # run 2: resume to completion (no reset)
    r2 = run_cli(corpus, store_chaos, cpus)
    # run 3: uninterrupted clean-room run
    r3 = run_cli(corpus, store_clean, cpus)
    if r2.returncode != 0 or r3.returncode != 0:
        print(r2.stderr[-2000:], file=sys.stderr)
        print(r3.stderr[-2000:], file=sys.stderr)
        raise SystemExit("resume or clean run failed")

    import duckdb

    con = duckdb.connect()

    def clusters_rows(root: str):
        d = next(x for x in os.listdir(root) if x.startswith("clusters_"))
        return con.execute(
            f"SELECT file_id, cluster_id FROM read_parquet('{root}/{d}/*.parquet') ORDER BY file_id, cluster_id"
        ).fetchall()

    a, b = clusters_rows(store_chaos), clusters_rows(store_clean)
    clusters_equal = a == b

    lin = next(x for x in os.listdir(store_chaos) if x.startswith("lineage_sign"))
    signed = con.execute(
        f"SELECT sum(rows_out) FROM read_parquet('{store_chaos}/{lin}/*.parquet')"
    ).fetchone()[0]
    n_files = con.execute(f"SELECT count(*) FROM read_parquet('{corpus}')").fetchone()[0]
    no_resign = int(signed) == int(n_files)

    verdict = {
        "killed_with_137": killed_ok,
        "pairs_committed_clusters_absent_at_kill": pairs_done and clusters_absent,
        "clusters_byte_equal_to_clean_run": clusters_equal,
        "n_cluster_rows": len(a),
        "sign_lineage_rows_out": int(signed),
        "n_files": int(n_files),
        "signatures_not_recomputed": no_resign,
        "pass": killed_ok and pairs_done and clusters_absent and clusters_equal and no_resign,
    }
    print(json.dumps(verdict))
    return 0 if verdict["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
