"""Checkpoint/resume + CLI tests (SURVEY.md §5.3): rerun skips completed
work, --reset truncates, config-keyed tables coexist, outputs are stable
across reruns. Consolidated around two pipeline runs + one CLI subprocess to
keep suite wall-time bounded."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from facematch_spark import schema as S
from facematch_spark.config import DedupeConfig
from facematch_spark.fixtures import corpus_to_pandas, generate_corpus
from facematch_spark.plans.pipeline import run_dedupe
from facematch_spark.sources.checkpoint import StageStore

CFG = DedupeConfig(jaccard_threshold=0.5)


@pytest.fixture(scope="module")
def small_df(spark):
    corpus = generate_corpus(n_base=20, seed=7, edge_rows=False)
    return spark.createDataFrame(corpus_to_pandas(corpus), schema=S.SOURCE_FILES).localCheckpoint()


@pytest.fixture(scope="module")
def store_and_runs(spark, small_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    store = StageStore(root, CFG)
    first = run_dedupe(spark, small_df, CFG, store=store)
    second = run_dedupe(spark, small_df, CFG, store=store)
    return store, first, second


def test_resume_skips_signed_files(spark, small_df, store_and_runs):
    store, first, second = store_and_runs
    assert store.exists("signatures") and store.exists("pairs") and store.exists("clusters")
    # rerun over the same input has zero pending files (utils.py:178-186 analog)
    assert store.pending_inputs(small_df, spark).count() == 0
    # stages read back, results identical
    assert second.counts == first.counts
    a = sorted(map(tuple, first.pairs.select("id_a", "id_b").collect()))
    b = sorted(map(tuple, second.pairs.select("id_a", "id_b").collect()))
    assert a == b
    assert first.counts["files"] == small_df.count()


def test_incremental_detects_new_files(spark, small_df, store_and_runs):
    store, _, _ = store_and_runs
    extra = small_df.limit(3).select(
        F.col("repo"), F.concat(F.col("path"), F.lit(".new")).alias("path"),
        F.col("commit"), F.col("lang"), F.col("content"),
    )
    widened = small_df.unionByName(extra)
    assert store.pending_inputs(widened, spark).count() == 3


def test_non_append_guard(spark, small_df, tmp_path_factory):
    """An update-in-place (same repo/path/commit, new content) forces a full
    reset-and-recompute; a pure append still resumes incrementally (VERDICT
    r4 #3 — the io.resolve_snapshot_pin append-only assumption, now
    detected instead of documented)."""
    root = str(tmp_path_factory.mktemp("ckpt_guard"))
    store = StageStore(root, CFG)
    run_dedupe(spark, small_df, CFG, store=store)

    # pure append: detector sees no drift, resume skips the signed files
    extra = small_df.limit(2).select(
        F.col("repo"), F.concat(F.col("path"), F.lit(".app")).alias("path"),
        F.col("commit"), F.col("lang"), F.col("content"),
    )
    appended = small_df.unionByName(extra)
    assert store.detect_non_append(appended, spark) == {"updated": 0, "deleted": 0}
    run_dedupe(spark, appended, CFG, store=store)
    assert store.pending_inputs(appended, spark).count() == 0

    # update-in-place: same keys, mutated content on one row
    mutated = appended.withColumn(
        "content",
        F.when(F.col("path") == appended.limit(1).collect()[0]["path"],
               F.concat(F.col("content"), F.lit("\n# mutated")))
        .otherwise(F.col("content")),
    )
    drift = store.detect_non_append(mutated, spark)
    assert drift["updated"] >= 1
    r = run_dedupe(spark, mutated, CFG, store=store)
    assert r.counts.get("non_append_reset", 0) >= 1
    # the checkpoint was rebuilt from the mutated head: every current row
    # signed, and the stored sha256 now matches the mutated content
    assert store.detect_non_append(mutated, spark) == {"updated": 0, "deleted": 0}
    assert r.counts["files"] == mutated.count()

    # delete: dropping head rows leaves stale checkpointed signatures
    shrunk = appended.limit(appended.count() - 2)
    assert store.detect_non_append(shrunk, spark)["deleted"] >= 1


def test_metrics_lineage_written(spark, small_df, store_and_runs):
    store, _, _ = store_and_runs
    m = store.read_metrics(spark)
    stages = {r.stage for r in m.collect()}
    assert {"sign", "dedupe", "cluster"} <= stages
    per_part = spark.read.parquet(store.path("lineage_sign"))
    assert per_part.filter(F.col("partition_id").isNotNull()).count() >= 1
    assert per_part.agg(F.sum("rows_out")).collect()[0][0] == small_df.count()


def test_config_keyed_reset_is_isolated(spark, small_df, store_and_runs, tmp_path_factory):
    """Different shingle configs get distinct state (the reference's
    config-suffixed file names, utils.py:56-59); reset() only truncates its
    own config's tables (utils.py:77-81)."""
    store, _, _ = store_and_runs
    cfg2 = DedupeConfig(jaccard_threshold=0.5, k=7)
    s2 = StageStore(store.root, cfg2)
    assert s2.path("signatures") != store.path("signatures")
    assert not s2.exists("signatures")
    s2.write("signatures", spark.read.schema(S.SIGNATURES).parquet(store.path("signatures")))
    assert s2.exists("signatures")
    s2.reset()
    assert not s2.exists("signatures")
    assert store.exists("signatures")


def test_cli_end_to_end(tmp_path_factory):
    """Black-box CLI run in a subprocess (the spark-submit surface)."""
    root = tmp_path_factory.mktemp("cli")
    corpus = generate_corpus(n_base=12, seed=3, edge_rows=False)
    pdf = corpus_to_pandas(corpus)
    inp = str(root / "input.parquet")
    pdf.to_parquet(inp)
    out = str(root / "out")
    res = subprocess.run(
        [sys.executable, "-m", "facematch_spark.cli", inp, "--out", out,
         "--threshold", "0.5", "--report", "--symmetric", "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads([l for l in res.stdout.splitlines() if l.startswith("{")][0])
    assert summary["files"] == len(pdf)
    assert summary["findings"] >= 1

    # --symmetric (utils.py:338-347 analog): every pair appears both ways
    import csv
    import glob

    csv_dir = glob.glob(f"{out}/report_csv_*")
    assert csv_dir, "CSV report dir missing"
    seen = set()
    for part in glob.glob(f"{csv_dir[0]}/*.csv"):
        with open(part) as fh:
            for row in csv.DictReader(fh):
                seen.add((row["id_a"], row["id_b"]))
    assert seen and all((b, a) in seen for a, b in seen)
