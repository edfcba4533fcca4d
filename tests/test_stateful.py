"""Custom stateful streaming operator test: applyInPandasWithState running
totals must equal the batch aggregation after draining the stream."""

from __future__ import annotations

from facematch_spark.streaming.stateful import batch_user_totals, run_stateful_user_totals

SF = "/root/testdata/sf0.001"


def test_stateful_totals_match_batch(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    batch = {(r.user_id, r.n_events, r.sum_value) for r in batch_user_totals(ev).collect()}
    stream = {
        (r.user_id, r.n_events, r.sum_value)
        for r in run_stateful_user_totals(spark, f"{SF}/events.parquet").collect()
    }
    assert stream == batch
    assert len(batch) > 0
