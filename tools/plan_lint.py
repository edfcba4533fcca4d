"""Plan linter: sweep EVERY __spark_entry__.queries() entry at sf0.001 and
flag scale anti-patterns in the executed plan:

  1. CartesianProduct — never acceptable.
  2. BroadcastNestedLoopJoin — acceptable only where one side is a tiny
     aggregate/grid by construction (explicit allowlist, reason given).
  3. Unpartitioned Window over a data-sized relation — the single-task
     global window bug (shard_plan/scan.py module docs). Detected via
     windowspecdefinition whose spec starts with a sort order (no
     partition columns); allowlisted where the windowed relation is
     O(#partitions) or O(#groups) rows by construction.

Unlike tools/explain_plans.py (deep assertions on selected queries), this
is a breadth gate: every contract row gets the same three checks, so a new
entry cannot ship a cartesian or a one-task window unnoticed.

Exit 0 = clean; nonzero lists offenders. Run: python -u tools/plan_lint.py
[names...] (default: all queries).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# query -> reason the BroadcastNestedLoopJoin there is a tiny-side cross
# join by construction, not an accident.
BNLJ_ALLOWED = {
    "q_gapfill_hours": "hour grid x distinct-types: both sides tiny aggregates",
    "q_pareto_revenue": "single-row total broadcast onto the scan output",
    "dedup_embedding_cosine": "gated exact tier: corpus ceiling enforced in code",
    "ann_cosine_topk": "gated brute-force baseline: 2M-row ceiling enforced",
    "q_histogram": "single-row (min,max) bounds broadcast onto the binning scan",
    "q_hot_keys": "single-row total-count broadcast for the share column",
    "q_quantile_bins": "single-row exact-percentile boundary broadcast",
    "q_sample_weighted": "single-row weight-total broadcast; membership is map-only",
    "q_temperature_sample": "|strata|-row rate relation broadcast onto the corpus",
    "q_kmeans": "k-row centroid table broadcast onto the points (the model IS tiny)",
}

# query -> reason an unpartitioned window there is NOT data-sized.
GLOBAL_WINDOW_ALLOWED = {
    "q_shard_plan": "offsets window over P per-partition totals (P = #partitions)",
    "text_pack_plan": "same shard_plan offsets window",
    "dedup_snm": "same two-pass rank: offsets window over P rows",
    "q_skyline": "prefix_agg offsets window over P rows",
    "q_pareto_revenue": "prefix_agg offsets window over P rows",
    "q_corpus_shuffle": "offsets window over P per-partition counts",
    "q_zorder_layout": "offsets window over P per-partition counts",
    "report_top_edges": "row_number ABOVE TakeOrderedAndProject(limit=K): ranks K rows",
}

_GLOBAL_WINDOW_RE = re.compile(
    r"windowspecdefinition\((?:[^(),]+ (?:ASC|DESC) NULLS)"
)


def lint_plan(name: str, plan: str) -> list[str]:
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        problems.append("BroadcastNestedLoopJoin (not allowlisted)")
    if _GLOBAL_WINDOW_RE.search(plan) and name not in GLOBAL_WINDOW_ALLOWED:
        problems.append("unpartitioned Window (not allowlisted)")
    return problems


def main() -> int:
    from facematch_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark()
    qs = E.queries()
    names = sys.argv[1:] or sorted(qs)
    failures = {}
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - build failure IS a finding
            failures[name] = [f"plan build failed: {exc!r:.200}"]
            continue
        problems = lint_plan(name, plan)
        if problems:
            failures[name] = problems
        print(f"{'FAIL' if problems else 'ok':>4}  {name}"
              + (f": {'; '.join(problems)}" if problems else ""), flush=True)
    if failures:
        print(f"\n{len(failures)} offender(s): {sorted(failures)}")
        return 1
    print(f"\nall {len(names)} plans clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
