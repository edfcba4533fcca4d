"""Round-over-round bench adjudicator: compare two bench JSONs (or a JSON
against BENCH/BASELINE.md's per-query table) and classify per-query deltas
using each run's recorded `cpu_health`.

The round-4 lesson, mechanized: wall-time swings up to the host-weather
band are expected between windows (sick vCPU fault pathology, see
SCALE.md §9); what demands attention is a row whose ratio is far OUTSIDE
the band every other row sits in — that is a plan/structural change, not
weather (this exact analysis caught dedup_edit_distance at 100× while
every sibling sat at 1.1-1.7×).

Usage:
  python tools/bench_compare.py NEW.json [OLD.json | BENCH/BASELINE.md]
Prints per-query ratios sorted desc, the median ratio (the weather band
estimate), rows > 3x the median flagged OUTLIER, and both runs' cpu_health
if present. Exit 1 if any OUTLIER.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load_ref(path: str) -> tuple[dict[str, float], dict | None]:
    if path.endswith(".json"):
        d = json.load(open(path))
        if "queries" not in d and "parsed" in d:  # driver BENCH_rN wrapper
            if d["parsed"] is None:
                # r05 lesson: the driver's tail capture can clip the bench
                # line, leaving parsed=null. Salvage per-query walls from the
                # tail fragment instead of crashing (the fragment is valid
                # JSON suffix text: regex out "name": seconds pairs).
                frag = d.get("tail", "") or ""
                qs = {
                    k: float(v)
                    for k, v in re.findall(r'"([a-z0-9_]+)": ([\d.]+)', frag)
                }
                if not qs:
                    raise SystemExit(
                        f"{path}: parsed=null and no per-query rows in tail"
                    )
                return qs, None
            d = d["parsed"]
        return {k: float(v) for k, v in d["queries"].items()}, d.get("cpu_health")
    md = open(path).read()
    return {q: float(t) for q, t in re.findall(r"\| (\w+) \| ([\d.]+) \|", md)}, None


def main() -> int:
    new_path = sys.argv[1]
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/BASELINE.md"
    new, new_health = load_ref(new_path)
    ref, ref_health = load_ref(ref_path)

    rows = [
        (new[q] / ref[q], q, new[q], ref[q])
        for q in new
        if q in ref and ref[q] >= 0.3  # sub-0.3s rows are all fixed overhead
    ]
    if not rows:
        print("no comparable rows")
        return 0
    med = statistics.median(r[0] for r in rows)
    outliers = []
    print(f"median ratio (weather band): {med:.2f}")
    for ratio, q, a, b in sorted(rows, reverse=True):
        flag = ""
        if ratio > 3 * max(med, 1.0):
            flag = "  <-- OUTLIER (structural, not weather)"
            outliers.append(q)
        elif ratio < min(med, 1.0) / 3:
            # ADVICE r5: an abnormally FAST row can be a silent correctness
            # regression (empty/truncated result), not just a win — flag it
            # for a correctness re-check rather than letting it pass.
            flag = "  <-- LOW OUTLIER (re-check correctness)"
            outliers.append(q)
        print(f"{ratio:6.2f}x  {q:32s} {a:9.3f} vs {b:9.3f}{flag}")
    for name, h in (("new", new_health), ("ref", ref_health)):
        if h:
            print(f"{name} cpu_health: {h.get('fault_scan_ms')}")
    if outliers:
        print(f"\n{len(outliers)} OUTLIER(s): {outliers}")
        return 1
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # | head is fine
        raise SystemExit(0)
