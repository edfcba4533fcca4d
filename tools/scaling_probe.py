"""One gated (N, 4N) scaling pair at an arbitrary operating point, WITHOUT
touching BENCH/BASELINE.md — for deciding campaign config (N_LO, partition
quantum) before spending hours on the full REPEATS protocol.

Usage:
    SCALING_N=1 SCALING_PARTITIONS=64 python tools/scaling_probe.py

Honors every bench/scaling.py env knob (gate thresholds, corpus path) and
reuses its healthy-window machinery verbatim, so a probe pair is measured
under the exact published protocol — the only difference is that nothing
is published.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# bench.py at the repo root shadows the bench/ package — load by path
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "fm_bench_scaling", os.path.join(REPO, "bench", "scaling.py")
)
scaling = importlib.util.module_from_spec(_spec)
# register BEFORE exec so multiprocessing can pickle scaling.* functions by
# module+qualname (fork children inherit sys.modules)
sys.modules["fm_bench_scaling"] = scaling
_spec.loader.exec_module(scaling)


def main() -> int:
    scaling.ensure_corpus()
    cpus, ceiling, gated = scaling._wait_for_healthy_window()
    fc = scaling.fault_ceiling(cpus)
    bw = scaling.bw_ceiling(cpus)
    print(f"window: cpus={cpus} busy_ceiling={ceiling:.3f} "
          f"fault_ceiling={fc:.3f} bw_ceiling={bw:.3f} gated={gated}",
          file=sys.stderr)
    hi = scaling.run_job_once(cpus, scaling.N_HI)
    ok_hi, reprobed_hi = scaling.recheck_cpus(cpus)
    print(f"hi: {hi} recheck_ok={ok_hi}", file=sys.stderr)
    lo = scaling.run_job_once(cpus[: scaling.N_LO], scaling.N_LO)
    ok_lo, reprobed_lo = scaling.recheck_cpus(cpus[: scaling.N_LO])
    print(f"lo: {lo} recheck_ok={ok_lo}", file=sys.stderr)
    eff = (hi["files_per_sec"] / lo["files_per_sec"]) / (scaling.N_HI / scaling.N_LO)
    print(json.dumps({
        "n_lo": scaling.N_LO, "n_hi": scaling.N_HI,
        "partitions": int(os.environ.get("SCALING_PARTITIONS", "64")),
        "efficiency": round(eff, 3),
        "busy_ceiling": round(ceiling, 3), "fault_ceiling": round(fc, 3),
        "bw_ceiling": round(bw, 3),
        "gated": gated, "window_held": ok_hi and ok_lo,
        "reprobed": reprobed_hi or reprobed_lo,
        "lo": lo, "hi": hi,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
