"""Optional per-stage wall-clock telemetry for bench attribution.

Operators with internal eager materialization boundaries (``localCheckpoint``,
driver collects) accept ``walls: dict | None = None``; when a dict is passed
they record the wall seconds of each boundary into it. The boundaries are the
operator's OWN materialization points — no extra checkpoints are added for
measurement, so the operator's total wall equals its black-box wall and
bench rows stay comparable round-over-round (ADVICE r4: the old staged twin
added checkpoints that a downstream operator re-materialized, conflating
method change with performance). Production callers pass nothing: zero
overhead, zero behavior change.
"""

from __future__ import annotations

import time


def start() -> float:
    return time.perf_counter()


def mark(walls: dict | None, key: str, t0: float) -> float:
    """Record ``key`` = seconds since ``t0`` into ``walls`` (no-op when
    ``walls`` is None); returns a fresh t0 for the next stage. Stages that
    are lazy (no materialization between boundaries) cost ~0 and show up in
    the consumer-derived remainder (bench computes ``total - sum(walls)``)."""
    t1 = time.perf_counter()
    if walls is not None:
        walls[key] = round(t1 - t0, 3)
    return t1
