"""Unit tests for bench.py's accuracy-gate and time-to-target helpers —
the north-star pair is iters/s AND convergence (BASELINE.md:32-34), so the
bench artifact must carry cost fields and must refuse to headline a
bf16-W run that broke convergence."""

import importlib.util
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(_REPO, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)


def test_bf16_gate_accepts_comparable_cost():
    assert bench.bf16_cost_ok(0.0921, 0.0921)
    assert bench.bf16_cost_ok(0.15, 0.0921)  # within 2x
    # No committed reference: any finite cost passes (nothing to compare).
    assert bench.bf16_cost_ok(123.0, None)


def test_bf16_gate_rejects_broken_run():
    """A deliberately-broken bf16 run (diverged or plateaued far above the
    f32 cost) must fail the gate."""
    assert not bench.bf16_cost_ok(1.0, 0.0921)
    assert not bench.bf16_cost_ok(float("nan"), 0.0921)
    assert not bench.bf16_cost_ok(float("inf"), 0.0921)
    assert not bench.bf16_cost_ok(float("nan"), None)


def test_time_to_target_interpolates_trace():
    stats = {
        "cost_trace": [10.0, 1.0, 0.2, 0.09, 0.09],
        "iters": 5,
        "wall_s": 10.0,
    }
    # Reaches 1.1 * 0.0921 at iteration 4 (index 3) -> 10s * 4/5.
    t = bench.time_to_target(stats, 0.0921)
    assert abs(t - 8.0) < 1e-9
    # Never reaches the target -> None.
    assert bench.time_to_target(stats, 1e-6) is None
    assert bench.time_to_target(stats, None) is None
    assert bench.time_to_target(None, 0.1) is None
    assert bench.time_to_target({"cost_trace": [], "iters": 0}, 0.1) is None


def test_cpu_ref_shape_and_fields():
    """The committed reference must match the default bench workload shape
    and carry the gate/target cost fields the round-3 bench relies on."""
    import json

    with open(os.path.join(_REPO, "scripts", "cpu_ref.json")) as f:
        ref = json.load(f)
    assert ref["ncam"] == bench.NCAM
    assert ref["nlmk"] == bench.NLMK
    assert ref["vis"] == bench.VIS
    assert ref["iters"] == bench.ITERS  # budget-to-budget amortization
    assert ref["iters_per_sec"] > 0
    assert np.isfinite(ref["best_cost"]) and np.isfinite(ref["target_cost"])
    loaded = bench.load_cpu_ref()
    assert loaded is not None and loaded["target_cost"] == ref["target_cost"]
