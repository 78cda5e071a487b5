"""Profiling / timing helpers.

Reference parity: the reference embeds nanosecond timers around cost,
gradient and solve phases (src/utils.jl:54-60, src/structs.jl:86-92).  Under
jit those phases fuse into one XLA computation, so the equivalents here are
(a) a readback-fenced wall timer for whole compiled calls — required because
``block_until_ready`` does not fence execution on tunneled TPU backends —
and (b) a thin wrapper over ``jax.profiler`` traces for op-level
attribution.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def fence(tree) -> float:
    """Force completion of every array in ``tree`` by reading back a reduced
    scalar; returns that scalar (sum of sums, cast to f32)."""
    leaves = [l for l in jtu.tree_leaves(tree) if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    total = jnp.zeros((), jnp.float32)
    for l in leaves:
        total = total + jnp.sum(l).astype(jnp.float32)
    return float(total)


def timed(fn, *args, repeats: int = 3):
    """Best-of-N readback-fenced wall time of a compiled call.

    Returns ``(best_seconds, last_output)``."""
    best = float("inf")
    out = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
