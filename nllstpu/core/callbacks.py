"""Built-in callbacks for the stepped driver.

Reference parity: src/callbacks.jl — ``nullcallback``, ``printoutcallback``
(iteration table with a trust-region column) and ``storecostscallback``.
Cost-trajectory recording is also available without a callback via
``Options(store_trajectory=True)``.
"""

from __future__ import annotations

import numpy as np


def null_callback(cost, ctx):
    """Do nothing (src/callbacks.jl:20)."""
    return cost, 0


def printout_callback(cost, ctx):
    """Per-iteration printout (src/callbacks.jl:39-60).  The third column is
    the iterator's trust proxy: 1/λ for LM, the trust radius for dogleg, the
    step size for gradient descent."""
    if ctx.iteration == 1:
        print(
            f"{'iter':>6} {'cost':>16} {'cost change':>16} {'|step|':>12}"
            f" {'trust':>12}"
        )
        print(f"{0:>6} {ctx.bestcost:>16.8e}")
    lam = float(ctx.itdata["lm_lambda"])
    tr = float(ctx.itdata["tr"])
    gd = float(ctx.itdata["gd_step"])
    trust = (1.0 / lam) if lam > 0 else (tr if tr > 0 else gd)
    step = float(np.linalg.norm(np.asarray(ctx.step))) if ctx.step is not None else 0.0
    print(
        f"{ctx.iteration:>6} {cost:>16.8e} {ctx.bestcost - cost:>16.8e}"
        f" {step:>12.4e} {trust:>12.4e}"
    )
    return cost, 0


def store_costs_callback(store):
    """Append per-iteration cost (and step when ``store`` is a
    CostTrajectory) — reference ``storecostscallback``
    (src/callbacks.jl:63-107)."""

    def cb(cost, ctx):
        if hasattr(store, "costs"):
            store.costs.append(float(cost))
            store.times_ns.append(0)
            store.trajectory.append(np.asarray(ctx.step))
        else:
            store.append(float(cost))
        return cost, 0

    return cb
