"""Robust 1-D curve fitting (BASELINE.json config: "Robust 1D curve fitting
sweeping all robustifiers"; reference examples/robustifiers.jl).

The classic exponential model y = exp(m·x + c) with outlier-contaminated
samples, one residual per sample, fit with any robust kernel.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.manifolds import Euclidean
from ..core.problem import Problem

PARAMS = Euclidean(2)  # [m, c]


def exp_residual(sample, mc):
    x, y = sample[0], sample[1]
    return jnp.exp(mc[0] * x + mc[1]) - y


def make_curve_fit(n=100, m=0.3, c=0.1, noise=0.02, outlier_frac=0.15,
                   kernel=None, seed=0):
    """Synthetic exponential-curve data with gross outliers; returns
    ``(problem, params_handle, ground_truth)``."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(0.0, 5.0, n)
    ys = np.exp(m * xs + c) + rng.standard_normal(n) * noise
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, size=n_out, replace=False)
    ys[out_idx] += rng.uniform(2.0, 5.0, n_out)  # one-sided gross outliers

    p = Problem()
    mc = p.add_variable(PARAMS, np.zeros(2))
    p.add_cost_batch(
        exp_residual,
        slots=[(PARAMS, np.zeros(n, np.int32))],
        params=np.stack([xs, ys], axis=1),
        kernel=kernel,
    )
    return p, mc, np.array([m, c])
