"""Per-iteration step algorithms: Newton, Levenberg-Marquardt, dogleg and
gradient descent.

Reference parity: src/iterators.jl — each ``iterate!`` becomes a pure
function of (H, g, variables, best cost, iterator scalars) whose inner
accept/reject retry loops are ``lax.while_loop``s, so a whole optimization
compiles to one XLA computation with no host round-trips (SURVEY.md §7
"hard parts" (a)).

Conventions: ``a`` is the (undamped) Hessian H, ``b`` the gradient g = Jᵀr.
The solved Newton direction is negated before use, exactly as the reference's
``negate!(solve!(...))`` (src/iterators.jl:19), and ``x`` always denotes the
*applied* step.  Iterator scalar state is carried in a single dict
``{"lm_lambda", "tr", "gd_step"}`` regardless of the active iterator so the
optimizer loop state has one static pytree structure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import structs
from .linearsolver import cholesky_solve


@dataclasses.dataclass(frozen=True)
class DenseOps:
    """Linear-system operations over a dense ``sys = (H, g)`` pair.  The
    same protocol is implemented by :class:`nllstpu.ops.schur.SchurOps` for
    the landmark-eliminated system, so every iterator works unchanged on
    either backend."""

    dim: int

    def solve(self, sys, lam):
        """x with (H + λI) x = g."""
        a, b = sys
        eye = jnp.eye(self.dim, dtype=a.dtype)
        return cholesky_solve(a + lam * eye, b)

    def grad(self, sys):
        return sys[1]

    def quad(self, sys, x):
        """xᵀHx (undamped) — the reference's ``fast_bAb``
        (src/utils.jl:71-106)."""
        return x @ (sys[0] @ x)

    def diag_max(self, sys):
        return jnp.max(jnp.abs(jnp.diagonal(sys[0])))


@dataclasses.dataclass(frozen=True)
class IterCtx:
    """Closures the iterators need: full-cost evaluation, linear-system ops
    and manifold step application."""

    cost: Callable  # vars -> scalar
    apply: Callable  # (vars, x) -> vars
    dtype: object
    dim: int
    linops: Any = None  # linear-system ops (defaults to DenseOps(dim))

    def ops(self):
        return self.linops if self.linops is not None else DenseOps(self.dim)


def init_data(dtype, opts=None):
    """Initial iterator scalars (reference ``reset!`` values:
    λ = 0 src/iterators.jl:129, trust radius = 0 line 40, step size = 1
    line 184; overridable via Options — the reference's ``iteratordata``)."""
    lam = getattr(opts, "init_lm_lambda", 0.0) if opts is not None else 0.0
    tr = getattr(opts, "init_trust_radius", 0.0) if opts is not None else 0.0
    gd = getattr(opts, "init_gd_step", 1.0) if opts is not None else 1.0
    return {
        "lm_lambda": jnp.asarray(lam, dtype=dtype),
        "tr": jnp.asarray(tr, dtype=dtype),
        "gd_step": jnp.asarray(gd, dtype=dtype),
    }


def iterate(name: str, ctx: IterCtx, sys, variables, bestcost, data, opts):
    """Dispatch one outer iteration.  ``sys`` is the assembled linear system
    (a pytree understood by ``ctx.ops()``).  Returns
    ``(new_vars, new_cost, applied_step, new_data, n_solves, n_cost_evals)``.
    """
    if name == structs.NEWTON:
        return _newton(ctx, sys, variables, bestcost, data, opts)
    if name == structs.LEVENBERG_MARQUARDT:
        return _levmar(ctx, sys, variables, bestcost, data, opts)
    if name == structs.DOGLEG:
        return _dogleg(ctx, sys, variables, bestcost, data, opts)
    if name == structs.GRADIENT_DESCENT:
        return _gradient_descent(ctx, sys, variables, bestcost, data, opts)
    raise ValueError(f"unknown iterator {name!r}")


def _newton(ctx, sys, variables, bestcost, data, opts):
    """Undamped Newton step (src/iterators.jl:16-27)."""
    ops = ctx.ops()
    x = -ops.solve(sys, jnp.zeros((), dtype=ctx.dtype))
    nv = ctx.apply(variables, x)
    c = ctx.cost(nv)
    one = jnp.int32(1)
    return nv, c, x, data, one, one


def _levmar(ctx, sys, variables, bestcost, data, opts):
    """Levenberg-Marquardt with the reference's damping schedule
    (src/iterators.jl:139-172): λ starts at 1e-6·max|diag H|, the inner loop
    multiplies λ by µ (doubling µ each failure), and on acceptance λ is scaled
    by ``ρ < 0.983 ? 1 − (2ρ−1)³ : 0.1`` where ρ is the step quality measured
    against the quadratic model of the *undamped* system."""
    dtype = ctx.dtype
    ops = ctx.ops()
    g = ops.grad(sys)
    lam = data["lm_lambda"]
    lam = jnp.where(lam == 0, ops.diag_max(sys) * dtype.type(1e-6), lam)

    def body(st):
        lam, mu, _, _, _, _, ns, nc = st
        x = -ops.solve(sys, lam)
        nv = ctx.apply(variables, x)
        c = ctx.cost(nv)
        accept = (~(c > bestcost)) | (jnp.max(jnp.abs(x)) < opts.dstep)
        return (
            jnp.where(accept, lam, lam * mu),
            jnp.where(accept, mu, mu * 2),
            x,
            nv,
            c,
            accept,
            ns + 1,
            nc + 1,
        )

    def cond(st):
        return ~st[5]

    init = (
        lam,
        jnp.asarray(2.0, dtype),
        jnp.zeros(ctx.dim, dtype=dtype),
        variables,
        jnp.asarray(bestcost, dtype),
        jnp.asarray(False),
        jnp.int32(0),
        jnp.int32(0),
    )
    lam_f, _, x, nv, c, _, ns, nc = jax.lax.while_loop(cond, body, init)

    # Step quality against the undamped quadratic model.  For the damped
    # solve x = −(H+λI)⁻¹g, the model decrease 0.5·xᵀHx + gᵀx collapses to
    # 0.5·(gᵀx − λ|x|²): xᵀ(H+λI)x = −gᵀx.  Identical to evaluating
    # ``ops.quad`` (up to solve accuracy) but streams nothing — the direct
    # Schur backend's quad re-reads the dense W coupling every iteration.
    quality = (c - bestcost) / (0.5 * (g @ x - lam_f * (x @ x)))
    lam_new = lam_f * jnp.where(
        quality < 0.983, 1 - (2 * quality - 1) ** 3, jnp.asarray(0.1, dtype)
    )
    data = dict(data, lm_lambda=lam_new)
    return nv, c, x, data, ns, nc


def _dogleg(ctx, sys, variables, bestcost, data, opts):
    """Dogleg trust region (src/iterators.jl:47-115): Cauchy leg, full Newton
    leg, or the trust-circle intersection of the Cauchy→Newton segment, with
    the reference's ×3 / ×0.5 radius updates at quality 0.375 / 0.125."""
    dtype = ctx.dtype
    ops = ctx.ops()
    b = ops.grad(sys)
    tiny = jnp.finfo(dtype).tiny
    tr = data["tr"]
    gnorm2 = b @ b
    # Newton leg + Cauchy curvature gᵀHg: backends that can fuse the two
    # (direct Schur shares the dense-W stream) expose solve0_quad_grad;
    # others pay a separate quad pass.
    if hasattr(ops, "solve0_quad_grad"):
        xsol, ghg = ops.solve0_quad_grad(sys)
    else:
        xsol = ops.solve(sys, jnp.zeros((), dtype=dtype))
        ghg = ops.quad(sys, b)
    coef = gnorm2 / (ghg + tiny)  # the reference's `a`
    cauchy = -coef * b
    alpha2 = coef * coef * gnorm2
    alpha = jnp.sqrt(alpha2)
    tr = jnp.where(tr == 0, alpha, tr)  # first step: Cauchy point
    xn = -xsol  # Newton leg
    beta = jnp.sqrt(xn @ xn)

    def body(st):
        tr, _, _, c_prev, _, nc = st
        first_leg = ~(alpha < tr)
        # Leg 1: truncated Cauchy step.
        x1 = (tr / alpha) * cauchy
        lin1 = tr * (2 * alpha - tr) / (2 * coef)
        # Leg 2a: full Newton step.
        use_full = beta <= tr
        # Leg 2b: intersection of Cauchy→Newton with the trust circle.
        d = xn - cauchy
        sq_leg = d @ d
        cdot = cauchy @ d
        trsq = tr * tr - alpha2
        root = jnp.sqrt(jnp.maximum(cdot * cdot + sq_leg * trsq, 0))
        stp = jnp.where(
            cdot <= 0, (-cdot + root) / (sq_leg + tiny), trsq / (cdot + root + tiny)
        )
        x3 = d * stp + cauchy
        lin3 = 0.5 * (coef * (1 - stp) ** 2 * gnorm2) + stp * (2 - stp) * c_prev
        x = jnp.where(first_leg, x1, jnp.where(use_full, xn, x3))
        lin = jnp.where(first_leg, lin1, jnp.where(use_full, c_prev, lin3))
        nv = ctx.apply(variables, x)
        c = ctx.cost(nv)
        # Trust-region update.
        mu = (bestcost - c) / lin
        xnorm = jnp.sqrt(x @ x)
        tr2 = jnp.where(
            mu > 0.375,
            jnp.maximum(tr, 3 * xnorm),
            jnp.where(mu < 0.125, tr * 0.5, tr),
        )
        done = (~(c > bestcost)) | (jnp.max(jnp.abs(x)) < opts.dstep)
        return (tr2, x, nv, c, done, nc + 1)

    def cond(st):
        return ~st[4]

    init = (
        tr,
        jnp.zeros(ctx.dim, dtype=dtype),
        variables,
        jnp.asarray(bestcost, dtype),
        jnp.asarray(False),
        jnp.int32(0),
    )
    tr_f, x, nv, c, _, nc = jax.lax.while_loop(cond, body, init)
    data = dict(data, tr=tr_f)
    return nv, c, x, data, jnp.int32(1), nc


def _gradient_descent(ctx, sys, variables, bestcost, data, opts):
    """Gradient descent with the reference's quadratic-fit line search
    (src/iterators.jl:186-208)."""
    b = ctx.ops().grad(sys)
    ss = data["gd_step"]
    x = -b * ss
    nv = ctx.apply(variables, x)
    c = ctx.cost(nv)

    def body(st):
        ss, x, _, c, nc = st
        coststep = x @ b
        costdiff = bestcost + coststep - c
        ss2 = ss * 0.5 * coststep / costdiff
        x2 = -b * ss2
        nv2 = ctx.apply(variables, x2)
        c2 = ctx.cost(nv2)
        return (ss2, x2, nv2, c2, nc + 1)

    def cond(st):
        return st[3] > bestcost

    ss_f, x, nv, c, nc = jax.lax.while_loop(cond, body, (ss, x, nv, c, jnp.int32(1)))
    data = dict(data, gd_step=ss_f * 2)
    return nv, c, x, data, jnp.int32(0), nc
