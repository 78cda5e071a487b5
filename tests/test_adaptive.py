"""Adaptive robustifier end-to-end, mirroring
/root/reference/test/adaptivecost.jl: a ContaminatedGaussian kernel whose
3 parameters are jointly optimized with two means over a contaminated sample,
then the same fit via EM-alternation driven from a callback (the kernel
variable fixed for the inner Newton solves)."""

import numpy as np
import jax.numpy as jnp

import nllstpu as nt

KERNEL = nt.ContaminatedGaussian()
SCALAR = nt.Scalar()


def mean_residual(data, mean):
    return mean - data


def make_problem():
    rng = np.random.default_rng(1)
    points = np.concatenate([rng.normal(0, 1, 800), rng.normal(0, 10, 200)])
    p = nt.Problem()
    kvar = p.add_variable(
        KERNEL.manifold, nt.ContaminatedGaussian.make_params(0.5, 5.0, 0.6)
    )
    m1 = p.add_variable(SCALAR, 0.0)
    m2 = p.add_variable(SCALAR, 0.0)
    for pt in points:
        p.add_cost(mean_residual, (kvar, m1), params=pt - 1.0, kernel=KERNEL)
        p.add_cost(mean_residual, (kvar, m2), params=pt + 1.0, kernel=KERNEL)
    return p, kvar, m1, m2, points


def check(p, kvar, m1, m2):
    sw = np.asarray(
        nt.ContaminatedGaussian.sigmas_weight(jnp.asarray(p.get_value(kvar)))
    )
    np.testing.assert_allclose(sw, [1.0, 10.0, 0.8], rtol=0.12)
    np.testing.assert_allclose(float(p.get_value(m1)), -1.0, rtol=0.1)
    np.testing.assert_allclose(float(p.get_value(m2)), 1.0, rtol=0.1)


def test_joint_lm():
    p, kvar, m1, m2, _ = make_problem()
    nt.optimize(p, nt.Options(iterator=nt.LEVENBERG_MARQUARDT))
    check(p, kvar, m1, m2)


def test_em_alternation():
    p, kvar, m1, m2, points = make_problem()
    kfam = kvar.family
    sfam = m1.family
    data1 = jnp.asarray(points - 1.0)
    data2 = jnp.asarray(points + 1.0)

    def em_callback(cost, ctx):
        # Squared errors of every residual at the trial means
        # (test/adaptivecost.jl:15-25).
        means = ctx.variables[sfam]
        sq = jnp.concatenate(
            [(means[0] - data1) ** 2, (means[1] - data2) ** 2]
        )
        kparams = ctx.variables[kfam][0]
        new_kparams = nt.em_fit(kparams, sq)
        ctx.variables[kfam] = ctx.variables[kfam].at[0].set(new_kparams)
        new_cost = float(ctx.cost_fn(ctx.variables))
        return new_cost, 0

    # Kernel fixed for the Newton solves; EM updates it between iterations.
    nt.optimize(
        p,
        nt.Options(iterator=nt.NEWTON),
        unfixed=[m1, m2],
        callback=em_callback,
    )
    check(p, kvar, m1, m2)


def test_scaled_adaptive_kernel():
    """Scaled over an ADAPTIVE kernel (reference Scaled{T,R} wraps any
    robustifier, src/robust.jl:22-31): joint optimization with
    Scaled(ContaminatedGaussian, h) recovers the same mixture parameters,
    and the kernel keeps behaving as an adaptive variable."""
    scaled = nt.Scaled(KERNEL, 2.0)
    assert isinstance(scaled, nt.AdaptiveRobustifier)
    assert scaled.manifold == KERNEL.manifold

    rng = np.random.default_rng(1)
    points = np.concatenate([rng.normal(0, 1, 800), rng.normal(0, 10, 200)])
    p = nt.Problem()
    kvar = p.add_variable(
        scaled.manifold, nt.ContaminatedGaussian.make_params(0.5, 5.0, 0.6)
    )
    m1 = p.add_variable(SCALAR, 0.0)
    for pt in points:
        p.add_cost(mean_residual, (kvar, m1), params=pt - 1.0, kernel=scaled)
    nt.optimize(p, nt.Options(iterator=nt.LEVENBERG_MARQUARDT))
    sw = np.asarray(
        nt.ContaminatedGaussian.sigmas_weight(jnp.asarray(p.get_value(kvar)))
    )
    # The ×2 height doubles every term of the robustified NLL uniformly, so
    # the optimum is unchanged (weight slightly less tight than unscaled).
    np.testing.assert_allclose(sw, [1.0, 10.0, 0.8], rtol=0.15)
    np.testing.assert_allclose(float(p.get_value(m1)), -1.0, rtol=0.1)
