"""Robust-kernel unit tests.

Mirrors /root/reference/test/robust.jl: kernel values against closed forms,
and every analytic ``rho_dc`` cross-checked against the autodiff oracle
(``auto_rho_dc`` — the JAX analogue of ``autorobustifydcost``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nllstpu as nt
from nllstpu.core.robust import auto_rho_dc

S = jnp.linspace(0.0, 10.0, 21)


def check_against_oracle(kernel, svals=S):
    for s in svals:
        rho, d1, d2 = kernel.rho_dc(s)
        rho_a, d1_a, d2_a = auto_rho_dc(kernel.rho, s)
        np.testing.assert_allclose(rho, rho_a, rtol=1e-12)
        np.testing.assert_allclose(d1, d1_a, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(d2, d2_a, rtol=1e-9, atol=1e-12)


def test_norobust():
    k = nt.NoRobust()
    np.testing.assert_allclose(k.rho(S), S)
    check_against_oracle(k)


def test_scaled():
    k = nt.Scaled(nt.Huber2o(1.5), 2.5)
    np.testing.assert_allclose(k.rho(S), nt.Huber2o(1.5).rho(S) * 2.5)
    check_against_oracle(k)
    # Scaled NoRobust is a pure scaling.
    k2 = nt.Scaled(nt.NoRobust(), 0.3)
    np.testing.assert_allclose(k2.rho(S), 0.3 * S)
    check_against_oracle(k2)


def test_huber():
    w = 1.6
    k = nt.Huber(w)
    # Quadratic below w², linear above (src/robust.jl:48).
    s_small, s_big = 1.0, 9.0
    np.testing.assert_allclose(k.rho(s_small), s_small)
    np.testing.assert_allclose(k.rho(s_big), np.sqrt(s_big) * 2 * w - w * w)
    # First derivative always matches the oracle; Huber (non-2o) zeroes ρ″ in
    # the linear regime by design, so only check value+ρ′ there.
    for s in S:
        rho, d1, _ = k.rho_dc(s)
        rho_a, d1_a, _ = auto_rho_dc(k.rho, s)
        np.testing.assert_allclose(rho, rho_a, rtol=1e-12)
        np.testing.assert_allclose(d1, d1_a, rtol=1e-9)


def test_huber2o():
    k = nt.Huber2o(1.6)
    check_against_oracle(k, svals=S[S != 1.6 ** 2])


def test_geman_mcclure():
    k = nt.GemanMcclure(2.0)
    np.testing.assert_allclose(k.rho(S), S * 4.0 / (S + 4.0))
    check_against_oracle(k)


def test_contaminated_gaussian_values():
    k = nt.ContaminatedGaussian()
    p = nt.ContaminatedGaussian.make_params(1.0, 10.0, 0.8)
    # Ordering invariant: first component narrowest → larger inverse sigma.
    assert p[0] >= p[1]
    np.testing.assert_allclose(
        nt.ContaminatedGaussian.sigmas_weight(p), [1.0, 10.0, 0.8]
    )
    # Analytic rho_dc vs the autodiff oracle.
    for s in [0.0, 0.5, 2.0, 40.0]:
        rho, d1, d2 = k.rho_dc(p, s)
        rho_a, d1_a, d2_a = auto_rho_dc(lambda s_: k.rho(p, s_), jnp.asarray(s))
        np.testing.assert_allclose(rho, rho_a, rtol=1e-12)
        np.testing.assert_allclose(d1, d1_a, rtol=1e-9)
        np.testing.assert_allclose(d2, d2_a, rtol=1e-9, atol=1e-14)


def test_contaminated_gaussian_dkernel():
    """rho_dkernel must be the Hessian of ρ(retract(k, t), s + t[3]) at 0
    (autorobustifydkernel semantics, src/autodiff.jl:164-165)."""
    k = nt.ContaminatedGaussian()
    p = nt.ContaminatedGaussian.make_params(1.3, 4.0, 0.7)
    s = jnp.asarray(2.5)
    val, grad, hess = k.rho_dkernel(p, s)
    man = k.manifold

    def f(z):
        return k.rho(man.retract(p, z[:3]), s + z[3])

    z0 = jnp.zeros(4)
    np.testing.assert_allclose(val, f(z0), rtol=1e-12)
    np.testing.assert_allclose(grad, jax.grad(f)(z0), rtol=1e-9)
    np.testing.assert_allclose(hess, jax.hessian(f)(z0), rtol=1e-8, atol=1e-12)
    # Consistency: the (s, s) entries match the analytic rho_dc.
    rho, d1, d2 = k.rho_dc(p, s)
    np.testing.assert_allclose(grad[3], d1, rtol=1e-9)
    np.testing.assert_allclose(hess[3, 3], d2, rtol=1e-8)


def test_em_fit_recovers_mixture():
    """EM on a synthetic contaminated sample (reference optimize(kernel, ...)
    src/robustadaptive.jl:48-73; statistical targets as in
    test/adaptivecost.jl)."""
    rng = np.random.default_rng(1)
    errs = np.concatenate([rng.normal(0, 1.0, 4000), rng.normal(0, 10.0, 1000)])
    sq = jnp.asarray(errs**2)
    p0 = nt.ContaminatedGaussian.make_params(0.5, 5.0, 0.6)
    p = nt.em_fit(p0, sq, max_iters=50)
    s1, s2, w = np.asarray(nt.ContaminatedGaussian.sigmas_weight(p))
    np.testing.assert_allclose(s1, 1.0, rtol=0.1)
    np.testing.assert_allclose(s2, 10.0, rtol=0.1)
    np.testing.assert_allclose(w, 0.8, rtol=0.1)
