"""Adaptive Barron kernel and the extra fixed kernels (Cauchy/Welsch/Tukey):
derivative-oracle checks plus joint LM recovery of (α, c) and a mean on
contaminated data."""

import jax.numpy as jnp
import numpy as np

import nllstpu as nt
from nllstpu.core.robust import _BARRON_ALPHAS, _BARRON_LOGZ, auto_rho_dc

S = jnp.linspace(0.1, 12.0, 13)


def test_fixed_kernels_vs_oracle():
    for k in (nt.Cauchy(1.5), nt.Welsch(2.0)):
        for s in S:
            rho, d1, d2 = k.rho_dc(s)
            rho_a, d1_a, d2_a = auto_rho_dc(k.rho, s)
            np.testing.assert_allclose(rho, rho_a, rtol=1e-12)
            np.testing.assert_allclose(d1, d1_a, rtol=1e-9)
            np.testing.assert_allclose(d2, d2_a, rtol=1e-9, atol=1e-14)
    # Tukey uses the autodiff fallback; just sanity-check the shape.
    t = nt.Tukey(2.0)
    assert float(t.rho(jnp.asarray(100.0))) == float(t.rho(jnp.asarray(4.0)))
    assert float(t.rho(jnp.asarray(0.0))) == 0.0


def test_barron_limits():
    k = nt.Barron()
    # α → 2 approaches the Gaussian NLL: ρ ≈ x² + 2·log(c·sqrt(2π)).
    p = nt.Barron.make_params(1.999, 1.0)
    s = jnp.asarray(3.0)
    np.testing.assert_allclose(
        float(k.rho(p, s)), 3.0 + np.log(2 * np.pi), rtol=2e-2
    )
    # Partition table is finite and monotone-ish sane.
    assert np.isfinite(_BARRON_LOGZ).all()
    assert _BARRON_ALPHAS[0] == 0.0 and _BARRON_ALPHAS[-1] == 2.0


def test_barron_joint_fit():
    """Joint LM of (α, c) + mean over contaminated data: the fitted α must
    drop well below 2 (heavy tails detected) and the mean must be robust."""
    rng = np.random.default_rng(0)
    data = np.concatenate(
        [rng.normal(5.0, 1.0, 900), rng.normal(5.0, 1.0, 100) + rng.choice([-1, 1], 100) * 30.0]
    )
    kernel = nt.Barron()
    p = nt.Problem()
    kvar = p.add_variable(kernel.manifold, nt.Barron.make_params(1.5, 2.0))
    mean = p.add_variable(nt.Scalar(), 0.0)
    p.add_cost_batch(
        lambda d, m: m - d,
        slots=[(kernel.manifold, np.zeros(len(data), np.int32)),
               (nt.Scalar(), np.zeros(len(data), np.int32))],
        params=data,
        kernel=kernel,
    )
    result = nt.optimize(p, nt.Options(iterator=nt.LEVENBERG_MARQUARDT))
    alpha, c = np.asarray(p.get_value(kvar))
    np.testing.assert_allclose(float(p.get_value(mean)), 5.0, atol=0.3)
    assert alpha < 1.0  # heavy contamination → small alpha
    assert 0.5 < c < 2.5  # scale near the inlier sigma
    assert result.best_cost < result.start_cost
