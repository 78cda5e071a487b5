"""Robust curve fitting sweeping every fixed robustifier (the reference's
robustifiers example as a test; BASELINE.json config line 2): with 15% gross
outliers, every redescending/robust kernel must recover (m, c) far better
than the unrobust fit."""

import numpy as np
import pytest

import nllstpu as nt
from nllstpu.models.curvefit import make_curve_fit

KERNELS = [
    nt.Huber(0.5),
    nt.Huber2o(0.5),
    nt.GemanMcclure(0.5),
    nt.Cauchy(0.5),
    nt.Welsch(0.5),
    nt.Scaled(nt.Huber(0.5), 2.0),
]


def _fit(kernel):
    p, mc, truth = make_curve_fit(kernel=kernel, seed=3)
    nt.optimize(p, nt.Options(iterator=nt.LEVENBERG_MARQUARDT))
    return np.asarray(p.get_value(mc)), truth


@pytest.mark.parametrize("kernel", KERNELS, ids=lambda k: type(k).__name__)
def test_robust_kernels_reject_outliers(kernel):
    fitted, truth = _fit(kernel)
    # Huber-family kernels are convex (not redescending) so one-sided gross
    # outliers retain a small pull; redescending kernels nearly eliminate it.
    atol = 0.1 if "Huber" in type(kernel).__name__ or "Scaled" in type(kernel).__name__ else 0.05
    np.testing.assert_allclose(fitted, truth, atol=atol)


def test_unrobust_fit_is_biased():
    fitted, truth = _fit(None)
    assert np.abs(fitted - truth).max() > 0.15  # outliers bias the LS fit
