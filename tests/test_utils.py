"""Utility tests: checkpoint save/restore and readback-fenced timing."""

import os

import numpy as np

import nllstpu as nt
from nllstpu.models.rosenbrock import make_rosenbrock
from nllstpu.utils import checkpoint, profiling


def test_checkpoint_roundtrip(tmp_path):
    p, x, y = make_rosenbrock(x0=-0.5, y0=2.5)
    nt.optimize(p, nt.Options(max_iters=3))
    path = os.path.join(tmp_path, "state.npz")
    checkpoint.save_variables(path, p, extra={"lm_lambda": 1e-3})
    vx, vy = p.get_value(x), p.get_value(y)
    # Clobber and restore.
    p.set_value(x, 42.0)
    p.set_value(y, -7.0)
    extras = checkpoint.load_variables(path, p)
    np.testing.assert_allclose(p.get_value(x), vx)
    np.testing.assert_allclose(p.get_value(y), vy)
    np.testing.assert_allclose(extras["lm_lambda"], 1e-3)
    # Resuming continues to the optimum.
    result = nt.optimize(p)
    np.testing.assert_allclose(float(p.get_value(x)), 1.0, rtol=1e-8)


def test_timed_fence():
    import jax.numpy as jnp
    import jax

    f = jax.jit(lambda x: (x * 2, {"y": x + 1}))
    secs, out = profiling.timed(f, jnp.ones(16))
    assert secs > 0
    np.testing.assert_allclose(out[0], 2.0)
