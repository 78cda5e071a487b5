"""Adaptive ContaminatedGaussian kernel fitting — the reference's
examples/adaptivekernel.jl: jointly optimize the mixture parameters and a
mean over a contaminated sample, then compare against the EM fit.

Run:  python examples/adaptivekernel.py
"""

import sys

sys.path.insert(0, ".")

import os

# Demos default to CPU: on tunneled TPU backends compiles take minutes and a
# demo is not worth a device slot (set NLLSTPU_PLATFORM=tpu to override).
import jax

jax.config.update("jax_platforms", os.environ.get("NLLSTPU_PLATFORM", "cpu"))

import numpy as np
import jax.numpy as jnp

import nllstpu as nt

KERNEL = nt.ContaminatedGaussian()


def measurement(d, m):
    """One shared residual function: costs added with the SAME function
    object group into one padded batch (a fresh lambda per data point would
    compile 500 single-cost batches)."""
    return m - d


def main():
    rng = np.random.default_rng(0)
    inliers = rng.normal(3.0, 1.0, 450)
    outliers = rng.normal(3.0, 12.0, 50)
    data = np.concatenate([inliers, outliers])

    p = nt.Problem()
    kvar = p.add_variable(
        KERNEL.manifold, nt.ContaminatedGaussian.make_params(0.5, 5.0, 0.5)
    )
    mean = p.add_variable(nt.Scalar(), 0.0)
    for d in data:
        p.add_cost(measurement, (kvar, mean), params=d, kernel=KERNEL)

    result = nt.optimize(p, nt.Options(iterator=nt.LEVENBERG_MARQUARDT))
    sw = np.asarray(
        nt.ContaminatedGaussian.sigmas_weight(jnp.asarray(p.get_value(kvar)))
    )
    print(result)
    print(f"\njoint LM fit: sigma1={sw[0]:.3f} sigma2={sw[1]:.3f} "
          f"w={sw[2]:.3f} mean={float(p.get_value(mean)):.3f}")
    print("ground truth: sigma1=1.0  sigma2=12.0  w=0.9  mean=3.0")

    # Pure EM on the residuals at the fitted mean.
    sq = jnp.asarray((data - float(p.get_value(mean))) ** 2)
    em = nt.em_fit(nt.ContaminatedGaussian.make_params(0.5, 5.0, 0.5), sq, 50)
    ew = np.asarray(nt.ContaminatedGaussian.sigmas_weight(em))
    print(f"EM fit:       sigma1={ew[0]:.3f} sigma2={ew[1]:.3f} w={ew[2]:.3f}")


if __name__ == "__main__":
    main()
