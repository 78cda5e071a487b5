"""Hessian export utilities.

Reference parity: BlockSparseMatrix's exporters — ``Matrix(bsm)``,
``sparse(bsm)``, ``symmetrifyfull/symmetrifysparse``
(src/BlockSparseMatrix.jl:193-264) — used to inspect the assembled normal
equations.  Here the assembled system is already symmetric-full; these
helpers expose it densely or as scipy-style COO triplets built from the same
per-batch block computation the solvers use.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import engine


def hessian_dense(compiled, variables=None):
    """(H [D,D], g [D]) as dense arrays, regardless of the active solver
    backend (reference ``Matrix``/``symmetrifyfull``)."""
    if variables is None:
        raise ValueError("pass the stacked variables dict")
    cost, a, b = engine.assemble_dense(
        compiled.batches, variables, compiled.layout, compiled.dtype
    )
    return a, b


def hessian_coo(compiled, variables):
    """Symmetric Hessian as COO triplets ``(rows, cols, vals)`` with
    duplicates NOT summed (callers feed scipy.sparse.coo_matrix, which sums
    on construction) — the ``sparse``/``symmetrifysparse`` analogue."""
    d = compiled.layout.dof_total
    rows_out, cols_out, vals_out = [], [], []
    for batch in compiled.batches:
        _, g, h, rows = engine.batch_grad_hess(
            batch, variables, compiled.layout, compiled.dtype
        )
        r = np.asarray(rows)
        hv = np.asarray(h)
        bsz, s = r.shape
        rr = np.broadcast_to(r[:, :, None], (bsz, s, s))
        cc = np.broadcast_to(r[:, None, :], (bsz, s, s))
        keep = (rr < d) & (cc < d)
        rows_out.append(rr[keep])
        cols_out.append(cc[keep])
        vals_out.append(hv[keep])
    return (
        np.concatenate(rows_out),
        np.concatenate(cols_out),
        np.concatenate(vals_out),
    )


def covariance(compiled, variables, damping=0.0):
    """Inverse of the (optionally damped) dense Hessian — the reference's
    ``invsym`` use case (src/linearsolver.jl:35-36) for extracting marginal
    covariances after convergence."""
    from ..core.linearsolver import invert_psd

    a, _ = hessian_dense(compiled, variables)
    if damping:
        a = a + damping * jnp.eye(a.shape[0], dtype=a.dtype)
    return invert_psd(a)
