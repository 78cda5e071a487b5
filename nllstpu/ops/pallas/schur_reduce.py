"""Pallas TPU kernel: fused Schur-complement reduction for the direct solve.

``reduce_s(w, h_inv, g_l) -> (s_sum [Dr, Dr], rhs_sum [Dr])`` computes

    y[e, l, :] = sum_d h_inv[e, d, l] * w[d, l, :]     (never materialized)
    s_sum      = sum_{e,l} y[e, l, :] outer w[e, l, :]   = W H^-1 W^T
    rhs_sum    = sum_{e,l} y[e, l, :] * g_l[e, l]        = W H^-1 g_l

over the components-major coupling ``w [dl, L, Dr]``, the damped
block-diagonal inverses ``h_inv [dl, dl, L]`` and the eliminated gradient
``g_l [dl, L]``.  The caller forms ``S = A_rr(+lam) - s_sum`` and
``rhs = b_r - rhs_sum``.

Why a kernel: the XLA path of ``SchurOps._solve`` (ops/schur.py) writes the
75 MB (bench scale) intermediate ``y = W.H^-1`` to HBM, then reads y + W for
the S contraction and y again for the rhs — roughly 300 MB of traffic per
damped attempt.  Here each landmark tile of W is read into VMEM once, y is
formed in registers, and both outputs accumulate in VMEM across the
(sequential) grid — kernel HBM traffic is ONE read of W plus the tiny
[Dr, Dr] result, ~75 MB total.  The contraction itself is an MXU matmul
([Dr, dl*TILE] x [dl*TILE, Dr] per tile).

Reference parity note: this computes the marginalization the reference only
prepares via ``reordercostsforschur!`` (/root/reference/src/problem.jl:177)
but never solves; see the ops/schur.py module docstring.

Opt-in via ``NLLSTPU_SOLVE_IMPL=pallas`` (TPU; ``pallas_interpret`` for CPU
tests) — same A/B gating discipline as ``NLLSTPU_W_IMPL``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .w_place import TILE_L


def _kernel(w_ref, hi_ref, g_ref, s_ref, r_ref, *, dl, tile_l):
    i = pl.program_id(0)
    dr = w_ref.shape[-1]
    dt = w_ref.dtype
    w_t = w_ref[:]  # [dl, TL, Dr]
    hi_t = hi_ref[:]  # [dl, dl, TL]
    g_t = g_ref[:]  # [dl, TL]

    # y[e] = sum_d h_inv[e, d] * w[d]  — dl is tiny (<= 3 for landmarks), so
    # this is dl*dl fused VPU multiply-adds over [TL, Dr] registers.
    y_rows = []
    for e_ix in range(dl):
        acc = hi_t[e_ix, 0, :, None] * w_t[0]
        for d_ix in range(1, dl):
            acc = acc + hi_t[e_ix, d_ix, :, None] * w_t[d_ix]
        y_rows.append(acc)  # [TL, Dr]
    y2 = jnp.concatenate(y_rows, axis=0)  # [dl*TL, Dr], index = e*TL + l
    w2 = w_t.reshape(dl * tile_l, dr)  # same e*TL + l ordering
    g2 = g_t.reshape(dl * tile_l, 1)

    # MXU contractions over the (dl*TL) landmark-tile axis.
    s_delta = jax.lax.dot_general(
        y2, w2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=dt.type,
    )  # [Dr, Dr]
    r_delta = jax.lax.dot_general(
        y2, g2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=dt.type,
    )  # [Dr, 1]

    @pl.when(i == 0)
    def _():
        s_ref[:] = s_delta
        r_ref[:] = r_delta

    @pl.when(i > 0)
    def _():
        s_ref[:] = s_ref[:] + s_delta
        r_ref[:] = r_ref[:] + r_delta


def reduce_s(w, h_inv, g_l, interpret: bool = False):
    """See module docstring.  ``w`` [dl, L, Dr], ``h_inv`` [dl, dl, L]
    (symmetric damped block inverses), ``g_l`` [dl, L].  Returns
    ``(s_sum [Dr, Dr], rhs_sum [Dr])`` in ``w.dtype``.

    L is zero-padded up to the landmark tile (a no-op at shapes that are
    already tile multiples); padded lanes contribute exact zeros, so no
    in-kernel masking is needed.
    """
    dl, n_real, dr = w.shape
    assert h_inv.shape == (dl, dl, n_real), (h_inv.shape, w.shape)
    assert g_l.shape == (dl, n_real), (g_l.shape, w.shape)
    tile_l = min(TILE_L, max(8, -(-n_real // 8) * 8))
    grid = pl.cdiv(n_real, tile_l)
    pad = grid * tile_l - n_real
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
        h_inv = jnp.pad(h_inv, ((0, 0), (0, 0), (0, pad)))
        g_l = jnp.pad(g_l, ((0, 0), (0, pad)))
    kernel = functools.partial(_kernel, dl=dl, tile_l=tile_l)
    s_sum, rhs_sum = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((dl, tile_l, dr), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, dl, tile_l), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, tile_l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((dr, dr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dr, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((dr, dr), w.dtype),
            jax.ShapeDtypeStruct((dr, 1), w.dtype),
        ),
        interpret=interpret,
    )(w, h_inv, g_l)
    return s_sum, rhs_sum[:, 0]
