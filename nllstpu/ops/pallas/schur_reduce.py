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
([Dr, TILE] x [TILE, Dr] per (tile, e)).

Mosaic constraints (learned from an on-chip failure): integer indexing a
loaded >2D array plus ``None``-broadcast lowers to an unsupported >2D
gather, and >2D reshapes that remix lane/sublane axes are "unsupported
shape cast".  So the host passes ``h_inv`` flattened to ``[L, dl*dl]`` and
``g_l`` transposed to ``[L, dl]``: every in-kernel operand is then a plain
2D slice (``hi_ref[:, c:c+1]``), a 2D broadcast multiply, or a 2D
``dot_general`` — nothing is reshaped or gathered inside the kernel.

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


def _kernel(w_ref, hi_ref, g_ref, s_ref, r_ref, *, dl):
    i = pl.program_id(0)
    # Accumulate in the h_inv dtype (f32/f64) even when W is stored bf16
    # (NLLSTPU_W_DTYPE=bf16): the upcast happens in registers after the
    # half-width HBM read.
    dt = hi_ref.dtype
    # One [TL, Dr] load per eliminated component (2D slices of the ref).
    w_rows = [w_ref[d].astype(dt) for d in range(dl)]

    s_acc = None
    r_acc = None
    for e_ix in range(dl):
        # y_e[l, r] = sum_d h_inv[e, d, l] * w[d, l, r]: dl broadcast FMAs
        # of [TL, 1] columns against [TL, Dr] rows.
        y_e = hi_ref[:, e_ix * dl : e_ix * dl + 1] * w_rows[0]
        for d_ix in range(1, dl):
            c = e_ix * dl + d_ix
            y_e = y_e + hi_ref[:, c : c + 1] * w_rows[d_ix]
        # MXU contractions over the TL (landmark) axis.  Precision matters:
        # Mosaic lowers an unqualified f32 dot to ONE bf16 MXU pass
        # (~4e-3 relative error, measured on-chip); HIGHEST requests the
        # full f32 multi-pass.
        s_e = jax.lax.dot_general(
            y_e, w_rows[e_ix], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dt.type,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Dr, Dr]
        r_e = jax.lax.dot_general(
            y_e, g_ref[:, e_ix : e_ix + 1],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dt.type,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Dr, 1]
        s_acc = s_e if s_acc is None else s_acc + s_e
        r_acc = r_e if r_acc is None else r_acc + r_e

    @pl.when(i == 0)
    def _():
        s_ref[:] = s_acc
        r_ref[:] = r_acc

    @pl.when(i > 0)
    def _():
        s_ref[:] = s_ref[:] + s_acc
        r_ref[:] = r_ref[:] + r_acc


def _kernel_lm(w_ref, hi_ref, g_ref, s_ref, r_ref, *, dl):
    """Landmark-minor variant for the p-major W layout (w [dl, wc, L],
    see ops/pallas/w_place.py): per-component operands are [1, TL]
    sublane slices, y_e is [wc, TL], and the MXU contracts over the
    lane (landmark) axis.

    The rhs contraction cannot be a [wc, 1]-shaped dot: Mosaic lowers a
    lane-contraction with a width-1 result to ``vector.multi_reduction``
    and rejects its chained accumulator ("only constant accumulators
    supported", observed on-chip).  Instead g_e is embedded as row 0 of a
    zero-padded [8, TL] operand so the rhs rides a normal MXU matmul;
    the caller reads column 0 of the [wc, 8] result.

    Precision: HIGHEST (full f32 multi-pass).  Mosaic rejects HIGH
    ("Unsupported dot precision: HIGH", observed on-chip in round 3 when
    a bf16x3 pass was tried to close this kernel's phase-A/B loss of
    1.93-1.99 vs 1.46 ms XLA) and an unqualified f32 dot lowers to ONE
    bf16 pass (~4e-3 relative error) — so the kernel stays opt-in and the
    XLA pm-layout solve remains the default."""
    i = pl.program_id(0)
    dt = hi_ref.dtype
    prec = jax.lax.Precision.HIGHEST
    w_rows = [w_ref[d].astype(dt) for d in range(dl)]  # [wc, TL]
    tile_l = w_ref.shape[-1]
    row0 = (
        jax.lax.broadcasted_iota(jnp.int32, (8, tile_l), 0) == 0
    )  # [8, TL]

    s_acc = None
    r_acc = None
    for e_ix in range(dl):
        y_e = hi_ref[e_ix * dl : e_ix * dl + 1, :] * w_rows[0]
        for d_ix in range(1, dl):
            c = e_ix * dl + d_ix
            y_e = y_e + hi_ref[c : c + 1, :] * w_rows[d_ix]
        s_e = jax.lax.dot_general(
            y_e, w_rows[e_ix], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dt.type,
            precision=prec,
        )  # [wc, wc]
        g_pad = jnp.where(row0, g_ref[e_ix : e_ix + 1, :], dt.type(0))
        r_e = jax.lax.dot_general(
            y_e, g_pad, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dt.type,
            precision=prec,
        )  # [wc, 8]
        s_acc = s_e if s_acc is None else s_acc + s_e
        r_acc = r_e if r_acc is None else r_acc + r_e

    @pl.when(i == 0)
    def _():
        s_ref[:] = s_acc
        r_ref[:] = r_acc

    @pl.when(i > 0)
    def _():
        s_ref[:] = s_ref[:] + s_acc
        r_ref[:] = r_ref[:] + r_acc


def reduce_s_lm(w, h_inv, g_l, interpret: bool = False):
    """Landmark-minor reduce for the p-major W: ``w`` [dl, wc, L] (may be
    bf16), ``h_inv`` [dl, dl, L], ``g_l`` [dl, L].  Returns
    ``(s_sum [wc, wc], rhs_sum [wc])`` in ``h_inv.dtype`` — still in the
    p-major basis; the caller gathers through pm_of_std."""
    dl, wc, n_real = w.shape
    assert h_inv.shape == (dl, dl, n_real), (h_inv.shape, w.shape)
    assert g_l.shape == (dl, n_real), (g_l.shape, w.shape)
    tile_l = min(TILE_L, max(128, -(-n_real // 128) * 128))
    grid = pl.cdiv(n_real, tile_l)
    pad = grid * tile_l - n_real
    if pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad)))
        h_inv = jnp.pad(h_inv, ((0, 0), (0, 0), (0, pad)))
        g_l = jnp.pad(g_l, ((0, 0), (0, pad)))
    hi2 = h_inv.reshape(dl * dl, grid * tile_l)  # [e*dl+d, L]
    kernel = functools.partial(_kernel_lm, dl=dl)
    s_sum, rhs_sum = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((dl, wc, tile_l), lambda i: (i * 0, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dl * dl, tile_l), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, tile_l), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((wc, wc), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, 8), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((wc, wc), h_inv.dtype),
            jax.ShapeDtypeStruct((wc, 8), h_inv.dtype),
        ),
        interpret=interpret,
    )(w, hi2, g_l)
    return s_sum, rhs_sum[:, 0]


def reduce_s(w, h_inv, g_l, interpret: bool = False):
    """See module docstring.  ``w`` [dl, L, Dr] (may be bf16-stored,
    NLLSTPU_W_DTYPE), ``h_inv`` [dl, dl, L] (symmetric damped block
    inverses), ``g_l`` [dl, L].  Returns ``(s_sum [Dr, Dr],
    rhs_sum [Dr])`` in ``h_inv.dtype`` (the accumulation dtype).

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
    # Landmark-major 2D layouts so the kernel never indexes a >2D value:
    # hi2[l, e*dl+d] = h_inv[e, d, l];  g2[l, e] = g_l[e, l].
    hi2 = h_inv.reshape(dl * dl, grid * tile_l).T
    g2 = g_l.T
    kernel = functools.partial(_kernel, dl=dl)
    s_sum, rhs_sum = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((dl, tile_l, dr), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_l, dl * dl), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_l, dl), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((dr, dr), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dr, 1), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((dr, dr), h_inv.dtype),
            jax.ShapeDtypeStruct((dr, 1), h_inv.dtype),
        ),
        interpret=interpret,
    )(w, hi2, g2)
    return s_sum, rhs_sum[:, 0]
