"""Pallas TPU kernel: fully-fused obs-major Schur assembly leg.

One pass over the obs-major (landmark-run) Jacobian produces all three
eliminated-side outputs of the direct Schur system:

    h_ll [dl, dl, L]   per-landmark Hessian blocks
    g_l  [dl, L]       per-landmark gradients
    w    [dl, L, drp]  dense coupling, camera columns placed in-kernel

from ``jac [n, S, K, L]`` (K-major tiles of the dual-sorted cm batch),
``g0 = Jᵀr``, masked robust weights (d1, d2·2) and the per-cost camera id
``vc``.  The robustified block composition (JᵀJ·ρ′ + 2ρ″·g₀g₀ᵀ,
reference src/residual.jl:57-111) happens in VMEM registers: compared to
the XLA fusion chain + ``place_w``, this also removes the [Sr, dl, B]
coupling-block intermediate and its transpose from HBM.  Kernel HBM
traffic = one jac/g0 read + one write of each output.

Opt-in via ``NLLSTPU_W_IMPL=fused`` (TPU; ``fused_interpret`` for CPU
tests) — same A/B gating as ``w_place``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .w_place import TILE_L


def _kernel(jac_ref, g0_ref, d1_ref, d2_ref, vc_ref, h_ref, g_ref, w_ref, *,
            n_real, n_r, nrp, dr_s, dl, k_len, e_start, tile_l):
    i = pl.program_id(0)
    n, s = jac_ref.shape[0], jac_ref.shape[1]
    dt = jac_ref.dtype
    l_ids = i * tile_l + jax.lax.broadcasted_iota(jnp.int32, (tile_l, 1), 0)
    l_ok = (l_ids < n_real).reshape(1, tile_l)
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_l, nrp), 1)

    def reduced(x):
        """Drop the eliminated segment from an [..., S, TL] block."""
        parts = []
        if e_start:
            parts.append(x[..., :e_start, :])
        if e_start + dl < s:
            parts.append(x[..., e_start + dl :, :])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-2)

    def body(k, carry):
        acc_w, acc_h, acc_g = carry
        jac_k = jac_ref[:, :, pl.ds(k, 1), :].reshape(n, s, tile_l)
        g0_k = g0_ref[:, pl.ds(k, 1), :].reshape(s, tile_l)
        # Tile-pad lanes (l >= n_real) read garbage: zero the weights there
        # (products stay per-lane, and pad rows are dropped on write-back).
        d1 = jnp.where(l_ok, d1_ref[pl.ds(k, 1), :].reshape(1, tile_l), dt.type(0))
        d2 = jnp.where(l_ok, d2_ref[pl.ds(k, 1), :].reshape(1, tile_l), dt.type(0))
        je = jac_k[:, e_start : e_start + dl]  # [n, dl, TL]
        g0e = g0_k[e_start : e_start + dl]  # [dl, TL]
        he = (
            jnp.sum(je[:, :, None, :] * je[:, None, :, :], axis=0) * d1
            + d2 * g0e[:, None, :] * g0e[None, :, :]
        )  # [dl, dl, TL]
        jr = reduced(jac_k)  # [n, Sr, TL]
        g0r = reduced(g0_k)  # [Sr, TL]
        we = (
            jnp.sum(jr[:, :, None, :] * je[:, None, :, :], axis=0) * d1
            + d2 * g0r[:, None, :] * g0e[None, :, :]
        )  # [Sr, dl, TL]
        vc_k = vc_ref[pl.ds(k, 1), :].reshape(1, tile_l)
        ok = jnp.logical_and(vc_k < n_r, l_ok)
        oh = jnp.where(
            jnp.logical_and(vc_k.T == v_iota, ok.T), dt.type(1), dt.type(0)
        )  # [TL, NRp]
        acc_w = acc_w + we.reshape(dr_s * dl, tile_l)[:, :, None] * oh[None]
        return acc_w, acc_h + he, acc_g + g0e * d1

    acc_w, acc_h, acc_g = jax.lax.fori_loop(
        0,
        k_len,
        body,
        (
            jnp.zeros((dr_s * dl, tile_l, nrp), dtype=dt),
            jnp.zeros((dl, dl, tile_l), dtype=dt),
            jnp.zeros((dl, tile_l), dtype=dt),
        ),
    )
    h_ref[:] = acc_h
    g_ref[:] = acc_g
    tmp = (
        acc_w.reshape(dr_s, dl, tile_l, nrp)
        .transpose(1, 2, 3, 0)
        .reshape(dl, tile_l, nrp * dr_s)
    )
    w_ref[:] = jnp.zeros_like(w_ref)
    w_ref[:, :, : n_r * dr_s] = tmp[:, :, : n_r * dr_s]


def fused_obs_leg(jac_t, g0_t, d1m_t, d2m_t, vc, n_r: int, dr_s: int,
                  dl: int, drp: int, e_start: int, interpret: bool = False):
    """See module docstring.  ``jac_t`` [n, S, K, L], ``g0_t`` [S, K, L],
    ``d1m_t``/``d2m_t`` [K, L] (mask already folded in; d2 pre-doubled),
    ``vc`` [K, L] int32.  Returns ``(h_ll [dl, dl, L], g_l [dl, L],
    w [dl, L, drp])``."""
    n, s, k_len, n_real = jac_t.shape
    assert e_start + dl <= s
    tile_l = TILE_L
    grid = pl.cdiv(n_real, tile_l)
    nrp = -(-n_r // 128) * 128
    kernel = functools.partial(
        _kernel,
        n_real=n_real,
        n_r=n_r,
        nrp=nrp,
        dr_s=dr_s,
        dl=dl,
        k_len=k_len,
        e_start=e_start,
        tile_l=tile_l,
    )
    h_ll, g_l, w = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, s, k_len, tile_l), lambda i: (i * 0, i * 0, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, k_len, tile_l), lambda i: (i * 0, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_len, tile_l), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_len, tile_l), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_len, tile_l), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((dl, dl, tile_l), lambda i: (i * 0, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, tile_l), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, tile_l, drp), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((dl, dl, grid * tile_l), jac_t.dtype),
            jax.ShapeDtypeStruct((dl, grid * tile_l), jac_t.dtype),
            jax.ShapeDtypeStruct((dl, grid * tile_l, drp), jac_t.dtype),
        ),
        interpret=interpret,
    )(jac_t, g0_t, d1m_t, d2m_t, vc)
    return h_ll[:, :, :n_real], g_l[:, :n_real], w[:, :n_real]
