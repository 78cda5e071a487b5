"""Pallas TPU kernel: fully-fused obs-major Schur assembly leg (p-major W).

One pass over the obs-major (landmark-run) Jacobian produces all three
eliminated-side outputs of the direct Schur system:

    h_ll [dl, dl, L]            per-landmark Hessian blocks
    g_l  [dl, L]                per-landmark gradients
    w_pm [dl, dr_s*NRp, L]      dense coupling, p-major landmark-minor —
                                the same layout as ops/pallas/w_place.py,
                                consumed through ``SchurOps.pm``

from ``jac [n, S, K, L]`` (K-major tiles of the dual-sorted cm batch),
``g0 = Jᵀr``, masked robust weights (d1, d2·2) and the per-cost camera id
``vc``.  The robustified block composition (JᵀJ·ρ′ + 2ρ″·g₀g₀ᵀ, reference
src/residual.jl:57-111) happens in VMEM: compared to the XLA fusion chain
(he compose → h_ll/g_l reduction → we compose → one-hot W contraction,
measured ~2.3 ms of the 5.2 ms assemble at bench scale), the Jacobian is
read once and every output is written once.

Kernel structure (same playbook as w_place.py, learned from on-chip
Mosaic failures and a slow first shape):
- K outer and fully unrolled, the one-hot camera mask hoisted per ``k``
  and shared by all dr_s·dl coupling rows (the first shape recomputed it
  per row and paid X·K tiny fori trips).
- P-MAJOR W columns (``p*NRp + v``): the standard ``v*dr_s + p``
  interleave needs a lane-remixing reshape — "unsupported shape cast" on
  the remote Mosaic (this exact kernel faulted there in its first form).
- Every in-kernel operand is a [1, TL] or [NRp, TL] 2D slice; h/g
  accumulate in registers and are written once per tile.

Opt-in via ``NLLSTPU_W_IMPL=fused`` (TPU; ``fused_interpret`` for CPU
tests) — engages only when ``SchurInfo.w_pm`` qualifies (sole W writer,
see ops/schur.py ``_w_pm_data``).
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
    l_ok = (
        i * tile_l + jax.lax.broadcasted_iota(jnp.int32, (1, tile_l), 1)
        < n_real
    )
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (nrp, tile_l), 0)
    r_rows = [r for r in range(s) if not (e_start <= r < e_start + dl)]

    h_rows = {}
    g_rows = {}
    w_ref[:] = jnp.zeros_like(w_ref)
    for k in range(k_len):
        # Tile-pad lanes (l >= n_real) read garbage: zero the weights there
        # (every output term below carries d1 or d2).
        d1 = jnp.where(l_ok, d1_ref[k : k + 1, :], dt.type(0))
        d2 = jnp.where(l_ok, d2_ref[k : k + 1, :], dt.type(0))
        vc_k = vc_ref[k : k + 1, :]
        oh = jnp.where(
            jnp.logical_and(vc_k == v_iota, vc_k < n_r),
            dt.type(1),
            dt.type(0),
        )  # [NRp, TL]
        je = [
            [jac_ref[ni, e_start + d, k : k + 1, :] for d in range(dl)]
            for ni in range(n)
        ]
        g0e = [g0_ref[e_start + d, k : k + 1, :] for d in range(dl)]
        # h_ll / g_l rows (upper triangle mirrored on write-back).
        for e1 in range(dl):
            g_rows[e1] = g_rows.get(e1, dt.type(0)) + g0e[e1] * d1
            for e2 in range(e1, dl):
                jj = sum(je[ni][e1] * je[ni][e2] for ni in range(n))
                h_rows[(e1, e2)] = h_rows.get((e1, e2), dt.type(0)) + (
                    jj * d1 + d2 * g0e[e1] * g0e[e2]
                )
        # W coupling rows, placed against the hoisted one-hot.
        for p, r in enumerate(r_rows):
            jr_p = [jac_ref[ni, r, k : k + 1, :] for ni in range(n)]
            g0r_p = g0_ref[r, k : k + 1, :]
            for d in range(dl):
                row = (
                    sum(jr_p[ni] * je[ni][d] for ni in range(n)) * d1
                    + d2 * g0r_p * g0e[d]
                )  # [1, TL]
                sl = slice(p * nrp, (p + 1) * nrp)
                w_ref[d, sl, :] = w_ref[d, sl, :] + row * oh
    for e1 in range(dl):
        g_ref[e1 : e1 + 1, :] = g_rows[e1]
        for e2 in range(e1, dl):
            h_ref[e1, e2 : e2 + 1, :] = h_rows[(e1, e2)]
            if e2 != e1:
                h_ref[e2, e1 : e1 + 1, :] = h_rows[(e1, e2)]


def fused_obs_leg_pm(jac_t, g0_t, d1m_t, d2m_t, vc, n_r: int, dr_s: int,
                     dl: int, e_start: int, interpret: bool = False):
    """See module docstring.  ``jac_t`` [n, S, K, L], ``g0_t`` [S, K, L],
    ``d1m_t``/``d2m_t`` [K, L] (mask already folded in; d2 pre-doubled),
    ``vc`` [K, L] int32.  Returns ``(h_ll [dl, dl, L], g_l [dl, L],
    w_pm [dl, dr_s*NRp, L])`` with ``NRp = ceil(n_r/128)*128``."""
    n, s, k_len, n_real = jac_t.shape
    assert e_start + dl <= s
    assert s - dl == dr_s, (s, dl, dr_s)
    tile_l = TILE_L
    grid = pl.cdiv(n_real, tile_l)
    nrp = -(-n_r // 128) * 128
    pad = grid * tile_l - n_real
    if pad:
        jac_t = jnp.pad(jac_t, ((0, 0), (0, 0), (0, 0), (0, pad)))
        g0_t = jnp.pad(g0_t, ((0, 0), (0, 0), (0, pad)))
        d1m_t = jnp.pad(d1m_t, ((0, 0), (0, pad)))
        d2m_t = jnp.pad(d2m_t, ((0, 0), (0, pad)))
        vc = jnp.pad(vc, ((0, 0), (0, pad)), constant_values=n_r)
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
    h_ll, g_l, w_pm = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, s, k_len, tile_l),
                         lambda i: (i * 0, i * 0, i * 0, i),
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
            pl.BlockSpec((dl, dr_s * nrp, tile_l),
                         lambda i: (i * 0, i * 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((dl, dl, grid * tile_l), jac_t.dtype),
            jax.ShapeDtypeStruct((dl, grid * tile_l), jac_t.dtype),
            jax.ShapeDtypeStruct((dl, dr_s * nrp, grid * tile_l),
                                 jac_t.dtype),
        ),
        interpret=interpret,
    )(jac_t, g0_t, d1m_t, d2m_t, vc)
    return h_ll[:, :, :n_real], g_l[:, :n_real], w_pm[:, :, :n_real]
