"""Pallas TPU kernel: direct placement of the Schur W coupling.

``place_w(we_x [X, K, L], vc [K, L], n_r, dr_s, drp) -> w [dl, L, drp]``
computes ``w[d, l, v*dr_s + p] = Σ_k we_x[p*dl + d, k, l]·(vc[k, l] == v)``
— the obs-major → camera-column placement of the per-cost coupling blocks
(X = dr_s·dl, run length K per landmark, camera id ``vc`` with any value
``>= n_r`` dropped).

This replaces the XLA one-hot fast path of the direct Schur assembly
(ops/schur.py ``_assemble_fast_dual``), which at bench scale (105k obs,
128 cam, 8192 lmk) materializes in HBM: the [L·K, n_r] one-hot operand
(~54 MB), the [dl, L, n_r·dr_s] contraction result (~75 MB), and a second
W-sized add.  Here the one-hot never exists (the comparison happens against
an in-register iota), the per-landmark-tile accumulator lives in VMEM, and
W is written to HBM exactly once — the kernel's HBM traffic is one read of
``we_x`` plus one write of W.

Layouts are chosen for TPU tiling: ``we_x`` is (x, k, l) so the kernel's
per-k slices are contiguous [X, TL] lane vectors; the output keeps the
direct backend's components-major [dl, L, Dr] W.  Verified against the
one-hot path in interpret mode (CPU tests); compile on a real chip is
A/B-gated via ``NLLSTPU_W_IMPL=pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Landmarks per grid program (lane-axis width of the we_x block).
TILE_L = 256


def _kernel(we_ref, vc_ref, w_ref, *, n_real, n_r, nrp, dr_s, dl, k_len,
            tile_l):
    i = pl.program_id(0)
    x = we_ref.shape[0]
    # Landmark-validity mask for the (padded) last tile.
    l_ids = i * tile_l + jax.lax.broadcasted_iota(jnp.int32, (tile_l, 1), 0)
    l_ok = (l_ids < n_real).reshape(1, tile_l)

    v_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_l, nrp), 1)

    def body(k, acc):
        we_k = we_ref[:, pl.ds(k, 1), :].reshape(x, tile_l)  # [X, TL]
        vc_k = vc_ref[pl.ds(k, 1), :].reshape(1, tile_l)  # [1, TL]
        ok = jnp.logical_and(vc_k < n_r, l_ok)  # drop dustbin/pad columns
        oh = jnp.where(
            jnp.logical_and(vc_k.T == v_iota, ok.T),
            jnp.float32(1.0),
            jnp.float32(0.0),
        )  # [TL, NRp]
        return acc + we_k[:, :, None] * oh[None, :, :]

    acc = jax.lax.fori_loop(
        0,
        k_len,
        body,
        jnp.zeros((x, tile_l, nrp), dtype=we_ref.dtype),
    )
    # acc[x = p*dl + d, l, v]  →  w[d, l, v*dr_s + p].
    tmp = (
        acc.reshape(dr_s, dl, tile_l, nrp)
        .transpose(1, 2, 3, 0)
        .reshape(dl, tile_l, nrp * dr_s)
    )
    w_ref[:] = jnp.zeros_like(w_ref)
    w_ref[:, :, : n_r * dr_s] = tmp[:, :, : n_r * dr_s]


def place_w(we_x, vc, n_r: int, dr_s: int, dl: int, drp: int,
            interpret: bool = False):
    """See module docstring.  ``we_x`` [X=dr_s·dl, K, L] (any float dtype;
    computed in f32 on TPU), ``vc`` [K, L] int32.  Returns [dl, L, drp]."""
    x, k_len, n_real = we_x.shape
    assert x == dr_s * dl, (x, dr_s, dl)
    assert n_r * dr_s <= drp, (n_r, dr_s, drp)
    tile_l = TILE_L
    grid = pl.cdiv(n_real, tile_l)
    nrp = -(-n_r // 128) * 128  # lane-align the camera axis of the one-hot
    kernel = functools.partial(
        _kernel,
        n_real=n_real,
        n_r=n_r,
        nrp=nrp,
        dr_s=dr_s,
        dl=dl,
        k_len=k_len,
        tile_l=tile_l,
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (x, k_len, tile_l),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_len, tile_l), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (dl, tile_l, drp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((dl, grid * tile_l, drp), we_x.dtype),
        interpret=interpret,
    )(we_x, vc)[:, :n_real]
