"""Pallas TPU kernel: direct placement of the Schur W coupling (p-major,
landmark-minor).

``place_w_pm(we3 [K, X, L], vc2 [K, L], n_r, dr_s, dl) ->
w_pm [dl, dr_s*NRp, L]`` computes the obs-major → camera-column placement

    w_pm[d, p*NRp + v, l] = sum_k we3[k, d*dr_s + p, l] * (vc2[k, l] == v)

with ``NRp = ceil(n_r/128)*128`` and any camera id ``>= n_r`` dropped
(dustbin).  This replaces the XLA one-hot fast path of the direct Schur
assembly (ops/schur.py ``_assemble_fast_dual``), which at bench scale
(105k obs, 128 cam, 8192 lmk) materializes in HBM: the [L·K, n_r] one-hot
operand (~54 MB), the [dl, L, n_r·dr_s] contraction result (~75 MB), and a
second W-sized add.  Here the one-hot never exists (the comparison happens
against an in-register iota), the per-landmark-tile accumulator lives in
VMEM, and W is written to HBM exactly once — kernel HBM traffic is one
read of ``we3`` (~8 MB) plus one write of W.

Why this layout (all constraints observed on-chip via the remote Mosaic):
- P-MAJOR columns (``p*NRp + v``): the standard interleave ``v*dr_s+p``
  needs a lane-remixing >2D reshape — "unsupported shape cast".  P-major
  accumulators land as contiguous 128-aligned blocks; the consumers absorb
  the permutation on the SMALL [Dr]/[Dr, Dr] operands through the static
  ``pm_of_std`` map (ops/schur.py ``SchurOps``).
- LANDMARKS ON LANES (last axis): per-``k`` operands are then [1, L-tile]
  sublane slices — dynamic LANE slicing ("vc_ref[:, pl.ds(k, 1)]") fails
  with "cannot statically prove that index in dimension 1 is a multiple of
  128", while dynamic/static SUBLANE offsets are legal.
- Index maps return ``i * 0`` instead of literal ``0``: under jax x64 a
  Python int traces to i64, and Mosaic cannot legalize the mixed
  (i64, i32, i64) index-map return.

Verified against a numpy reference in interpret mode (CPU tests) and by
scripts/pallas_probe.py on the chip; end-to-end use is A/B-gated via
``NLLSTPU_W_IMPL=pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Landmarks per grid program (lane-axis width of every block).
TILE_L = 256


def _kernel(we_ref, vc_ref, w_ref, *, n_r, nrp, dr_s, dl, k_len, tile_l):
    dt = we_ref.dtype
    # Camera ids on SUBLANES: ohT[v, l] = (vc[k, l] == v).
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (nrp, tile_l), 0)

    # K outer and fully unrolled (k_len is a small static run length), the
    # one-hot hoisted out of the column loop: the first kernel shape —
    # column-outer fori over k — recomputed the compare+select X·K times
    # instead of K and paid X·K tiny-loop trips; measured as slow as the
    # XLA one-hot chain it replaces (round-2 on-chip A/B).  Accumulation
    # goes straight into the VMEM output block (read-modify-write), so no
    # extra accumulator spill traffic.
    w_ref[:] = jnp.zeros_like(w_ref)
    for k in range(k_len):
        vc_k = vc_ref[k : k + 1, :]  # [1, TL]
        oh = jnp.where(
            jnp.logical_and(vc_k == v_iota, vc_k < n_r),
            dt.type(1),
            dt.type(0),
        )  # [NRp, TL]
        for c in range(dr_s * dl):  # X is tiny (<= dl*dr_s ~ 18)
            d, p = divmod(c, dr_s)
            sl = slice(p * nrp, (p + 1) * nrp)
            w_ref[d, sl, :] = w_ref[d, sl, :] + we_ref[k : k + 1, c, :] * oh


def place_w_pm(we3, vc2, n_r: int, dr_s: int, dl: int,
               interpret: bool = False):
    """See module docstring.  ``we3`` [K, X=dl·dr_s, L] with row
    ``d*dr_s + p`` (any float dtype), ``vc2`` [K, L] int32.  Returns the
    p-major landmark-minor coupling ``w_pm [dl, dr_s*NRp, L]`` in
    ``we3.dtype``."""
    k_len, x, n_real = we3.shape
    assert x == dr_s * dl, (x, dr_s, dl)
    assert vc2.shape == (k_len, n_real), (vc2.shape, we3.shape)
    nrp = -(-n_r // 128) * 128
    tile_l = TILE_L
    grid = pl.cdiv(n_real, tile_l)
    pad = grid * tile_l - n_real
    if pad:
        we3 = jnp.pad(we3, ((0, 0), (0, 0), (0, pad)))
        # Padded landmarks point at the dustbin: zero one-hot columns.
        vc2 = jnp.pad(vc2, ((0, 0), (0, pad)), constant_values=n_r)
    kernel = functools.partial(
        _kernel, n_r=n_r, nrp=nrp, dr_s=dr_s, dl=dl, k_len=k_len,
        tile_l=tile_l,
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k_len, x, tile_l), lambda i: (i * 0, i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_len, tile_l), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (dl, dr_s * nrp, tile_l), lambda i: (i * 0, i * 0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((dl, dr_s * nrp, grid * tile_l),
                                       we3.dtype),
        interpret=interpret,
    )(we3, vc2)
    return out[:, :, :n_real]
