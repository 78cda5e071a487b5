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


def _kernel_all_accum(jac_ref, g0_ref, d1_ref, d2_ref, vc_ref, w_in_ref,
                      h_ref, g_ref, w_ref, ab_ref, w_acc, ab_rows, **kw):
    """Accumulate variant: the W output block is ``w_in + contribution``
    (``w_in`` is the same full W buffer, input_output_aliased on TPU) —
    multi-bucket assemblies chain whole-bucket calls through the one
    buffer instead of staging per-chunk result slabs in scoped VMEM."""
    _kernel_all(jac_ref, g0_ref, d1_ref, d2_ref, vc_ref, h_ref, g_ref,
                w_ref, ab_ref, w_acc, ab_rows, w_in_ref=w_in_ref, **kw)


def _kernel_all(jac_ref, g0_ref, d1_ref, d2_ref, vc_ref, h_ref, g_ref, w_ref,
                ab_ref, w_acc, ab_rows, *, n_real, n_r, nrp, dr_s, dl, k_len,
                e_start, tile_l, npairs, w_in_ref=None):
    """Full-assembly variant: everything ``_kernel`` does PLUS the reduced
    (camera) side.  Per ``k`` the dr_s·(dr_s+1)/2 upper-triangle a_rr rows
    and the dr_s b_r rows are written into the ``ab_rows`` scratch and
    contracted against the hoisted one-hot in ONE MXU matmul
    ([ab_pad, TL] × [NRp, TL]ᵀ), accumulating [ab_pad, NRp] per-camera
    blocks across the whole grid — the camera-major Jacobian re-evaluation
    of ``_fast_dual_cam_leg`` (ops/schur.py) never happens.

    W accumulates in an f32 VMEM scratch and is downcast ONCE on the final
    write (same single-rounding semantics as the XLA path's
    ``astype(_w_dtype)``), so ``NLLSTPU_W_DTYPE=bf16`` costs one half-width
    HBM write instead of a full-width write plus a convert pass."""
    i = pl.program_id(0)
    n, s = jac_ref.shape[0], jac_ref.shape[1]
    dt = g0_ref.dtype
    l_ok = (
        i * tile_l + jax.lax.broadcasted_iota(jnp.int32, (1, tile_l), 1)
        < n_real
    )
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (nrp, tile_l), 0)
    r_rows = [r for r in range(s) if not (e_start <= r < e_start + dl)]
    ab_pad = ab_rows.shape[0]
    if ab_pad > npairs + dr_s:  # zero the pad rows once (hygiene)
        ab_rows[npairs + dr_s :, :] = jnp.zeros(
            (ab_pad - npairs - dr_s, tile_l), dt
        )

    h_rows = {}
    g_rows = {}
    w_acc[:] = jnp.zeros_like(w_acc)
    ab_acc = jnp.zeros((ab_pad, nrp), dt)
    for k in range(k_len):
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
        jr = [
            [jac_ref[ni, r, k : k + 1, :] for ni in range(n)] for r in r_rows
        ]
        g0e = [g0_ref[e_start + d, k : k + 1, :] for d in range(dl)]
        g0r = [g0_ref[r, k : k + 1, :] for r in r_rows]
        # h_ll / g_l rows (upper triangle mirrored on write-back).
        for e1 in range(dl):
            g_rows[e1] = g_rows.get(e1, dt.type(0)) + g0e[e1] * d1
            for e2 in range(e1, dl):
                jj = sum(je[ni][e1] * je[ni][e2] for ni in range(n))
                h_rows[(e1, e2)] = h_rows.get((e1, e2), dt.type(0)) + (
                    jj * d1 + d2 * g0e[e1] * g0e[e2]
                )
        # W coupling rows, placed against the hoisted one-hot.
        for p in range(dr_s):
            for d in range(dl):
                row = (
                    sum(jr[p][ni] * je[ni][d] for ni in range(n)) * d1
                    + d2 * g0r[p] * g0e[d]
                )  # [1, TL]
                sl = slice(p * nrp, (p + 1) * nrp)
                w_acc[d, sl, :] = w_acc[d, sl, :] + row * oh
        # Reduced-side rows → one MXU contraction over the landmark lanes.
        idx = 0
        for p in range(dr_s):
            for q in range(p, dr_s):
                ab_rows[idx : idx + 1, :] = (
                    sum(jr[p][ni] * jr[q][ni] for ni in range(n)) * d1
                    + d2 * g0r[p] * g0r[q]
                )
                idx += 1
        for p in range(dr_s):
            ab_rows[npairs + p : npairs + p + 1, :] = g0r[p] * d1
        ab_acc = ab_acc + jax.lax.dot_general(
            ab_rows[:], oh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dt.type,
            precision=jax.lax.Precision.HIGHEST,
        )
    for e1 in range(dl):
        g_ref[e1 : e1 + 1, :] = g_rows[e1]
        for e2 in range(e1, dl):
            h_ref[e1, e2 : e2 + 1, :] = h_rows[(e1, e2)]
            if e2 != e1:
                h_ref[e2, e1 : e1 + 1, :] = h_rows[(e1, e2)]
    if w_in_ref is None:
        w_ref[:] = w_acc[:].astype(w_ref.dtype)
    else:
        # Accumulate onto the existing W content (f32 math, one downcast:
        # for bf16 storage this is ONE rounding per bucket call).
        w_ref[:] = (w_in_ref[:].astype(dt) + w_acc[:]).astype(w_ref.dtype)

    @pl.when(i == 0)
    def _():
        ab_ref[:] = ab_acc

    @pl.when(i > 0)
    def _():
        ab_ref[:] = ab_ref[:] + ab_acc


def fused_obs_all_pm(jac_t, g0_t, d1m_t, d2m_t, vc, n_r: int, dr_s: int,
                     dl: int, e_start: int, w_dtype=None,
                     interpret: bool = False, tile_l: int = None):
    """Whole-system fused assembly: one kernel pass over the K-major
    obs-sorted Jacobian emits ``(h_ll [dl, dl, L], g_l [dl, L],
    w_pm [dl, dr_s*NRp, L] in ``w_dtype``, ab [npairs+dr_s, NRp])`` where
    ``ab`` rows 0..npairs-1 are the per-camera upper-triangle a_rr blocks
    (row ``idx(p, q)``) and rows npairs..npairs+dr_s-1 the b_r rows — the
    caller scatters them with the same unique row_base scatter the XLA
    camera leg uses.  Same input contract as :func:`fused_obs_leg_pm`."""
    n, s, k_len, n_real = jac_t.shape
    assert e_start + dl <= s
    assert s - dl == dr_s, (s, dl, dr_s)
    npairs = dr_s * (dr_s + 1) // 2
    ab_pad = -(-(npairs + dr_s) // 8) * 8
    # Caller may shrink the lane tile for long-run (large k_len) buckets so
    # the jac block still fits VMEM (see ops/schur._fused_tile_l).
    tile_l = TILE_L if tile_l is None else tile_l
    grid = pl.cdiv(n_real, tile_l)
    nrp = -(-n_r // 128) * 128
    pad = grid * tile_l - n_real
    if pad:
        jac_t = jnp.pad(jac_t, ((0, 0), (0, 0), (0, 0), (0, pad)))
        g0_t = jnp.pad(g0_t, ((0, 0), (0, 0), (0, pad)))
        d1m_t = jnp.pad(d1m_t, ((0, 0), (0, pad)))
        d2m_t = jnp.pad(d2m_t, ((0, 0), (0, pad)))
        vc = jnp.pad(vc, ((0, 0), (0, pad)), constant_values=n_r)
    base_dt = jac_t.dtype
    w_dt = base_dt if w_dtype is None else w_dtype
    kernel = functools.partial(
        _kernel_all,
        n_real=n_real,
        n_r=n_r,
        nrp=nrp,
        dr_s=dr_s,
        dl=dl,
        k_len=k_len,
        e_start=e_start,
        tile_l=tile_l,
        npairs=npairs,
    )
    h_ll, g_l, w_pm, ab = pl.pallas_call(
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
            pl.BlockSpec((ab_pad, nrp), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((dl, dl, grid * tile_l), base_dt),
            jax.ShapeDtypeStruct((dl, grid * tile_l), base_dt),
            jax.ShapeDtypeStruct((dl, dr_s * nrp, grid * tile_l), w_dt),
            jax.ShapeDtypeStruct((ab_pad, nrp), base_dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((dl, dr_s * nrp, tile_l), base_dt),
            pltpu.VMEM((ab_pad, tile_l), base_dt),
        ],
        interpret=interpret,
    )(jac_t, g0_t, d1m_t, d2m_t, vc)
    return (
        h_ll[:, :, :n_real],
        g_l[:, :n_real],
        w_pm[:, :, :n_real],
        ab[: npairs + dr_s],
    )


def fused_obs_all_pm_into(jac_t, g0_t, d1m_t, d2m_t, vc, w_full, l_base,
                          n_r: int, dr_s: int, dl: int, e_start: int,
                          interpret: bool = False, tile_l: int = None):
    """Whole-bucket accumulate variant of :func:`fused_obs_all_pm` for
    MULTI-BUCKET (skewed-degree) layouts: the kernel adds its W
    contribution directly into ``w_full`` (the full [dl, dr_s*NRp, L]
    buffer) at landmark base ``l_base``, and returns
    ``(h_add [dl, dl, lanes], g_add [dl, lanes], w_full', ab, la)`` where
    ``la = l_base - shift`` is the tile-aligned lane base of the h/g adds.

    Why: per-chunk one-grid-step calls (the round-4 scoped-VMEM
    workaround) cost ~67 kernel dispatches + an XLA read-modify-write of
    every W slab at bench-realistic shape — 5.94 ms of assemble
    (r4_queue17.log).  Here each bucket is ONE pipelined call whose W
    output is input_output_aliased onto ``w_full``: the only staged
    per-call IO is the (small) operand set, the result slab never exists,
    and the calls chain through the buffer — no optimization_barrier
    serialization needed.

    ``l_base`` need not be tile-aligned: operands are left-padded with
    ``shift = l_base % tile_l`` zero lanes (d1 = 0 ⇒ every contribution
    vanishes there; vc pads to the dustbin id), so boundary blocks
    add exact zeros outside the bucket.  Interpret mode (CPU tests)
    computes the same add through a non-aliased visited-range output +
    dynamic_update_slice (aliasing semantics for unvisited blocks are a
    TPU-backend contract)."""
    n, s, k_len, n_real = jac_t.shape
    assert e_start + dl <= s
    assert s - dl == dr_s, (s, dl, dr_s)
    npairs = dr_s * (dr_s + 1) // 2
    ab_pad = -(-(npairs + dr_s) // 8) * 8
    tile_l = TILE_L if tile_l is None else tile_l
    nrp = -(-n_r // 128) * 128
    wc = dr_s * nrp
    assert w_full.shape[:2] == (dl, wc), (w_full.shape, dl, wc)
    l_total = w_full.shape[2]
    blk0 = l_base // tile_l
    shift = l_base - blk0 * tile_l
    lanes = shift + n_real
    grid = pl.cdiv(lanes, tile_l)
    pad = grid * tile_l - lanes
    jac_t = jnp.pad(jac_t, ((0, 0), (0, 0), (0, 0), (shift, pad)))
    g0_t = jnp.pad(g0_t, ((0, 0), (0, 0), (shift, pad)))
    d1m_t = jnp.pad(d1m_t, ((0, 0), (shift, pad)))
    d2m_t = jnp.pad(d2m_t, ((0, 0), (shift, pad)))
    vc = jnp.pad(vc, ((0, 0), (shift, pad)), constant_values=n_r)
    base_dt = jac_t.dtype
    kern_kw = dict(
        n_real=lanes, n_r=n_r, nrp=nrp, dr_s=dr_s, dl=dl, k_len=k_len,
        e_start=e_start, tile_l=tile_l, npairs=npairs,
    )
    in_specs = [
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
        pl.BlockSpec((dl, wc, tile_l),
                     lambda i: (i * 0, i * 0, i + blk0),
                     memory_space=pltpu.VMEM),
    ]
    hg_specs = (
        pl.BlockSpec((dl, dl, tile_l), lambda i: (i * 0, i * 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dl, tile_l), lambda i: (i * 0, i),
                     memory_space=pltpu.VMEM),
    )
    ab_spec = pl.BlockSpec((ab_pad, nrp), lambda i: (i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    hg_shapes = (
        jax.ShapeDtypeStruct((dl, dl, grid * tile_l), base_dt),
        jax.ShapeDtypeStruct((dl, grid * tile_l), base_dt),
    )
    ab_shape = jax.ShapeDtypeStruct((ab_pad, nrp), base_dt)
    scratch = [
        pltpu.VMEM((dl, wc, tile_l), base_dt),
        pltpu.VMEM((ab_pad, tile_l), base_dt),
    ]
    kernel = functools.partial(_kernel_all_accum, **kern_kw)
    if not interpret:
        h_add, g_add, w_full, ab = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=(
                *hg_specs,
                pl.BlockSpec((dl, wc, tile_l),
                             lambda i: (i * 0, i * 0, i + blk0),
                             memory_space=pltpu.VMEM),
                ab_spec,
            ),
            out_shape=(
                *hg_shapes,
                jax.ShapeDtypeStruct(w_full.shape, w_full.dtype),
                ab_shape,
            ),
            scratch_shapes=scratch,
            input_output_aliases={5: 2},
            interpret=False,
        )(jac_t, g0_t, d1m_t, d2m_t, vc, w_full)
    else:
        h_add, g_add, w_vis, ab = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=(
                *hg_specs,
                pl.BlockSpec((dl, wc, tile_l),
                             lambda i: (i * 0, i * 0, i),
                             memory_space=pltpu.VMEM),
                ab_spec,
            ),
            out_shape=(
                *hg_shapes,
                jax.ShapeDtypeStruct((dl, wc, grid * tile_l), w_full.dtype),
                ab_shape,
            ),
            scratch_shapes=scratch,
            interpret=True,
        )(jac_t, g0_t, d1m_t, d2m_t, vc, w_full)
        upto = min(grid * tile_l, l_total - blk0 * tile_l)
        w_full = jax.lax.dynamic_update_slice(
            w_full, w_vis[:, :, :upto], (0, 0, blk0 * tile_l)
        )
    la = blk0 * tile_l
    upto = min(grid * tile_l, l_total - la)
    return (
        h_add[:, :, :upto],
        g_add[:, :upto],
        w_full,
        ab[: npairs + dr_s],
        la,
    )


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
