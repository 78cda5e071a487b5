"""Schur-complement (marginalized) linear system: batched landmark
elimination + dense reduced solve.

Reference parity: the reference only *reorders* costs for Schur and solves
the full system with sparse LDLᵀ (``reordercostsforschur!``,
src/problem.jl:177-199; ``formarginalization`` in src/linearsystem.jl:91-124
— SURVEY.md §3.5 notes there is no marginalizing solver in the snapshot).
Sparse direct factorization is a poor fit for the MXU, so this module is the
TPU-native replacement (SURVEY.md §2 native table, §7 step 6): eliminate the
designated variable family (the "landmarks") with batched small-block
inverses, form the reduced ("camera") system with one big MXU contraction,
dense-Cholesky it, and back-substitute — all inside jit.

Block structure, with r = reduced tangent dims and l = eliminated dims:

    [A_rr  W ] [x_r]   [b_r]          S x_r = b_r − W H_ll⁻¹ g_l
    [Wᵀ  H_ll] [x_l] = [g_l]   →      S = A_rr − W H_ll⁻¹ Wᵀ
                                       x_l = H_ll⁻¹ (g_l − Wᵀ x_r)

H_ll is block diagonal, stored components-major ``[dl, dl, L]``; the
gradient ``g_l`` is ``[dl, L]``; W is dense components-major ``[dl, L, Dr]``.
The tiny dl axes must NOT be trailing dimensions — TPU tiles pad the last
two dims to (8,128), a ~390x memory inflation for an [L,3,3] block array
(profiled at ~74MB of HBM traffic for the one fused inverse kernel at bench
scale; the cm layout pads ~2.7x only).  The S contraction is a single
[Dr, dl·L] × [dl·L, Dr] matmul that XLA maps straight onto the MXU.  The
flat step vector ``x`` keeps the reference's variable-major order
(landmark-major, dof-minor) so ``apply_step`` and the iterators are
layout-agnostic; the solve transposes its [dl, L] eliminated step once at
the boundary.  Requirement inherited from the reference
(src/problem.jl:185): each cost touches at most one eliminated variable.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Any

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from ..core import engine
from ..core.linearsolver import (
    batched_inv_spd,
    batched_inv_spd_cm,
    cholesky_solve,
)
from ..core.problem import family_name


@dataclasses.dataclass(frozen=True)
class SchurOps:
    """Linear-system ops over ``sys = (a_rr, b_r, h_ll, g_l, w)`` implementing
    the same protocol as :class:`nllstpu.core.iterators.DenseOps`."""

    dim_reduced: int
    num_elim: int
    dof_elim: int
    #: None, or the static pm_of_std index map [Dr] when W is stored in
    #: the p-major column layout (SchurInfo.w_pm): reduced-space vectors
    #: scatter through it before touching W, and W-basis results gather
    #: back — always on the SMALL [Dr]/[Dr, Dr] operands, never on W.
    pm: Any = None

    @property
    def dim(self):
        return self.dim_reduced + self.num_elim * self.dof_elim

    def _to_w_basis(self, vec, w_cols):
        """Scatter a [Dr] reduced vector into W's column basis (identity
        for the standard layout)."""
        if self.pm is None:
            return vec
        return (
            jnp.zeros(w_cols, dtype=vec.dtype)
            .at[jnp.asarray(self.pm)]
            .set(vec)
        )

    def _from_w_basis(self, s_w, rhs_w):
        """Gather the reduced system back from W's column basis."""
        if self.pm is None:
            return s_w, rhs_w
        idx = jnp.asarray(self.pm)
        return s_w[idx][:, idx], rhs_w[idx]

    def grad(self, sys):
        _, b_r, _, g_l, _ = sys
        return jnp.concatenate([b_r, g_l.T.reshape(-1)])

    def diag_max(self, sys):
        a_rr, _, h_ll, _, _ = sys
        # initial= handles an empty reduced block (every reduced variable
        # fixed — e.g. landmark-only polish with solver="schur").
        m_r = jnp.max(jnp.abs(jnp.diagonal(a_rr)), initial=0.0)
        m_l = jnp.max(jnp.abs(jnp.diagonal(h_ll, axis1=0, axis2=1)), initial=0.0)
        return jnp.maximum(m_r, m_l)

    def quad(self, sys, x):
        a_rr, _, h_ll, _, w = sys
        xr = x[: self.dim_reduced]
        xl = x[self.dim_reduced :].reshape(self.num_elim, self.dof_elim)
        if self.pm is not None:
            # P-major W is landmark-minor: [dl, wc, L].
            cross = jnp.einsum(
                "drl,r,ld->", w, self._to_w_basis(xr, w.shape[1]), xl
            )
        else:
            cross = jnp.einsum("dlr,r,ld->", w, xr, xl)
        return (
            xr @ (a_rr @ xr)
            + 2.0 * cross
            + jnp.einsum("ld,del,le->", xl, h_ll, xl)
        )

    def solve(self, sys, lam):
        return self._solve(sys, lam, want_gquad=False)[0]

    def solve0_quad_grad(self, sys):
        """Undamped Newton solve H·x = g fused with the gradient curvature
        gᵀHg — dogleg needs both every outer iteration (the reference does
        them as separate solve!/fast_bAb passes, src/iterators.jl:47-57).
        Fusing lets the quad's cross term Wᵀb_r ride the back-substitution's
        W pass as a second stacked column instead of streaming the dense W
        coupling a second time."""
        zero = jnp.zeros((), dtype=sys[0].dtype)
        return self._solve(sys, zero, want_gquad=True)

    def _solve(self, sys, lam, want_gquad):
        a_rr, b_r, h_ll, g_l, w = sys
        dl = self.dof_elim
        eye_l = jnp.eye(dl, dtype=h_ll.dtype)
        eye_r = jnp.eye(self.dim_reduced, dtype=a_rr.dtype)
        h_damped = h_ll + lam * eye_l[:, :, None]
        a_damped = a_rr + lam * eye_r
        impl = _solve_impl()
        pm = self.pm is not None
        w_cols = w.shape[1] if pm else w.shape[-1]
        damped_ok = (
            pm and dl <= 3 and h_ll.dtype == jnp.float32
            and self.num_elim > 0 and self.dim_reduced > 0
        )
        narrow_fit = False
        if damped_ok:
            # Narrow reduced spaces use the register-accumulator body;
            # wide ones (wc past ~700, e.g. Snavely 9-dof at >=128 camera
            # slots) the column-panelized body that keeps the full S only
            # in the VMEM-resident output ref (VERDICT r4 weak #2; the
            # register body overflowed scoped VMEM at wc=1152,
            # r4_queue15c.log leg 6).  reduce_s_lm_damped picks the body.
            from .pallas.schur_reduce import damped_solve_fits, damped_tile_l

            narrow_fit = damped_tile_l(dl, w.shape[1]) is not None
            damped_ok = damped_solve_fits(dl, w.shape[1])
        del narrow_fit  # both kernel bodies are auto-admitted; see below
        if impl == "auto":
            # Auto: the damped kernel wherever a body fits — the NARROW
            # register body won its phase A/B (+4.1%,
            # ab_ecb22c4_vs_a09c5e1) and the wide PANEL body wins END TO
            # END despite losing the isolated ops.solve microbench
            # (3.52 vs 2.99 ms): bench-realistic ran 130.6 it/s with the
            # kernel vs 90.1 on the XLA chain and Ladybug 157.9 vs 124.5
            # (r5_queue4 vs r5_queue6 legs 1-2).  The microbench's fori
            # loop pipelines successive XLA-chain solves in ways the real
            # LM loop cannot, and the XLA path re-pays the standalone
            # batched inverse (~0.6 ms of per-op overhead, r4_queue14)
            # per damping attempt — trust the end-to-end A/B.
            impl = (
                "pallas"
                if damped_ok and jax.default_backend() == "tpu"
                else "xla"
            )
        h_inv = None
        if (
            impl in ("pallas", "pallas_interpret")
            and self.num_elim > 0
            and self.dim_reduced > 0
        ):
            # Fused reduction kernel: W streamed from HBM exactly once, y
            # formed in VMEM registers (see ops/pallas/schur_reduce.py).
            from .pallas.schur_reduce import (
                reduce_s, reduce_s_lm, reduce_s_lm_damped,
            )

            interp = impl == "pallas_interpret"
            if damped_ok:
                # Damped variant: the per-attempt (h_ll + λI)⁻¹ is formed
                # in-kernel (the standalone XLA inverse costs ~0.6 ms of
                # per-op overhead at bench scale) and returned for the
                # back-substitution below.
                s_sum, rhs_sum, h_inv = reduce_s_lm_damped(
                    w, h_ll, g_l, lam, interpret=interp
                )
            else:
                h_inv = batched_inv_spd_cm(h_damped)
                red = reduce_s_lm if pm else reduce_s
                s_sum, rhs_sum = red(w, h_inv, g_l, interpret=interp)
        else:
            # Batched landmark-block inverses (closed-form for d<=3).
            h_inv = batched_inv_spd_cm(h_damped)
            # y = W·H⁻¹, never materialized wider than one W (h_inv
            # symmetric).  The reduced (Schur) system is one MXU
            # contraction over dl·L.  For f32 problems run it at HIGH
            # (bf16x3) precision: ~1e-6 relative error — far below LM's
            # f32 convergence floor — for a 2-3x faster matmul.  f64
            # problems keep full precision for the reference's 1e-15
            # targets.
            prec = "highest" if a_rr.dtype == jnp.float64 else "high"
            if pm:  # landmark-minor W [dl, wc, L]
                y = jnp.einsum("drl,del->erl", w, h_inv)
                s_sum = jnp.einsum("erl,esl->rs", y, w, precision=prec)
                rhs_sum = jnp.einsum("erl,el->r", y, g_l)
            else:  # components-major W [dl, L, Dr]
                y = jnp.einsum("dlr,del->elr", w, h_inv)
                s_sum = jnp.einsum("elr,els->rs", y, w, precision=prec)
                rhs_sum = jnp.einsum("elr,el->r", y, g_l)
        s_sum, rhs_sum = self._from_w_basis(s_sum, rhs_sum)
        s = a_damped - s_sum
        rhs = b_r - rhs_sum
        xr = cholesky_solve(s, rhs)
        xr_w = self._to_w_basis(xr, w_cols)
        if not want_gquad:
            # Back-substitution; transpose to landmark-major at the boundary.
            wx = (
                jnp.einsum("drl,r->dl", w, xr_w)
                if pm
                else jnp.einsum("dlr,r->dl", w, xr_w)
            )
            xl = jnp.einsum("del,el->dl", h_inv, g_l - wx)
            return jnp.concatenate([xr, xl.T.reshape(-1)]), None
        # Wᵀ·[x_r | b_r] in ONE W pass: column 0 feeds the back-substitution,
        # column 1 is the quad cross term.
        stacked = jnp.stack([xr_w, self._to_w_basis(b_r, w_cols)], axis=1)
        wt = (
            jnp.einsum("drl,rk->kdl", w, stacked)
            if pm
            else jnp.einsum("dlr,rk->kdl", w, stacked)
        )
        xl = jnp.einsum("del,el->dl", h_inv, g_l - wt[0])
        ghg = (
            b_r @ (a_rr @ b_r)
            + 2.0 * jnp.sum(wt[1] * g_l)
            + jnp.einsum("dl,del,el->", g_l, h_ll, g_l)
        )
        return jnp.concatenate([xr, xl.T.reshape(-1)]), ghg


class WPart(NamedTuple):
    """Per-batch coupling data for the implicit (matrix-free) Schur solve.
    A NamedTuple so it rides through jit as a pytree; optional fields are
    None when the corresponding fast-path table is unavailable.

    The two observation tables turn the CG matvec's landmark- and
    camera-keyed reductions into gathers + dense sums: XLA scatter-add
    SERIALIZES on duplicate indices (profiling showed them dominating the
    implicit solve on TPU), while a ``[keys, K]`` table gather with a
    fill-value for padding is one vectorized load + sum."""

    w_blk: Any  # [B, Sr, dl] per-cost coupling blocks
    rows_r: Any  # [B, Sr] global reduced row per block column
    lid: Any  # [B] eliminated-variable id (dustbin L when masked/fixed)
    starts: Optional[Any]  # [L+1] run offsets when sorted by lid (pallas)
    rvid: Optional[Any]  # [B] reduced-variable id within its family
    obs: Optional[Any]  # [L, K] cost ids per landmark (pad = out-of-range)
    cam_obs: Optional[Any]  # [n_r, Kc] cost ids per reduced var
    row_base: Optional[Any]  # [n_r] first reduced row per var (fixed → dr)


@dataclasses.dataclass(frozen=True)
class SchurCGOps:
    """Implicit (iterative) Schur: the reduced system S = A_rr − W·H_ll⁻¹·Wᵀ
    is never materialized — its matvec streams through the per-cost W blocks
    (gather → block multiply → landmark segment-sum → back) and the reduced
    solve is PCG with a block-Jacobi preconditioner over A_rr's diagonal.
    This removes the O(L·Dr·dl) dense-W memory of :class:`SchurOps`, making
    Venice/Final-scale BAL feasible on one chip (Ceres ITERATIVE_SCHUR
    analogue).

    ``sys = (a_rr, b_r, h_ll, g_l, wparts)`` with ``wparts`` a tuple of
    per-batch ``(w_blk [B,Sr,dl], rows_r [B,Sr], lid [B], starts, rvid)``
    where ``starts`` is the [L+1] run-offset table when the batch rows are
    sorted by landmark id (None otherwise) and ``rvid`` is the per-cost
    reduced-variable id within its family (None when unavailable).

    The PCG preconditioner is **Schur-Jacobi** (the Ceres ``SCHUR_JACOBI``
    analogue): the exact diagonal blocks of S = A_rr − W·H_ll⁻¹·Wᵀ, i.e.
    A_rr's diagonal blocks minus the per-camera Σ_c w_c H_ll⁻¹ w_cᵀ
    correction, reduced over costs with a one-hot MXU matmul.  Batches
    without ``rvid`` (or reduced families untouched by coupling costs) fall
    back to the A_rr-only block-Jacobi blocks.

    ``segment_impl`` selects the landmark reduction in ``Wᵀv``:
    "scatter" (XLA scatter-add), or "pallas"/"pallas_interpret" (the
    sorted-run DMA kernel from ops.pallas — skew-insensitive; requires
    sorted wparts)."""

    dim_reduced: int
    num_elim: int
    dof_elim: int
    pad: int
    # Reduced-family layout for the preconditioner: (name, offsets [n], dof).
    fam_offsets: tuple
    # Per-wpart index into fam_offsets of the single reduced slot's family
    # (None disables the Schur-Jacobi correction for that wpart).
    wpart_fam: tuple = ()
    # Relative PCG residual tolerance; None = dtype default (1e-12 for f64,
    # 1e-5 for f32 — an f64 tolerance is unreachable in f32 and forces every
    # solve to burn max_iters; LM's acceptance test tolerates inexact steps).
    tol: Optional[float] = None
    max_iters: int = 500
    segment_impl: str = "scatter"
    # Per-wpart obs-major run length (see obs_major_repack): the CG
    # matvec's landmark reductions become contiguous reshape + minor-axis
    # sums and the ``W u`` expansion a broadcast — no gathers in the CG
    # loop.  None entries use the obs-table / scatter paths.  UNIFORM runs
    # only — the cluster-Jacobi layout requires it; run structure proper
    # lives in ``wpart_buckets``.
    wpart_obs_k: tuple = ()
    # Per-wpart obs-major run buckets (((l_base, L_b, k_b, col_base), ...)
    # or None): marks a components-major [Sr, dl, B] w_blk whose landmark
    # reductions are bucketed reshape-sums (uniform batches are one
    # bucket; skewed real-BAL layouts several).
    wpart_buckets: tuple = ()
    # Cluster-Jacobi preconditioner (Ceres CLUSTER_JACOBI analogue): group
    # this many consecutive reduced variables per cluster and precondition
    # with the exact [cdim, cdim] diagonal CLUSTER blocks of S — capturing
    # the camera-camera coupling that per-camera Schur-Jacobi ignores, at
    # the price of one W-sized contraction per cluster per solve.  0 = off
    # (per-variable Schur-Jacobi).  Requires a single reduced family with
    # contiguous offsets and an obs-major coupling batch; silently falls
    # back otherwise.
    cluster_size: int = 0
    # Fixed-trip-count CG: run exactly this many iterations as a
    # ``lax.fori_loop`` with masked (frozen-on-convergence) updates instead
    # of a data-dependent ``while_loop``.  Removes one level of nested
    # dynamic control flow — the mitigation for the TPU-worker fault
    # observed in LARGE implicit programs (docs/ROUND1.md), at the price of
    # always burning the full iteration budget.  None = dynamic while loop.
    fixed_iters: Optional[int] = None
    # Chunked CG: a ``while_loop`` over ``fori_loop`` blocks of this many
    # iterations — converged solves stop at chunk granularity (frozen
    # updates keep over-running within a chunk exact) instead of burning
    # ``fixed_iters`` every solve, while the INNERMOST loop stays a fori
    # (the worker-fault trigger was a data-dependent innermost while_loop,
    # docs/ROUND1.md).  Takes precedence over ``fixed_iters``; bounded by
    # ``max_iters``.  None/0 = off.
    chunk_iters: Optional[int] = None

    def _tol(self, dtype):
        if self.tol is not None:
            return self.tol
        return 1e-5 if jnp.dtype(dtype).itemsize <= 4 else 1e-12

    # -- distribution hooks -------------------------------------------------
    # The landmark-sharded multi-device variant
    # (nllstpu.parallel.schur_shard.ShardedSchurCGOps) overrides these: the
    # W-coupling terms and preconditioner corrections become psums over the
    # mesh, eliminated-block damping gains pad-slot regularization, and the
    # final landmark step is gathered.  Single-device defaults are no-ops.

    def _reduce(self, x):
        """Cross-device sum of a landmark-reduced coupling term."""
        return x

    def _h_damp_extra(self, dtype):
        """Extra [*, dl, dl] damping added to H_ll before inversion."""
        return jnp.zeros((), dtype=dtype)

    def _finalize(self, xr, xl):
        """Assemble the full step from reduced + (local) eliminated parts;
        ``xl`` arrives components-major [dl, L] and is transposed to the
        flat landmark-major order once, at this boundary."""
        return jnp.concatenate([xr, xl.T.reshape(-1)])

    @property
    def dim(self):
        return self.dim_reduced + self.num_elim * self.dof_elim

    def grad(self, sys):
        _, b_r, _, g_l, _ = sys
        return jnp.concatenate([b_r, g_l.T.reshape(-1)])

    def diag_max(self, sys):
        a_rr, _, h_ll, _, _ = sys
        m_r = jnp.max(jnp.abs(jnp.diagonal(a_rr)), initial=0.0)
        m_l = jnp.max(jnp.abs(jnp.diagonal(h_ll, axis1=0, axis2=1)), initial=0.0)
        return jnp.maximum(m_r, m_l)

    def _wt_apply(self, wparts, v):
        """u[:, l] = Σ_{costs i of l} w_iᵀ v[rows_i]  →  cm [dl, L].

        Landmark reduction preference: pallas sorted-run kernel (opt-in) >
        observation-table gather + dense sum > scatter-add fallback."""
        u = jnp.zeros((self.dof_elim, self.num_elim + 1), dtype=v.dtype)
        vp = jnp.concatenate([v, jnp.zeros(self.pad + 1, dtype=v.dtype)])
        for i, wp in enumerate(wparts):
            bks = (
                self.wpart_buckets[i] if i < len(self.wpart_buckets) else None
            )
            if bks is not None:
                # Obs-major run buckets: landmark l of bucket (l0, L_b, K_b,
                # c0) owns columns c0 + (l−l0)·K_b + j.  Masked/dustbin
                # columns contribute zero (their rvid one-hot column is
                # all-zero); extras (fixed-landmark costs, beyond the
                # buckets) have no W rows at all.  w_blk is stored
                # components-major [Sr, dl, B] for obs-major wparts, and
                # EVERY intermediate stays [.., B] (B-minor): the previous
                # [B, Sr] gather lane-padded Sr=9 to 128 — a 14x memory
                # inflation that made the CG matvec 4.4 ms at the Ladybug
                # shape (bench_logs/r5_queue3.log leg 5), ~30x off its
                # traffic roofline.  The per-cost expansion of v is a
                # one-hot MXU matmul against the tiny per-camera table
                # (vp[rows_r] was a lane-axis gather — the slow axis).
                if wp.row_base is not None and wp.rvid is not None:
                    sr = wp.w_blk.shape[0]
                    n_r = wp.row_base.shape[0]
                    cam_idx = (
                        wp.row_base[:, None]
                        + jnp.arange(sr, dtype=jnp.int32)[None, :]
                    )
                    v_cam = vp[cam_idx]  # [n_r, Sr] — tiny
                    bsz = wp.rvid.shape[0]
                    vg = None
                    for start, width in _onehot_chunks(
                        n_r, _FAST_MAX_ONEHOT, bsz
                    ):
                        oh = (
                            (start + jnp.arange(width, dtype=jnp.int32))[
                                :, None
                            ]
                            == wp.rvid[None, :]
                        ).astype(v.dtype)  # [width, B]
                        part = jnp.einsum(
                            "vb,vs->sb", oh, v_cam[start : start + width],
                            precision="highest",
                        )
                        vg = part if vg is None else vg + part
                else:
                    vg = vp[wp.rows_r.T]  # [Sr, B]
                q = jnp.einsum("sdb,sb->db", wp.w_blk, vg)  # cm [dl, B]
                for (l0, lb, kb, c0) in bks:
                    u = u.at[:, l0 : l0 + lb].add(
                        q[:, c0 : c0 + lb * kb].reshape(-1, lb, kb).sum(-1)
                    )
                continue
            vg = vp[wp.rows_r]  # [B, Sr]
            if wp.starts is not None and self.segment_impl.startswith("pallas"):
                from .pallas.segment_sum import CHUNK, segment_block_sum

                q = jnp.einsum("bsd,bs->bd", wp.w_blk, vg)  # [B, dl]
                q_pad = jnp.concatenate(
                    [q, jnp.zeros((CHUNK, self.dof_elim), dtype=q.dtype)]
                )
                u_part = segment_block_sum(
                    q_pad,
                    wp.starts,
                    interpret=(self.segment_impl == "pallas_interpret"),
                )
                u = u.at[:, : self.num_elim].add(u_part.T)
                continue
            q = jnp.einsum("bsd,bs->db", wp.w_blk, vg)  # cm [dl, B]
            if wp.obs is not None:
                L, k = wp.obs.shape
                # Chunk the [dl, L·k] gather transient over landmarks
                # (same Venice-scale bound as the camera tables).
                qrows = max(
                    1, _FAST_MAX_ONEHOT // max(k * q.shape[0], 1)
                )
                for l0 in range(0, L, qrows):
                    tbl = wp.obs[l0 : l0 + qrows]
                    flat = jnp.take(
                        q, tbl.reshape(-1), axis=-1, mode="fill",
                        fill_value=0,
                    )
                    u = u.at[:, l0 : l0 + tbl.shape[0]].add(
                        flat.reshape(-1, tbl.shape[0], k).sum(axis=-1)
                    )
            else:
                u = u.at[:, wp.lid].add(q)
        return u[:, : self.num_elim]

    def _w_apply(self, wparts, u):
        """y = Σ_i w_i u[:, l_i] scattered at rows_i  →  [Dr]; ``u`` is
        components-major [dl, L].

        With a camera table the per-cost contributions are gathered per
        reduced variable and land with a UNIQUE-row scatter; otherwise a
        duplicate-index scatter-add."""
        up = jnp.concatenate(
            [u, jnp.zeros((self.dof_elim, 1), dtype=u.dtype)], axis=-1
        )
        y = jnp.zeros(self.dim_reduced + self.pad + 1, dtype=u.dtype)
        for i, wp in enumerate(wparts):
            bks = (
                self.wpart_buckets[i] if i < len(self.wpart_buckets) else None
            )
            if bks is not None:
                # Obs-major: the gather u[:, lid] is a broadcast over the
                # run slots of each bucket; masked columns (and the extras
                # region beyond the buckets) are zeroed via the lid dustbin
                # mask.  w_blk is components-major [Sr, dl, B] here.
                L = self.num_elim
                b_tot = wp.lid.shape[0]
                parts, pos = [], 0
                for (l0, lb, kb, c0) in bks:
                    if c0 > pos:
                        parts.append(
                            jnp.zeros((u.shape[0], c0 - pos), dtype=u.dtype)
                        )
                    parts.append(
                        jnp.broadcast_to(
                            u[:, l0 : l0 + lb, None],
                            (u.shape[0], lb, kb),
                        ).reshape(u.shape[0], lb * kb)
                    )
                    pos = c0 + lb * kb
                ug = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
                ug = jnp.pad(ug, ((0, 0), (0, b_tot - pos)))
                ug = ug * (wp.lid < L)[None, :]
                # B-minor throughout (see _wt_apply): the camera-keyed
                # reduction rides the chunked one-hot MXU over rvid (the
                # direct path's _onehot_reduced_tail pattern) instead of a
                # padded-tile gather over [B, Sr].
                t = jnp.einsum("sdb,db->sb", wp.w_blk, ug)  # [Sr, B]
                if wp.rvid is not None and wp.row_base is not None:
                    sr = t.shape[0]
                    n_r = wp.row_base.shape[0]
                    for start, width in _onehot_chunks(
                        n_r, _FAST_MAX_ONEHOT, t.shape[1]
                    ):
                        oh = (
                            (start + jnp.arange(width, dtype=jnp.int32))[
                                :, None
                            ]
                            == wp.rvid[None, :]
                        ).astype(t.dtype)  # dustbin rvid → all-zero column
                        g = jnp.einsum(
                            "vb,sb->vs", oh, t, precision="highest"
                        )
                        idx = (
                            wp.row_base[start : start + width, None]
                            + jnp.arange(sr, dtype=jnp.int32)[None, :]
                        )
                        y = y.at[idx].add(g)
                else:
                    y = y.at[wp.rows_r].add(t.T)
                continue
            ug = up[:, wp.lid]  # cm [dl, B]
            t = jnp.einsum("bsd,db->bs", wp.w_blk, ug)  # [B, Sr]
            if wp.cam_obs is not None and wp.row_base is not None:
                n_r, kc = wp.cam_obs.shape
                sr = t.shape[1]
                # Chunk the [n_r, kc, sr] gather transient over kc: at
                # Venice scale a skew-hot camera gives kc ≈ 5.8k per shard
                # and the unchunked transient was a 33 GB/device (267 GB
                # global) allocation (bench_logs/r5_venice.log, first
                # attempt).  Work is unchanged; only the transient is
                # bounded.
                q = max(1, _FAST_MAX_ONEHOT // max(n_r * sr, 1))
                g = jnp.zeros((n_r, sr), dtype=t.dtype)
                for s0 in range(0, kc, q):
                    cols = wp.cam_obs[:, s0 : s0 + q]
                    g = g + jnp.take(
                        t, cols.reshape(-1), axis=0, mode="fill",
                        fill_value=0,
                    ).reshape(n_r, cols.shape[1], sr).sum(axis=1)
                idx = (
                    wp.row_base[:, None]
                    + jnp.arange(sr, dtype=jnp.int32)[None, :]
                )
                y = y.at[idx].add(g)
            else:
                y = y.at[wp.rows_r].add(t)
        return y[: self.dim_reduced]

    def quad(self, sys, x):
        a_rr, _, h_ll, _, wparts = sys
        xr = x[: self.dim_reduced]
        xl = x[self.dim_reduced :].reshape(self.num_elim, self.dof_elim)
        cross = xr @ self._w_apply(wparts, xl.T)
        return (
            xr @ (a_rr @ xr)
            + 2.0 * cross
            + jnp.einsum("ld,del,le->", xl, h_ll, xl)
        )

    def precond_blocks(self, sys, lam, h_inv):
        """Per-family damped S diagonal blocks (Schur-Jacobi) — exact
        ``S[v,v] = (A_rr + λI)[v,v] − Σ_c w_c H⁻¹ w_cᵀ`` where coupling data
        is available, A_rr-only (block-Jacobi) otherwise.  Returns
        ``(blocks, corrected)``: a list of ``[n, dof, dof]`` aligned with
        ``fam_offsets`` and per-family flags marking which received the
        Schur correction."""
        a_rr, _, _, _, wparts = sys
        dtype = a_rr.dtype
        dl = self.dof_elim

        # Start from A_rr's diagonal blocks, then subtract the per-variable
        # correction Σ_c w_c H⁻¹ w_cᵀ, reduced over costs with a chunked
        # one-hot MXU matmul keyed by the reduced-variable id
        # (duplicate-index scatters serialize on TPU).
        a_pad = jnp.pad(a_rr, ((0, 1), (0, 1)))
        fam_blocks = []
        for name, offs, dof in self.fam_offsets:
            idx = offs[:, None] + np.arange(dof, dtype=np.int32)[None, :]
            idx = np.minimum(idx, self.dim_reduced)  # dustbin-safe
            fam_blocks.append(
                a_pad[idx[:, :, None], idx[:, None, :]]
                + lam * jnp.eye(dof, dtype=dtype)
            )
        h_inv_p = jnp.pad(h_inv, ((0, 0), (0, 0), (0, 1)))
        corrected = [False] * len(fam_blocks)
        for i, wp in enumerate(wparts):
            fi = self.wpart_fam[i] if i < len(self.wpart_fam) else None
            if fi is None or wp.rvid is None:
                continue
            name, offs, dof = self.fam_offsets[fi]
            cm_blk = (
                i < len(self.wpart_buckets)
                and self.wpart_buckets[i] is not None
            )
            # w_blk layout: cm [Sr, dl, B] for obs-major wparts, batch-major
            # [B, Sr, dl] otherwise.
            b_axis, s_axis = (-1, 0) if cm_blk else (0, 1)
            if (
                wp.w_blk.shape[s_axis] != dof
                or wp.rvid.shape[0] != wp.w_blk.shape[b_axis]
            ):
                continue  # per-shard repads: shapes no longer line up
            # cm [dl, dl, B]; masked costs hit the zero pad column.
            hi = h_inv_p[:, :, wp.lid]
            if cm_blk:
                m = jnp.einsum("pdb,deb,qeb->bpq", wp.w_blk, hi, wp.w_blk)
            else:
                m = jnp.einsum("bpd,deb,bqe->bpq", wp.w_blk, hi, wp.w_blk)
            n_r = offs.shape[0]
            mf = m.reshape(m.shape[0], dof * dof)
            if wp.cam_obs is not None:
                # Camera-table gather: O(B) work, no one-hot transient.
                # Chunked over kc — same Venice-scale transient bound as
                # _w_apply (the unchunked [n_r, kc, dof²] staging was a
                # 33 GB/device allocation at 54M obs).
                kc = wp.cam_obs.shape[1]
                q = max(1, _FAST_MAX_ONEHOT // max(n_r * dof * dof, 1))
                corr = jnp.zeros((n_r, dof * dof), dtype=mf.dtype)
                for s0 in range(0, kc, q):
                    cols = wp.cam_obs[:, s0 : s0 + q]
                    corr = corr + jnp.take(
                        mf, cols.reshape(-1), axis=0, mode="fill",
                        fill_value=0,
                    ).reshape(n_r, cols.shape[1], dof * dof).sum(axis=1)
            else:
                parts = []
                for start, width in _onehot_chunks(
                    n_r, _FAST_MAX_ONEHOT, mf.shape[0]
                ):
                    oh = (
                        wp.rvid[:, None]
                        == (start + jnp.arange(width, dtype=jnp.int32))[None, :]
                    ).astype(dtype)  # dustbin (fixed/masked) rows are all-zero
                    parts.append(jnp.einsum("bv,bk->vk", oh, mf))
                corr = jnp.concatenate(parts, axis=0)
            corr = self._reduce(corr)  # sum per-device partials when sharded
            fam_blocks[fi] = fam_blocks[fi] - corr.reshape(n_r, dof, dof)
            corrected[fi] = True
        return fam_blocks, corrected

    def _cluster_layout(self):
        """Static qualification for the cluster-Jacobi preconditioner:
        (n_clusters, m, dof, cdim, n_r) or None."""
        if self.cluster_size <= 0 or len(self.fam_offsets) != 1:
            return None
        if len(self.wpart_obs_k) != 1 or self.wpart_obs_k[0] is None:
            return None
        name, offs, dof = self.fam_offsets[0]
        offs = np.asarray(offs)
        n_r = offs.shape[0]
        if n_r == 0 or not np.array_equal(
            offs, np.arange(n_r, dtype=offs.dtype) * dof
        ):
            return None  # fixed/reordered cameras: fall back
        m = int(self.cluster_size)
        n_cl = -(-n_r // m)
        if n_cl > 64:
            return None  # unrolled build would bloat the program
        return n_cl, m, dof, m * dof, n_r

    def cluster_inverses(self, sys, lam, h_inv, layout):
        """Inverted [n_cl, cdim, cdim] diagonal cluster blocks of the damped
        reduced matrix S(λ) — exact, including the cross-camera coupling
        within each cluster: S_CC = (A_rr + λI)_CC − Σ_l U_lC H_l⁻¹ U_lCᵀ
        where U_lC stacks landmark l's couplings into cluster C's columns.
        Built per cluster from the obs-major runs with one one-hot
        contraction (a W-sized pass per cluster).  Ill-conditioned clusters
        fall back to their A-only block inverse."""
        n_cl, m, dof, cdim, n_r = layout
        a_rr, _, _, _, wparts = sys
        dtype = a_rr.dtype
        wp = wparts[0]
        ok = self.wpart_obs_k[0]
        L = self.num_elim
        # Padded A with identity on the pad rows (partial last cluster).
        total = n_cl * cdim
        ap = jnp.pad(a_rr, ((0, total - self.dim_reduced),) * 2)
        if total > self.dim_reduced:
            pad_ix = jnp.arange(self.dim_reduced, total)
            ap = ap.at[pad_ix, pad_ix].set(1.0)
        a_blocks = jax.vmap(
            lambda i: jax.lax.dynamic_slice(
                ap, (i * cdim, i * cdim), (cdim, cdim)
            )
        )(jnp.arange(n_cl))
        vc = wp.rvid[: L * ok].reshape(L, ok)  # camera id per obs slot
        w_runs = wp.w_blk[..., : L * ok].reshape(
            wp.w_blk.shape[0], wp.w_blk.shape[1], L, ok
        )  # cm [Sr, dl, L, K]
        corrs = []
        for ci in range(n_cl):
            loc = vc - ci * m  # [L, K]
            # Dustbin ids (≥ n_r: masked costs, fixed cameras) can land
            # inside the LAST cluster's id range, so exclude them
            # explicitly rather than relying on their w_blk being zero.
            oh = (
                (loc[:, :, None] == jnp.arange(m, dtype=vc.dtype)[None, None, :])
                & (vc[:, :, None] < n_r)
            ).astype(dtype)  # [L, K, m]; out-of-cluster/dustbin → all-zero
            # U [dl, L, cdim]: local column = loc·dof + p (m-major, p-minor
            # = the contiguous-offsets order).
            u = jnp.einsum(
                "pdlk,lkm->dlmp", w_runs, oh, precision="highest"
            ).reshape(w_runs.shape[1], L, cdim)
            hu = jnp.einsum("del,elx->dlx", h_inv, u)
            corrs.append(
                jnp.einsum("dlx,dly->xy", hu, u, precision="highest")
            )
        corr = self._reduce(jnp.stack(corrs))
        blocks = (
            a_blocks + lam * jnp.eye(cdim, dtype=dtype)[None] - corr
        )
        inv = batched_inv_spd(blocks)
        plain = batched_inv_spd(
            a_blocks + lam * jnp.eye(cdim, dtype=dtype)[None]
        )
        bad = ~jnp.all(jnp.isfinite(inv), axis=(-2, -1), keepdims=True)
        return jnp.where(bad, plain, inv)

    def precond_inverses(self, sys, lam, h_inv):
        """Inverted preconditioner blocks, with a per-block fallback to the
        A_rr-only inverse when a corrected block loses definiteness (λ=0 on
        gauge-deficient problems)."""
        a_rr = sys[0]
        dtype = a_rr.dtype
        a_pad = jnp.pad(a_rr, ((0, 1), (0, 1)))
        fam_blocks, corrected = self.precond_blocks(sys, lam, h_inv)
        inv_blocks = []
        for was_corrected, (name, offs, dof), blocks in zip(
            corrected, self.fam_offsets, fam_blocks
        ):
            inv = batched_inv_spd(blocks)
            if was_corrected:
                idx = offs[:, None] + np.arange(dof, dtype=np.int32)[None, :]
                idx = np.minimum(idx, self.dim_reduced)
                plain = batched_inv_spd(
                    a_pad[idx[:, :, None], idx[:, None, :]]
                    + lam * jnp.eye(dof, dtype=dtype)
                )
                bad = ~jnp.all(
                    jnp.isfinite(inv), axis=(-2, -1), keepdims=True
                )
                inv = jnp.where(bad, plain, inv)
            inv_blocks.append(inv)
        return inv_blocks

    def solve(self, sys, lam):
        a_rr, b_r, h_ll, g_l, wparts = sys
        dtype = b_r.dtype
        dl = self.dof_elim
        h_inv = batched_inv_spd_cm(
            h_ll
            + lam * jnp.eye(dl, dtype=dtype)[:, :, None]
            + self._h_damp_extra(dtype)
        )

        def s_matvec(v):
            u = self._wt_apply(wparts, v)  # Wᵀ v, cm [dl, L]
            u = jnp.einsum("del,el->dl", h_inv, u)  # H_ll⁻¹ Wᵀ v
            return a_rr @ v + lam * v - self._reduce(self._w_apply(wparts, u))

        rhs = b_r - self._reduce(
            self._w_apply(wparts, jnp.einsum("del,el->dl", h_inv, g_l))
        )

        cluster = self._cluster_layout()
        if cluster is not None:
            n_cl, _, _, cdim, _ = cluster
            cinv = self.cluster_inverses(sys, lam, h_inv, cluster)

            def precond(r):
                # Contiguous offsets: the block apply is a pure reshape.
                rp = jnp.pad(r, (0, n_cl * cdim - self.dim_reduced))
                z = jnp.einsum(
                    "nxy,ny->nx", cinv, rp.reshape(n_cl, cdim),
                    precision="highest",
                )
                return z.reshape(-1)[: self.dim_reduced]
        else:
            inv_blocks = self.precond_inverses(sys, lam, h_inv)

            def precond(r):
                rp = jnp.concatenate([r, jnp.zeros(self.pad + 1, dtype=dtype)])
                z = jnp.zeros(self.dim_reduced + self.pad + 1, dtype=dtype)
                for (name, offs, dof), inv in zip(self.fam_offsets, inv_blocks):
                    idx = jnp.asarray(offs)[:, None] + jnp.arange(dof, dtype=jnp.int32)[None, :]
                    idx = jnp.minimum(idx, self.dim_reduced + self.pad)
                    rg = rp[idx]
                    z = z.at[idx].add(jnp.einsum("nst,nt->ns", inv, rg))
                return z[: self.dim_reduced]

        x0 = jnp.zeros(self.dim_reduced, dtype=dtype)
        r0 = rhs
        z0 = precond(r0)
        rz0 = r0 @ z0
        tol2 = jnp.asarray(self._tol(dtype), dtype) ** 2 * (rhs @ rhs)

        def body(st):
            x, r, z, p, rz, k = st
            active = r @ r > tol2
            ap = s_matvec(p)
            denom = p @ ap
            alpha = rz / jnp.where(denom == 0, jnp.ones_like(denom), denom)
            # Frozen once converged: keeps the fixed-trip fori_loop exact.
            alpha = jnp.where(active, alpha, jnp.zeros_like(alpha))
            x2 = x + alpha * p
            r2 = r - alpha * ap
            z2 = precond(r2)
            rz2 = r2 @ z2
            beta = rz2 / jnp.where(rz == 0, jnp.ones_like(rz), rz)
            p2 = jnp.where(active, z2 + beta * p, p)
            rz2 = jnp.where(active, rz2, rz)
            z2 = jnp.where(active, z2, z)
            return (x2, r2, z2, p2, rz2, k + jnp.int32(active))

        init = (x0, r0, z0, z0, rz0, jnp.int32(0))

        def cond(st):
            _, r, _, _, _, k = st
            return (r @ r > tol2) & (k < self.max_iters)

        if self.chunk_iters:
            chunk = int(self.chunk_iters)
            xr, *_ = jax.lax.while_loop(
                cond,
                lambda st: jax.lax.fori_loop(
                    0, chunk, lambda i, s: body(s), st
                ),
                init,
            )
        elif self.fixed_iters is not None:
            xr, *_ = jax.lax.fori_loop(
                0, self.fixed_iters, lambda i, st: body(st), init
            )
        else:
            xr, *_ = jax.lax.while_loop(cond, body, init)
        xl = jnp.einsum(
            "del,el->dl", h_inv, g_l - self._wt_apply(wparts, xr)
        )
        return self._finalize(xr, xl)


@dataclasses.dataclass
class _FastBatch:
    """Host-precomputed structure for the gather/one-hot fast assembly path
    of a BA-shaped batch (one reduced slot + one eliminated slot).

    TPU scatters with duplicate indices serialize and dominated assembly in
    profiling (~80% of assemble time); this path replaces them with
    (a) a per-landmark observation table ``obs_table [L, K]`` so
    landmark-keyed reductions become gathers + dense sums, and
    (b) one-hot matmuls over the reduced-variable id so camera-keyed
    reductions ride the MXU, followed by unique-index block scatters."""

    r_slot: int  # index of the reduced dependency slot
    n_r: int  # reduced family size
    obs_table: np.ndarray  # [L, K] batch-row ids (out-of-range = padding)
    rvid: np.ndarray  # [B] reduced var id (n_r = dustbin for fixed/masked)
    row_base: np.ndarray  # [n_r] global tangent offset per reduced var (dustbin→dr)
    cam_table: np.ndarray = None  # [n_r, Kc] batch-row ids keyed by rvid
    # When the batch is obs-major packed (column l·K + j = j-th cost of
    # landmark l; see ``obs_major_repack``), the run length K: landmark
    # reductions become reshape + lane-axis sums with NO gather (TPU gathers
    # along the minor axis dominated assembly).  None = use obs_table.
    obs_k: int = None
    # Dual-sorted direct assembly (obs_k batches only): a second repack of
    # the SAME costs in camera-run order, so the a_rr/b_r reductions are
    # also reshape + lane sums — at the price of evaluating the residual
    # Jacobian twice (~1ms vs ~4ms of one-hot matmuls at bench scale).
    cam_batch: Any = None
    cam_k: int = None
    # Camera-repack column permutation over the (repacked) batch rows —
    # lets runtime-masked views map their mask into cam_batch's order.
    cam_take: Any = None
    # Bucketed obs-major layout (skewed/real-BAL degree distributions):
    # tuple of ``(l_base, L_b, k_b, col_base)`` runs — landmark ``l`` in
    # ``[l_base, l_base + L_b)`` owns columns ``col_base + (l − l_base)·k_b
    # + j``.  Landmark ids are relabeled degree-descending at layout time
    # (engine.build_layout order_key) so each power-of-two degree class is
    # a contiguous id range; heavy landmarks (> _OBS_BUCKET_K_CAP obs) get
    # extra full-K chunk buckets over the same (prefix) id range, whose
    # partial sums simply accumulate.  None for uniform batches (single
    # implicit bucket ``(0, L, obs_k, 0)``).
    buckets: tuple = None
    extra_base: int = None  # first fixed-landmark-extras column (buckets only)
    # Eliminated-family slot index within batch.manifolds (2-slot batches:
    # 1 - r_slot; 3-slot adaptive batches: slot 0 is the kernel).
    e_slot: int = None
    # Adaptive (kernel, reduced, eliminated) batches with ONE shared kernel
    # variable: its global tangent rows [kdof] (dustbin dr when fixed) —
    # the kernel's diag/grad/cross blocks then land via single reductions
    # instead of B duplicate scatters.
    kernel_rows: Any = None


@dataclasses.dataclass
class SchurInfo:
    """Static structure for Schur assembly.  ``implicit=True`` selects the
    matrix-free reduced solve (:class:`SchurCGOps`); otherwise the dense-W
    direct elimination (:class:`SchurOps`)."""

    elim_family: str
    dim_reduced: int  # Dr
    num_elim: int  # L
    dof_elim: int  # dl
    elim_ids: dict  # family name -> [n] landmark ids (L = dustbin) for elim fam
    implicit: bool = False
    fam_offsets: tuple = ()  # reduced-family (name, offsets, dof) for precond
    pad: int = 1
    fast: tuple = ()  # per-batch _FastBatch or None, aligned with batches
    # Per-batch (perm [B], starts [L+1]) sorting costs by landmark id — the
    # reference's reordercostsforschur! (src/problem.jl:177-199), enabling
    # run-contiguous (pallas) landmark reductions in the implicit solver.
    elim_sort: tuple = ()
    # Per-wpart fam_offsets index of the (single) reduced slot's family, for
    # the Schur-Jacobi preconditioner; None = correction unavailable.
    wpart_fam: tuple = ()
    # Per-wpart obs-major run length (None = not obs-major / not uniform);
    # cluster-Jacobi requires uniform runs (see SchurCGOps.wpart_obs_k).
    wpart_obs_k: tuple = ()
    # Per-wpart obs-major run buckets (see SchurCGOps.wpart_buckets); set
    # exactly when the dual assembly path built a cm-layout wpart.
    wpart_buckets: tuple = ()
    # P-major dense-W layout (NLLSTPU_W_IMPL=pallas and the problem
    # qualifies): (n_r, nrp, dr_s, pm_of_std [Dr]) where W column
    # ``p*nrp + v`` holds what the standard layout stores at
    # ``pm_of_std⁻¹``; see ops/pallas/w_place.py for why Mosaic forces
    # this.  None = standard v-major columns.
    w_pm: tuple = None

    def ops(self):
        if self.implicit:
            # The pallas sorted-run reduction is opt-in (NLLSTPU_SEGMENT_IMPL
            # =pallas): verified standalone on v5e, but LARGE nested-while
            # implicit programs can fault the TPU worker regardless of the
            # reduction implementation (docs/ROUND1.md gaps) — kept off the
            # default path.
            import os

            segment_impl = os.environ.get("NLLSTPU_SEGMENT_IMPL", "scatter")
            if segment_impl == "pallas" and jax.default_backend() != "tpu":
                segment_impl = "scatter"
            fixed = os.environ.get("NLLSTPU_CG_FIXED_ITERS")
            chunk = os.environ.get("NLLSTPU_CG_CHUNK_ITERS")
            return SchurCGOps(
                self.dim_reduced,
                self.num_elim,
                self.dof_elim,
                pad=self.pad,
                fam_offsets=self.fam_offsets,
                wpart_fam=self.wpart_fam,
                wpart_obs_k=self.wpart_obs_k,
                wpart_buckets=self.wpart_buckets,
                segment_impl=segment_impl,
                fixed_iters=int(fixed) if fixed else None,
                chunk_iters=int(chunk) if chunk else None,
            )
        return SchurOps(
            self.dim_reduced, self.num_elim, self.dof_elim,
            pm=None if self.w_pm is None else self.w_pm[3],
        )


#: Fast-path guards: transient one-hot memory cap (elements) and
#: observation-table skew caps (per-landmark / per-camera).
_FAST_MAX_ONEHOT = 64 * 1024 * 1024  # elements
_FAST_MAX_K = 512
_FAST_MAX_CAM_K = 8192
#: Obs-major repack guard: max padded-columns-to-real-costs compute ratio.
_OBS_MAJOR_MAX_RATIO = 2.5
#: Bucketed layout: per-bucket run-length cap (bounds the fused kernels'
#: VMEM jac block and unroll depth); heavier landmarks get chunk buckets.
#: 64 (was 128): the on-chip Mosaic accounting probe (bench_logs/
#: r5_queue1.log leg 1) showed the fused_all kernel's scoped stack grows
#: ~65 KB per unrolled k step (the per-k one-hot [NRp, TILE] temps do not
#: share stack slots) — k_b = 96 overflows the 16 MB limit at BOTH lane
#: tiles while k_b = 64 compiles and runs; capping buckets at 64 keeps
#: every bucket inside the validated envelope.
_OBS_BUCKET_K_CAP = 64


class ObsBuckets(NamedTuple):
    """Bucketed obs-major column layout (see ``_FastBatch.buckets``)."""

    buckets: tuple  # ((l_base, L_b, k_b, col_base), ...)
    extra_base: int  # first column of the fixed-landmark extras region
    uniform_k: Any  # run length when single-bucket-covering-all-L, else None
    # Column permutation: repacked column j holds original row take[j]
    # (pad slots point at row 0 and carry mask False) — lets runtime-masked
    # views (SubproblemView) map original-order cost masks into the
    # repacked order.
    take: Any = None


def _plan_obs_buckets(counts):
    """Bucket plan over DESCENDING per-landmark counts: power-of-two degree
    classes (contiguous id ranges by monotonicity) plus full-K_CAP chunk
    buckets over the heavy prefix.  Returns a list of
    ``(l_base, L_b, k_b, obs_offset)`` where ``obs_offset`` is the first
    observation index of each landmark carried by that bucket."""
    L = counts.shape[0]
    cap = _OBS_BUCKET_K_CAP

    def ceil8(x):
        return -(-int(x) // 8) * 8

    plan = []
    # Chunk buckets j = 1.. over the heavy prefix {l : c_l > j·cap}; the
    # run width is capped at the widest remaining window (ceil-8).
    j = 1
    while True:
        h = int(np.sum(counts > j * cap))
        if h == 0:
            break
        width = min(cap, ceil8(int(counts[0]) - j * cap))
        plan.append((0, h, width, j * cap))
        j += 1
    # Power-of-two classes over min(c, cap) for all landmarks with c > 0;
    # each class's run width is tightened to its actual max count (ceil-8)
    # — pow2 is just the grouping key, and e.g. a 96-track class must not
    # pad to 128 (25% wasted compute and a bigger kernel VMEM block).
    base = np.minimum(counts, cap)
    cls = np.where(base > 0, 2 ** np.ceil(np.log2(np.maximum(base, 1))), 0)
    cls = cls.astype(np.int64)
    start = 0
    while start < L and cls[start] > 0:
        k_cls = int(cls[start])
        end = start + int(np.sum(cls[start:] == k_cls))
        k_b = min(k_cls, max(ceil8(int(counts[start])), 1))
        plan.append((start, end - start, k_b, 0))
        start = end
    return plan


def obs_major_repack(batch, info: "SchurInfo"):
    """Host-side reorder + pad of a BA-shaped batch into landmark-run
    ("obs-major") column order: column ``col_base + (l − l_base)·K_b + j``
    holds the j-th cost of landmark ``l`` in its bucket (mask False beyond
    its count); real costs whose landmark is fixed are appended after the
    buckets.  Landmark-keyed reductions over an obs-major batch are a
    reshape + minor-axis sum — no gather at all.  TPU gathers along the
    minor (lane) axis were profiled as the dominant assembly cost, and
    batch-major gathers stream (8, 128)-padded tiles; the batch *order* is
    the one free axis.  This is the TPU-native descendant of the
    reference's ``reordercostsforschur!`` (src/problem.jl:177-199), which
    likewise sorts costs by their single Schur variable.

    Uniform degree distributions get ONE bucket ``(0, L, K, 0)`` (the
    round-1..3 layout, bit-identical).  Skewed (real-BAL) distributions —
    where padding every landmark to the max track length would blow the
    ``_OBS_MAJOR_MAX_RATIO`` compute budget — get power-of-two degree-class
    buckets instead (≤ 2x padding within each class), which REQUIRES the
    landmark ids to be degree-descending (contiguous classes): the Schur
    compile relabels them via ``build_layout(order_key=...)``.

    Returns ``(repacked_batch, ObsBuckets)`` or ``(None, None)`` when the
    batch shape doesn't qualify (multi-slot costs, no landmarks, excessive
    padding even after bucketing)."""
    elim_slots = [
        i
        for i, m in enumerate(batch.manifolds)
        if family_name(m) == info.elim_family
    ]
    adaptive3 = (
        getattr(batch, "adaptive", False)
        and len(batch.manifolds) == 3
        and len(elim_slots) == 1
        and elim_slots[0] != 0
    )
    if (
        len(elim_slots) != 1
        or (len(batch.manifolds) != 2 and not adaptive3)
        or info.num_elim == 0
    ):
        return None, None
    e = elim_slots[0]
    mask = np.asarray(batch.mask)
    L = info.num_elim
    lid = np.asarray(info.elim_ids[info.elim_family])[np.asarray(batch.idx[e])]
    lid = np.where(mask, lid, L)
    extra = np.nonzero(mask & (lid == L))[0]  # real costs, fixed landmark
    rows_sorted, skey, counts, pos, k = _group_rows(lid, L)
    uniform_total = L * k + len(extra)
    if (
        k <= _FAST_MAX_K
        and uniform_total <= _OBS_MAJOR_MAX_RATIO * max(batch.n, 1)
    ):
        # Uniform-ish: single bucket, the legacy layout.
        cols = skey * k + pos
        b_new = -(-uniform_total // 8) * 8  # tile-friendly trailing pad
        take = np.zeros(b_new, dtype=np.int64)
        newmask = np.zeros(b_new, dtype=bool)
        take[cols] = rows_sorted
        newmask[cols] = True
        if len(extra):
            take[L * k : L * k + len(extra)] = extra
            newmask[L * k : L * k + len(extra)] = True
        meta = ObsBuckets(
            buckets=((0, L, k, 0),), extra_base=L * k, uniform_k=k,
            take=take,
        )
        return _apply_take(batch, take, newmask), meta
    # Skewed: bucketed layout.  Requires degree-descending landmark ids
    # (contiguous power-of-two classes) — compile_problem relabels them;
    # bail when it didn't (e.g. direct build_schur_info callers).
    if np.any(np.diff(counts) > 0):
        return None, None
    plan = _plan_obs_buckets(counts)
    total = sum(lb * kb for (_, lb, kb, _) in plan) + len(extra)
    if total > _OBS_MAJOR_MAX_RATIO * max(batch.n, 1):
        return None, None
    # Per-cost position within its landmark's run: obs j of landmark l goes
    # to the bucket whose [obs_offset, obs_offset + k_b) window contains j.
    take = np.zeros(-(-total // 8) * 8, dtype=np.int64)
    newmask = np.zeros(take.shape[0], dtype=bool)
    col_base = 0
    buckets = []
    for (l0, lb, kb, ob) in plan:
        in_b = (skey >= l0) & (skey < l0 + lb) & (pos >= ob) & (pos < ob + kb)
        cols = col_base + (skey[in_b] - l0) * kb + (pos[in_b] - ob)
        take[cols] = rows_sorted[in_b]
        newmask[cols] = True
        buckets.append((l0, lb, kb, col_base))
        col_base += lb * kb
    if len(extra):
        take[col_base : col_base + len(extra)] = extra
        newmask[col_base : col_base + len(extra)] = True
    meta = ObsBuckets(
        buckets=tuple(buckets), extra_base=col_base, uniform_k=None,
        take=take,
    )
    return _apply_take(batch, take, newmask), meta


def _apply_take(batch, take, newmask):
    return dataclasses.replace(
        batch,
        idx=tuple(np.asarray(i)[take] for i in batch.idx),
        params=None
        if batch.params is None
        else jtu.tree_map(lambda l: np.asarray(l)[take], batch.params),
        mask=newmask,
    )


def repack_batches_for_schur(batches, info: "SchurInfo"):
    """Apply :func:`obs_major_repack` where it qualifies, passing the rest
    through unchanged.  Returns ``(batches, metas)`` with per-batch
    :class:`ObsBuckets` (None where not repacked)."""
    out, metas = [], []
    for b in batches:
        nb, meta = obs_major_repack(b, info)
        out.append(nb if nb is not None else b)
        metas.append(meta)
    return out, metas


def elim_degree_counts(batches, problem, elim_manifold):
    """Per-variable observation counts of the (candidate) eliminated family
    over all W-producing batches — the ``order_key`` for the degree-sorted
    landmark relabel (see :func:`obs_major_repack`).

    KNOWN LIMITATION (ADVICE r4): the counts are summed over ALL batches,
    but ``obs_major_repack`` requires each INDIVIDUAL batch's counts to be
    non-increasing under the resulting order.  With several W-producing
    batches whose per-batch degree orders diverge, the non-dominant
    batches silently fail the monotonicity check inside the repack and
    fall back to the obs-table/scatter paths (performance only —
    correctness is unaffected).  Per-batch orders cannot be reconciled
    into one id relabel, so this is inherent; single-W-batch problems
    (every BAL-class workload) are unaffected."""
    elim_fam = family_name(elim_manifold)
    fam = problem._families.get(elim_fam)
    n = fam.n if fam is not None else 0
    counts = np.zeros(n, dtype=np.int64)
    for b in batches:
        eslots = [
            i
            for i, m in enumerate(b.manifolds)
            if family_name(m) == elim_fam
        ]
        if len(eslots) != 1 or len(b.manifolds) < 2:
            continue
        idx = np.asarray(b.idx[eslots[0]])[np.asarray(b.mask)]
        counts += np.bincount(idx, minlength=n)
    return counts


def _onehot_chunks(n_r, rows_per_chunk_elems, b):
    chunk = max(1, min(n_r, rows_per_chunk_elems // max(b, 1)))
    return [(start, min(chunk, n_r - start)) for start in range(0, n_r, chunk)]


def _fast_batch_data(batch, layout, info, meta=None):
    """Precompute the fast-path tables for one batch, or None when the batch
    shape doesn't qualify (multi-slot costs, oversized one-hot, extreme
    observation skew).  ``meta`` (an :class:`ObsBuckets` from the repack
    that produced this batch) marks a bucketed obs-major layout — landmark
    reductions then run per bucket and the dense observation table is not
    needed (nor buildable within its skew guard)."""
    elim_slots = [
        i
        for i, m in enumerate(batch.manifolds)
        if family_name(m) == info.elim_family
    ]
    adaptive3 = (
        getattr(batch, "adaptive", False)
        and len(batch.manifolds) == 3
        and len(elim_slots) == 1
        and elim_slots[0] != 0
    )
    if len(elim_slots) != 1 or (len(batch.manifolds) != 2 and not adaptive3):
        return None
    e = elim_slots[0]
    mask = np.asarray(batch.mask)
    kernel_rows = None
    if adaptive3:
        # Fast tables require ONE shared kernel variable (the common case:
        # one adaptive kernel jointly fit over the whole batch) so its
        # blocks reduce once; per-cost kernels fall back to the generic
        # scatter path.
        kidx = np.asarray(batch.idx[0])[mask]
        if kidx.size == 0 or np.unique(kidx).size != 1:
            return None
        kfam = family_name(batch.manifolds[0])
        koff = int(np.asarray(layout.offsets[kfam])[kidx[0]])
        kdof = batch.manifolds[0].dof
        kernel_rows = np.minimum(
            koff + np.arange(kdof, dtype=np.int32), info.dim_reduced
        ).astype(np.int32)
        r_slot = 3 - e  # the non-kernel, non-eliminated slot
    else:
        r_slot = 1 - e
    rman = batch.manifolds[r_slot]
    rfam = family_name(rman)
    n_r = int(layout.unfixed[rfam].shape[0])
    b_pad = batch.n_padded
    lid = np.asarray(info.elim_ids[info.elim_family])[np.asarray(batch.idx[e])]
    lid = lid.copy()
    lid[~mask] = info.num_elim
    if info.num_elim == 0:
        return None

    obs_table = None
    obs_k = None
    buckets = extra_base = None
    if meta is not None and meta.uniform_k is None:
        buckets, extra_base = meta.buckets, meta.extra_base
    else:
        sorted_rows, sorted_lid, counts, pos, k = _group_rows(
            lid, info.num_elim
        )
        if k > _FAST_MAX_K or info.num_elim * k > 8 * max(len(sorted_rows), 1):
            return None
        obs_table = np.full((info.num_elim, k), b_pad, dtype=np.int32)
        obs_table[sorted_lid, pos] = sorted_rows

        # Obs-major detection (see obs_major_repack): the table is exactly
        # the contiguous pattern l·K + j ⇒ landmark reductions need no
        # gather.
        contiguous = np.where(
            np.arange(k)[None, :] < counts[:, None],
            np.arange(info.num_elim)[:, None] * k + np.arange(k)[None, :],
            b_pad,
        )
        obs_k = k if (
            info.num_elim * k <= b_pad and np.array_equal(obs_table, contiguous)
        ) else None

    off_r = np.asarray(layout.offsets[rfam])
    rvid = np.asarray(batch.idx[r_slot]).astype(np.int32).copy()
    var_fixed = off_r[rvid] >= layout.dof_total
    rvid[(~mask) | var_fixed] = n_r  # dustbin id → all-zero one-hot row
    row_base = np.minimum(off_r, info.dim_reduced).astype(np.int32)
    cam_table = _key_table(rvid, n_r, b_pad, _FAST_MAX_CAM_K)
    cam_batch = cam_k = cam_take = None
    # The dual-sorted direct path (and the cm wpart layout keyed off
    # cam_batch's presence) applies only to components-major batches.
    if obs_k is not None and batch.batched == "cm":
        cam_batch, cam_k, cam_take = _cam_major_repack(batch, rvid, n_r)
    return _FastBatch(
        r_slot=r_slot,
        n_r=n_r,
        obs_table=obs_table,
        rvid=rvid,
        row_base=row_base,
        cam_table=cam_table,
        obs_k=obs_k,
        cam_batch=cam_batch,
        cam_k=cam_k,
        cam_take=cam_take,
        buckets=buckets,
        extra_base=extra_base,
        e_slot=e,
        kernel_rows=kernel_rows,
    )


def _cam_major_repack(batch, rvid, n_r):
    """Camera-run repack of an (obs-major) batch: column ``c·Kc + j`` holds
    the j-th cost touching unfixed reduced variable ``c``; costs with a
    dustbin rvid (masked, or fixed camera — no a_rr contribution) are
    dropped.  Returns (batch, Kc, take) or (None, None, None) on
    excessive skew."""
    if n_r == 0:
        return None, None, None
    rows_sorted, skey, counts, pos, kc = _group_rows(rvid, n_r)
    if kc > _FAST_MAX_CAM_K or n_r * kc > _OBS_MAJOR_MAX_RATIO * max(
        len(rows_sorted), 1
    ):
        return None, None, None
    cols = skey * kc + pos
    b_new = -(-(n_r * kc) // 8) * 8
    take = np.zeros(b_new, dtype=np.int64)
    newmask = np.zeros(b_new, dtype=bool)
    take[cols] = rows_sorted
    newmask[cols] = True
    return dataclasses.replace(
        batch,
        idx=tuple(np.asarray(i)[take] for i in batch.idx),
        params=None
        if batch.params is None
        else jtu.tree_map(lambda l: np.asarray(l)[take], batch.params),
        mask=newmask,
    ), kc, take


def _group_rows(keys, n_keys):
    """Host-side stable grouping of row indices by key (keys ≥ ``n_keys``
    are dropped): returns ``(rows_sorted, sorted_keys, counts, pos, k)``
    where ``pos`` is each row's rank within its key's run and ``k`` the
    maximum run length — the single primitive behind every dense key table
    and run repack in this module and ops/cg.py."""
    valid = np.nonzero(keys < n_keys)[0]
    counts = np.bincount(keys[valid], minlength=n_keys)
    k = int(max(counts.max(initial=0), 1))
    order = np.argsort(keys[valid], kind="stable")
    rows = valid[order]
    skey = keys[valid][order]
    starts = np.cumsum(counts) - counts
    pos = np.arange(len(rows)) - np.repeat(starts, counts)
    return rows, skey, counts, pos, k


def _key_table(keys, n_keys, pad_value, max_k):
    """[n_keys, K] table of row ids grouped by key (pad = ``pad_value``);
    None when the per-key count is too skewed for a dense table."""
    if n_keys == 0:
        return None
    rows, skey, counts, pos, k = _group_rows(keys, n_keys)
    if k > max_k or n_keys * k > 8 * max(len(rows), 1):
        return None
    table = np.full((n_keys, k), pad_value, dtype=np.int32)
    table[skey, pos] = rows
    return table


def _generic_rvid(batch, layout, info):
    """Per-cost reduced-variable id for the Schur-Jacobi preconditioner on a
    two-slot batch without fast-path tables (fixed/masked → dustbin n_r)."""
    elim_slots = [
        i
        for i, m in enumerate(batch.manifolds)
        if family_name(m) == info.elim_family
    ]
    if len(elim_slots) != 1 or len(batch.manifolds) != 2:
        return None
    r_slot = 1 - elim_slots[0]
    rfam = family_name(batch.manifolds[r_slot])
    n_r = int(layout.unfixed[rfam].shape[0])
    # jnp throughout: batch.idx/mask may be traced under shard_map.
    idx = jnp.asarray(batch.idx[r_slot]).astype(jnp.int32)
    var_fixed = jnp.asarray(layout.offsets[rfam])[idx] >= layout.dof_total
    return jnp.where(
        jnp.asarray(batch.mask) & ~var_fixed, idx, jnp.int32(n_r)
    )


def _make_wpart(info, bi, batch, w_blk, rows_r, lid, fast=None, rvid=None):
    """Assemble a :class:`WPart`, permuted into landmark-sorted order when
    sort data applies (built for this exact batch padding — per-shard
    batches skip it); the fast-path tables' row ids are remapped through the
    permutation so they index the (possibly sorted) wpart arrays."""
    sort = info.elim_sort[bi] if bi < len(info.elim_sort) else None
    sorted_ok = sort is not None and sort[0].shape[0] == batch.n_padded
    obs = cam = row_base = None
    if fast is not None:
        rvid = jnp.asarray(fast.rvid) if rvid is None else rvid
        obs_np, cam_np = fast.obs_table, fast.cam_table
        if sorted_ok:
            perm_np = np.asarray(sort[0])
            b_pad = batch.n_padded
            inv = np.full(b_pad + 1, b_pad, dtype=np.int32)
            inv[perm_np] = np.arange(b_pad, dtype=np.int32)
            if obs_np is not None:
                obs_np = np.where(
                    obs_np < b_pad, inv[np.minimum(obs_np, b_pad)], b_pad
                )
            if cam_np is not None:
                cam_np = np.where(
                    cam_np < b_pad, inv[np.minimum(cam_np, b_pad)], b_pad
                )
        obs = None if obs_np is None else jnp.asarray(obs_np)
        cam = None if cam_np is None else jnp.asarray(cam_np)
        row_base = jnp.asarray(fast.row_base)
    if sorted_ok:
        perm, starts = sort
        perm = jnp.asarray(perm)
        return WPart(
            w_blk=w_blk[perm],
            rows_r=rows_r[perm],
            lid=lid[perm],
            starts=jnp.asarray(starts),
            rvid=None if rvid is None else rvid[perm],
            obs=obs,
            cam_obs=cam,
            row_base=row_base,
        )
    return WPart(
        w_blk=w_blk,
        rows_r=rows_r,
        lid=lid,
        starts=None,
        rvid=rvid,
        obs=obs,
        cam_obs=cam,
        row_base=row_base,
    )


def _elim_sort_data(batch, layout, info):
    """Per-batch permutation sorting costs by landmark id + run offsets
    (reference ``reordercostsforschur!``).  Masked/fixed-landmark costs sort
    last, outside ``starts[-1]``."""
    elim_slots = [
        i
        for i, m in enumerate(batch.manifolds)
        if family_name(m) == info.elim_family
    ]
    if len(elim_slots) != 1 or info.num_elim == 0:
        return None
    e = elim_slots[0]
    mask = np.asarray(batch.mask)
    lid = np.asarray(info.elim_ids[info.elim_family])[np.asarray(batch.idx[e])]
    lid = lid.copy()
    lid[~mask] = info.num_elim
    perm = np.argsort(lid, kind="stable").astype(np.int32)
    counts = np.bincount(
        lid[lid < info.num_elim], minlength=info.num_elim
    )
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return perm, starts


def _fast_buckets(fast, info):
    """Obs-major run buckets of a fast batch (single implicit bucket for the
    uniform layout), or None when the batch is not obs-major packed."""
    if fast.buckets is not None:
        return fast.buckets
    if fast.obs_k is not None:
        return ((0, info.num_elim, fast.obs_k, 0),)
    return None


def build_schur_info(
    problem, layout: engine.Layout, elim_manifold, implicit: bool = False,
    batches=None, obs_meta=None,
) -> SchurInfo:
    """Derive the reduced/eliminated split from a layout built with the
    eliminated family ordered last (see ``build_layout(order_last=...)``)."""
    elim_fam = family_name(elim_manifold)
    dl = elim_manifold.dof
    offs = np.asarray(layout.offsets[elim_fam])
    unfixed = layout.unfixed[elim_fam]
    num_elim = int(unfixed.sum())
    dim_reduced = layout.dof_total - num_elim * dl
    ids = np.full(offs.shape[0], num_elim, dtype=np.int32)
    if num_elim:
        ids[unfixed] = (offs[unfixed] - dim_reduced) // dl
        assert (ids[unfixed] >= 0).all() and (ids[unfixed] < num_elim).all()
    fam_offsets = []
    if implicit:
        for name in problem.family_names():
            if name == elim_fam:
                continue
            fam_offsets.append(
                (name, layout.offsets[name], problem.manifold_of(name).dof)
            )
    info = SchurInfo(
        elim_family=elim_fam,
        dim_reduced=dim_reduced,
        num_elim=num_elim,
        dof_elim=dl,
        elim_ids={elim_fam: ids},
        implicit=implicit,
        fam_offsets=tuple(fam_offsets),
        pad=layout.pad,
    )
    if batches is not None:
        metas = obs_meta if obs_meta is not None else [None] * len(batches)
        info.fast = tuple(
            _fast_batch_data(b, layout, info, meta=m)
            for b, m in zip(batches, metas)
        )
        if not implicit:
            info.w_pm = _w_pm_data(batches, info)
        if implicit:
            # Obs-major batches must keep their column order (the CG path
            # relies on it) — the pallas elim_sort permutation would break
            # it, and it is redundant there anyway (obs-major IS sorted by
            # landmark, with masked slots in place).
            info.elim_sort = tuple(
                None
                if (bi < len(info.fast)
                    and info.fast[bi] is not None
                    and _fast_buckets(info.fast[bi], info) is not None)
                else _elim_sort_data(b, layout, info)
                for bi, b in enumerate(batches)
            )
            # Mirror assemble_schur's wpart append order: one entry per
            # batch with exactly one eliminated slot; the entry is the
            # fam_offsets index of the single reduced slot's family when the
            # Schur-Jacobi correction applies (two-slot cost), else None.
            fam_index = {name: i for i, (name, _, _) in enumerate(fam_offsets)}
            wpart_fam = []
            wpart_obs_k = []
            wpart_buckets = []
            for bi, b in enumerate(batches):
                eslots = [
                    i
                    for i, m in enumerate(b.manifolds)
                    if family_name(m) == elim_fam
                ]
                if len(eslots) != 1:
                    continue
                # Must mirror the dual-path trigger in assemble_schur: the
                # cm wpart layout exists only when the dual path built it
                # (obs-major cm batch).
                f = info.fast[bi] if bi < len(info.fast) else None
                dual = (
                    f is not None
                    and getattr(b, "batched", None) == "cm"
                    and _fast_buckets(f, info) is not None
                    # Adaptive wparts would need a second (kernel-row)
                    # coupling block in the CG matvec; implicit adaptive
                    # batches keep the generic full-block wpart instead.
                    and not getattr(b, "adaptive", False)
                )
                wpart_buckets.append(
                    _fast_buckets(f, info) if dual else None
                )
                wpart_obs_k.append(f.obs_k if dual else None)
                if len(b.manifolds) == 2:
                    rfam = family_name(b.manifolds[1 - eslots[0]])
                    wpart_fam.append(fam_index.get(rfam))
                else:
                    wpart_fam.append(None)
            info.wpart_fam = tuple(wpart_fam)
            info.wpart_obs_k = tuple(wpart_obs_k)
            info.wpart_buckets = tuple(wpart_buckets)
    return info


def _fused_tile_l(k_b, dr_s, dl, nrp, multi=False, nres=4):
    """Largest lane-tile width whose fused_all per-bucket VMEM footprint
    fits Mosaic's scoped stack; None when even 128 lanes do not — the
    caller then falls back to the XLA one-hot path.

    The model is an EMPIRICAL FIT of on-chip Mosaic compiles (see the
    inline table below) — Mosaic's scoped-stack accounting is not a
    public contract and two successive hand models each missed it by
    >50% (r4_queue18 OOM; r5_queue1/2 probes), so the gate is calibrated
    against measured pass/fail points and any future divergence demotes
    to the XLA paths via the optimize() compile-failure fallback rather
    than raising.  ``nres`` is the batch's residual component count —
    callers that know the true value (the obs-leg has ``jac.shape[0]``)
    pass it; qualification-time callers use the conservative default and
    the leg re-checks per bucket.  ``multi`` selects the accumulate
    (input_output_aliased) variant's heavier staging (5 W blocks, no
    256 tile)."""
    # Empirical fit of SIX on-chip Mosaic compiles at the realistic shape
    # (bench_logs/r5_queue1.log + r5_queue2.log leg 1, dl=3 dr_s=9
    # nrp=128 nres=2):
    #   into kb=96 @128 OOM 18.25M | kb=64 @128 OK | kb=32 @128 OK
    #   into kb=16 @256 OOM 22.86M | kb=4 @256 OOM 19.03M
    #   (r4 uniform headline: non-into kb=13 @256 runs for 3 rounds)
    # Structure that reproduces all points:
    # - the ACCUMULATE (input_output_aliased) variant stages FIVE W blocks
    #   (W_in x2 + W_out x2 — aliasing does NOT merge them — + f32
    #   scratch); the plain variant three (W_out x2 + scratch).
    # - per-unrolled-k temps: double-buffered operand rows plus the hoisted
    #   one-hot [NRp, TILE]; at TILE 256 the one-hot costs ~2 slots per k
    #   (fit 0.319 MiB/k ≈ io2x + 2·oh), at TILE 128 ~0.875 (fit
    #   0.093 MiB/k) — allocator register/spill behavior differs by tile.
    # - ~1 MB base staging overhead.
    # The accumulate variant therefore NEVER gets TILE 256 (kb=4 already
    # OOMs there); budget 15.5 MiB of the 16 MiB limit keeps the measured
    # kb=64 @128 point (est. 15.40 MiB) admitted and kb=96 (est. 18.4 vs
    # 18.25 observed) rejected.
    budget = int(15.5 * 2**20)
    s = dr_s + dl
    npairs = dr_s * (dr_s + 1) // 2
    ab_pad = -(-(npairs + dr_s) // 8) * 8
    w_blocks = 5 if multi else 3
    for tl in ((128,) if multi else (256, 128)):
        wblk = dl * dr_s * nrp * tl * 4
        base = (
            2 * (dl * dl + dl) * tl * 4  # h_ll + g_l out blocks (x2)
            + ab_pad * (tl + nrp) * 4  # ab row scratch + ab out
            + 1_000_000  # misc staging overhead (fit)
        )
        oh_slots = 2 if tl >= 256 else 0.875
        per_k = 2 * (nres * s + s + 3) * tl * 4 + int(
            oh_slots * nrp * tl * 4
        )
        vmem = w_blocks * wblk + base + k_b * per_k
        if vmem <= budget:
            return tl
    return None


def _batch_nres(b):
    """Residual component count of a cm batch, via ``jax.eval_shape`` (no
    FLOPs, no device work) on the hand Jacobian or the residual fn.
    Needed at LAYOUT time: `_w_pm_data`'s VMEM qualification must use the
    true nres — the conservative nres=4 default over-rejects real shapes
    (a Snavely kb=64 bucket passes at the true nres=2 but fails at 4,
    which silently demoted the whole bench-realistic batch to the one-hot
    path in r5_queue3.log leg 1).  Falls back to 4 (conservative) when
    shape inference fails."""
    try:
        bsz = b.n_padded
        mans = b.manifolds[1:] if getattr(b, "adaptive", False) else b.manifolds
        val_sds = tuple(
            jax.ShapeDtypeStruct(tuple(m.shape) + (bsz,), jnp.float32)
            for m in mans
        )
        params_sds = (
            None
            if b.params is None
            else jax.tree.map(
                lambda l: jax.ShapeDtypeStruct(
                    np.asarray(l).shape, np.asarray(l).dtype
                ),
                b.params,
            )
        )
        if b.jacobian is not None:
            r_sds, _ = jax.eval_shape(b.jacobian, params_sds, *val_sds)
        else:
            r_sds = jax.eval_shape(b.fn, params_sds, *val_sds)
        shape = r_sds.shape
        return int(shape[0]) if len(shape) == 2 else 1
    except Exception:
        return 4


def _w_pm_data(batches, info: "SchurInfo"):
    """P-major dense-W layout data (SchurInfo.w_pm), or None.

    Enabled only when a pallas W implementation is selected AND exactly one
    W-PRODUCING batch (≥2 slots, one of them eliminated) touches the
    eliminated family AND that batch runs the dual-sorted cm fast path AND
    the reduced space is exactly the coupled family's unfixed-variable
    grid — then the Pallas placement kernel is the SOLE W writer and every
    consumer permutation is well-defined (see ops/pallas/w_place.py).
    Single-slot eliminated-family batches (point priors) contribute
    h_ll/g_l only — never W — so any number of them ride along; the same
    holds for pure-reduced batches (camera priors, pose-graph edges).
    ``fused_all`` never runs the camera-major leg, so the camera repack
    (which bails on real-data camera-degree skew) is not required there.
    Anything else keeps the standard layout."""
    impl = _w_impl()
    if impl not in (
        "pallas", "pallas_interpret", "fused", "fused_interpret",
        "fused_all", "fused_all_interpret",
    ):
        return None
    if info.num_elim == 0 or info.dim_reduced == 0:
        return None
    w_producing = [
        bi
        for bi, b in enumerate(batches)
        if len(b.manifolds) > 1
        and any(family_name(m) == info.elim_family for m in b.manifolds)
    ]
    if len(w_producing) != 1:
        return None
    bi = w_producing[0]
    b = batches[bi]
    f = info.fast[bi] if bi < len(info.fast) else None
    eslots = [
        i
        for i, m in enumerate(b.manifolds)
        if family_name(m) == info.elim_family
    ]
    fused_all = impl in ("fused_all", "fused_all_interpret")
    obs_major = f is not None and (
        f.obs_k is not None or (f.buckets is not None and fused_all)
    )
    if (
        len(eslots) != 1
        or len(b.manifolds) != 2
        or f is None
        or not obs_major
        or (f.cam_batch is None and not fused_all)
        or getattr(b, "batched", None) != "cm"
    ):
        return None
    dr_s = sum(m.dof for m in b.manifolds) - info.dof_elim
    rb = np.asarray(f.row_base)
    sel = rb < info.dim_reduced
    cols = (rb[sel][:, None] + np.arange(dr_s)[None, :]).reshape(-1)
    if cols.size != info.dim_reduced or not np.array_equal(
        np.sort(cols), np.arange(info.dim_reduced)
    ):
        return None
    nrp = -(-f.n_r // 128) * 128
    # VMEM budget: the placement/fused kernels hold the [dl, dr_s*nrp,
    # TILE_L] W block in VMEM (fused_all adds an equal-size f32 accumulation
    # scratch).  Past ~a few hundred reduced variables that no longer fits
    # the ~16 MB VMEM — fall back to the standard layout (one-hot XLA path)
    # rather than fail Mosaic compilation at trace time.
    # Every bucket must fit VMEM at SOME lane-tile width (large-k buckets
    # shrink their tile rather than disqualifying the whole problem).
    buckets_q = (
        ((0, info.num_elim, f.obs_k, 0),) if f.obs_k else f.buckets
    )
    nres_q = _batch_nres(b)
    if any(
        _fused_tile_l(
            kb, dr_s, info.dof_elim, nrp, multi=len(buckets_q) > 1,
            nres=nres_q,
        ) is None
        for (_, _, kb, _) in buckets_q
    ):
        return None
    vids = np.nonzero(sel)[0].astype(np.int32)
    pm_of_std = np.empty(info.dim_reduced, dtype=np.int32)
    pm_of_std[rb[sel][:, None] + np.arange(dr_s)[None, :]] = (
        np.arange(dr_s, dtype=np.int32)[None, :] * nrp + vids[:, None]
    )
    return (int(f.n_r), int(nrp), int(dr_s), pm_of_std)


def _w_dtype(dtype):
    """Storage dtype for the dense W coupling (``NLLSTPU_W_DTYPE`` ∈
    {auto, bf16, f32}; ``auto`` = f32).  W dominates the direct solve's
    HBM traffic (~330 MB of ~500 MB per LM iteration at bench scale: one
    write + ~3.4 streamed reads across the damped attempts); storing it in
    bfloat16 halves those bytes while every contraction consuming it still
    accumulates in f32 (the MXU takes bf16 operands natively).

    bf16 is an OPT-IN, not the default: it measured 216.5 vs 199.9 LM it/s
    with an unchanged converged cost on the uniform pinhole bench (on-chip
    A/B, bench_logs/r4_queue8.log), but on realistic Snavely-shaped
    problems the ~2⁻⁸ W error CAPS convergence well above the noise floor
    (Ladybug shape, 60 LM iters: best cost 0.130 bf16 vs 0.0230 f32
    against a 0.0346 floor — reproduced platform-independently on CPU,
    bench_logs/r4_queue9.log) — a default that silently degrades real-data
    optima buys ~8% throughput; not a trade a solver library should make
    for its users.  The bench keeps an explicitly-labeled gated bf16
    headline where the cost is verified unchanged.  The knob is ignored
    for f64 problems (reference 1e-15 targets)."""
    import os

    if dtype != jnp.float32:
        return dtype
    knob = os.environ.get("NLLSTPU_W_DTYPE", "auto")
    if knob == "bf16":
        return jnp.bfloat16
    if knob == "f16":
        # Same half-width traffic as bf16 but with a 10+1-bit mantissa
        # (relative step 4.9e-4 vs bf16's 3.9e-3): the r4 finding that
        # killed the bf16 default was a storage-MANTISSA effect capping
        # realistic-shape optima (CLAUDE.md round-4 notes); f16 trades
        # range (max 65504 — W entries are Jacobian products, bounded by
        # the f-scaled reprojection magnitudes) for exactly the mantissa
        # bits that failed.  Validated per shape before defaulting.
        return jnp.float16
    return dtype


def _solve_impl() -> str:
    """Direct-Schur reduced-system implementation: "auto" (default),
    "xla" (einsum chain) or "pallas" (fused single-W-pass reduction
    kernel, ops/pallas/schur_reduce.py); pallas is TPU-only with a
    silent XLA fallback off-TPU.  "pallas_interpret" runs the kernel in
    interpreter mode for CPU correctness tests.

    "auto" resolves inside ``SchurOps._solve``: the damped reduction
    kernel (``reduce_s_lm_damped``) on TPU when the system qualifies
    (p-major W, dl <= 3, f32), else the XLA chain — the on-chip A/B that
    justified the flip is bench_logs/r4_queue15b.log."""
    import os

    if _PALLAS_VETO:
        return "xla"
    impl = os.environ.get("NLLSTPU_SOLVE_IMPL", "auto")
    if impl == "pallas" and jax.default_backend() != "tpu":
        return "xla"
    return impl


#: Set by core.optimize's compile-failure fallback: when a Mosaic scoped-
#: VMEM OOM (or any pallas lowering failure) aborts the driver's FIRST XLA
#: compile, the driver vetoes every pallas implementation and recompiles on
#: the XLA paths instead of raising — the VMEM gate models Mosaic's stack
#: accounting but the accounting is not a public contract (the round-4
#: regression was exactly a model/reality divergence, VERDICT.md weak #1).
_PALLAS_VETO = False


def set_pallas_veto(on: bool) -> None:
    """Disable (or re-enable) every pallas code path process-wide; used by
    the optimizer drivers to demote Mosaic compile failures to the XLA
    fallback paths.  Layout decisions read this at compile_problem time, so
    callers must rebuild their CompiledProblem after flipping it."""
    global _PALLAS_VETO
    _PALLAS_VETO = on


def pallas_veto() -> bool:
    return _PALLAS_VETO


def _w_impl() -> str:
    """W-coupling placement implementation for the direct dual-sorted
    assembly: "onehot" (default XLA path), "pallas" (W-placement kernel),
    "fused" (whole obs-major leg — h_ll/g_l/W — in one kernel pass over the
    Jacobian), "fused_all" (the ENTIRE assembly — h_ll/g_l/W/a_rr/b_r — in
    one kernel pass; the camera-major Jacobian re-evaluation never
    happens); the pallas variants are TPU-only and silently fall back
    off-TPU.  "*_interpret" runs the kernel in interpreter mode for CPU
    correctness tests.

    Default is "fused_all" on TPU and "onehot" elsewhere: the round-3
    on-chip A/B (bench_logs/r3_queue2.log, 3 interleaved rounds at 30 LM
    iters) measured assemble 8.8 → 1.73 ms and end-to-end 72.8 → 193.8
    LM it/s (2.66x) with the converged cost unchanged; problems that do
    not qualify for the p-major layout (see ``_w_pm_data``) fall through
    to the one-hot XLA path batch by batch regardless of the knob."""
    import os

    if _PALLAS_VETO:
        return "onehot"
    impl = os.environ.get("NLLSTPU_W_IMPL", "auto")
    on_tpu = jax.default_backend() == "tpu"
    if impl == "auto":
        return "fused_all" if on_tpu else "onehot"
    if impl in ("pallas", "fused", "fused_all") and not on_tpu:
        return "onehot"
    return impl


def _onehot_reduced_tail(jac, g0, d1m, d2m, rvid, robust_block, sel_r, fast,
                         row_idx, dtype, a_rr, b_r):
    """a_rr/b_r contributions of a column range via the chunked one-hot MXU
    contraction over the reduced-variable id (dustbin rvid drops masked and
    fixed-camera costs); lands with the unique row_base scatter."""
    ha = robust_block(jac, g0, d1m, d2m, sel_r, sel_r)  # [Sr, Sr, B]
    gr = g0[sel_r] * d1m  # [Sr, B]
    bsz = rvid.shape[0]
    a_parts, b_parts = [], []
    for cstart, width in _onehot_chunks(fast.n_r, _FAST_MAX_ONEHOT, bsz):
        oh = (
            (cstart + jnp.arange(width, dtype=jnp.int32))[:, None]
            == rvid[None, :]
        ).astype(dtype)  # [width, B]
        a_parts.append(
            jnp.einsum("vb,pqb->vpq", oh, ha, precision="highest")
        )
        b_parts.append(jnp.einsum("vb,pb->vp", oh, gr, precision="highest"))
    a_rr = a_rr.at[row_idx[:, :, None], row_idx[:, None, :]].add(
        jnp.concatenate(a_parts, axis=0)
    )
    b_r = b_r.at[row_idx].add(jnp.concatenate(b_parts, axis=0))
    return a_rr, b_r


def _assemble_fast_dual(
    batch, variables, layout, info, fast, e, dtype,
    a_rr, b_r, h_ll, g_l, w, w_store=None,
):
    """Dual-sorted direct assembly of one BA-shaped cm batch (the
    speed-of-light path): every reduction is either a contiguous
    reshape + minor-axis sum or a unique-index scatter.

    * The obs-major leg (landmark runs of length K) produces h_ll, g_l and
      the W coupling: robustified blocks are composed per OUTPUT directly
      from the Jacobian — the shared [S, S, B] per-cost Hessian is never
      materialized — and W lands via a one-hot contraction over the run
      slots plus a unique-row permutation scatter (per-slot and combined
      scatters both measured 5x slower: TPU scatters rewrite the full W
      buffer).
    * The camera-major leg (``fast.cam_batch``, runs of length Kc) re-
      evaluates the Jacobian in camera order so a_rr/b_r are also pure
      reshape-sums.  Twice the residual work (~1ms at bench scale) buys out
      ~8ms of one-hot matmuls, minor-axis gathers and padded-tile traffic.

    Returns ``(cost, sys)`` or None when the batch is not components-major
    batched (caller falls back)."""
    buckets = _fast_buckets(fast, info)
    raw = engine.batch_res_jac_cm(
        batch, variables, dtype,
        runs=(e, buckets),
    )
    if raw is None:
        return None
    dr, L, dl = info.dim_reduced, info.num_elim, info.dof_elim
    k = fast.obs_k
    # Jacobian tangent space excludes the kernel slot of adaptive batches
    # (its blocks come from rho_dkernel_cm, placed separately below).
    jac_manifolds = batch.manifolds[1:] if batch.adaptive else batch.manifolds
    e_jac = e - 1 if batch.adaptive else e
    dofs = [m.dof for m in jac_manifolds]
    start = sum(dofs[:e_jac])
    sel_e = np.arange(start, start + dl)
    sel_r = np.array(
        [i for i in range(sum(dofs)) if not (start <= i < start + dl)],
        dtype=np.int64,
    )
    dr_s = len(sel_r)

    def robust_block(jac, g0, d1m, d2m, sa, sb):
        """[len(sa), len(sb), B] robustified Hessian sub-block, composed
        fresh per output so it fuses into that output's reduction."""
        ja = jac[:, sa, :]
        jb = jac[:, sb, :]
        jj = jnp.einsum("npb,nqb->pqb", ja, jb)
        return jj * d1m + d2m * (g0[sa][:, None, :] * g0[sb][None, :, :])

    # --- obs-major leg: cost, h_ll, g_l, W --------------------------------
    cost_sum, r, jac, g0, d1, d2, kern = raw
    mval = jnp.asarray(batch.mask).astype(dtype)
    d1m = d1 * mval
    d2m = 2.0 * d2 * mval

    def runs_sum(x, out):
        """Accumulate per-landmark run sums of ``x [..., B]`` into ``out``
        (landmark-minor) via bucketed reshape + minor-axis sums — the
        static bucket slices keep every reduction contiguous."""
        for (l0, lb, kb, c0) in buckets:
            seg = x[..., c0 : c0 + lb * kb].reshape(
                x.shape[:-1] + (lb, kb)
            ).sum(axis=-1)
            out = out.at[..., l0 : l0 + lb].add(seg)
        return out

    wpart = None
    identity_rows = False
    if not info.implicit:
        n_r = fast.n_r
        row_flat = (
            np.asarray(fast.row_base)[:, None]
            + np.arange(dr_s, dtype=np.int32)[None, :]
        ).reshape(-1)
        identity_rows = np.array_equal(
            row_flat, np.arange(n_r * dr_s, dtype=np.int32)
        )
    w_impl = _w_impl()
    fused_all_tl = None
    if info.w_pm is not None and w_impl in (
        "fused_all", "fused_all_interpret"
    ):
        # Re-check the VMEM gate with the TRUE residual component count
        # (qualification in _w_pm_data assumed a conservative nres=4; a
        # wider residual that passed there must not fault the Mosaic
        # compile — any bucket failing here demotes the whole batch to the
        # one-hot path below).
        fused_all_tl = {
            kb: _fused_tile_l(
                kb, len(sel_r), dl, info.w_pm[1],
                multi=len(buckets) > 1, nres=int(jac.shape[0]),
            )
            for (_, _, kb, _) in buckets
        }
        if any(t is None for t in fused_all_tl.values()):
            fused_all_tl = None
    if fused_all_tl is not None:
        # Whole-system fused assembly: ONE kernel pass over the obs-major
        # Jacobian emits h_ll, g_l, the placed p-major W (written directly
        # in the storage dtype — the bf16 downcast pass disappears) AND the
        # per-camera a_rr/b_r blocks via an in-kernel one-hot MXU
        # contraction — the camera-major leg's second Jacobian evaluation
        # (_fast_dual_cam_leg) never happens.  Bucketed (skewed-degree)
        # batches run one kernel pass per bucket — partial run sums and the
        # per-camera ab contributions simply accumulate, and the chunked
        # heavy-landmark buckets overlap-add into the same W rows.
        from .pallas.fused_obs import fused_obs_all_pm, fused_obs_all_pm_into

        nres, stot = jac.shape[0], jac.shape[1]
        n_r = fast.n_r
        nrp = info.w_pm[1]
        rvid_j = jnp.asarray(fast.rvid)
        ab = None
        if len(buckets) == 1:
            w_buf = None  # kernel output used directly
        else:
            w_buf = jnp.zeros(
                (dl, dr_s * nrp, L), dtype=w_store or dtype
            )
        for (l0, lb, kb, c0) in buckets:
            tl = fused_all_tl[kb]
            sl = slice(c0, c0 + lb * kb)
            jac_t = (
                jac[:, :, sl]
                .reshape(nres, stot, lb, kb)
                .transpose(0, 1, 3, 2)
            )
            g0_t = g0[:, sl].reshape(stot, lb, kb).transpose(0, 2, 1)
            d1_t = d1m[sl].reshape(lb, kb).T
            d2_t = d2m[sl].reshape(lb, kb).T
            vc_k = rvid_j[sl].reshape(lb, kb).T
            if w_buf is None:
                # Uniform single-bucket layout: the proven whole-grid call
                # whose W output is used directly (bit-identical round-3
                # headline program).
                h_add, g_add, w_b, ab_b = fused_obs_all_pm(
                    jac_t, g0_t, d1_t, d2_t, vc_k, n_r, dr_s, dl,
                    int(sel_e[0]),
                    w_dtype=w_store,
                    interpret=(w_impl == "fused_all_interpret"),
                    tile_l=tl,
                )
                h_ll = h_ll.at[:, :, l0 : l0 + lb].add(h_add)
                g_l = g_l.at[:, l0 : l0 + lb].add(g_add)
                ab = ab_b if ab is None else ab + ab_b
                w = w_b
            else:
                # Multi-bucket (realistic-shape) layouts: ONE pipelined
                # call per bucket whose W contribution accumulates
                # directly into the full buffer (input_output_aliased).
                # The round-4 one-grid-step chunking (scoped-VMEM staging
                # of cond-branch result slabs, r4_queue9/10.log) cost ~67
                # dispatches + an XLA read-modify-write of every W slab —
                # 5.94 ms of assemble at bench-realistic shape
                # (r4_queue17.log); the aliased whole-bucket calls never
                # materialize a result slab and chain through the buffer
                # (no optimization_barrier needed).  bf16 W rounds ONCE
                # per bucket call (in-kernel f32 add, single downcast).
                h_add, g_add, w_buf, ab_b, la = fused_obs_all_pm_into(
                    jac_t, g0_t, d1_t, d2_t, vc_k, w_buf, l0,
                    n_r, dr_s, dl, int(sel_e[0]),
                    interpret=(w_impl == "fused_all_interpret"),
                    tile_l=tl,
                )
                span = h_add.shape[-1]
                h_ll = h_ll.at[:, :, la : la + span].add(h_add)
                g_l = g_l.at[:, la : la + span].add(g_add)
                ab = ab_b if ab is None else ab + ab_b
        if w_buf is not None:
            w = w_buf
        npairs = dr_s * (dr_s + 1) // 2
        pi, qi = np.triu_indices(dr_s)
        pair_of = np.zeros((dr_s, dr_s), dtype=np.int32)
        pair_of[pi, qi] = np.arange(npairs, dtype=np.int32)
        pair_of[qi, pi] = pair_of[pi, qi]
        a_blocks = ab[jnp.asarray(pair_of.reshape(-1)), :n_r].reshape(
            dr_s, dr_s, n_r
        )
        b_blocks = ab[npairs : npairs + dr_s, :n_r]
        row_idx = (
            jnp.asarray(fast.row_base)[:, None]
            + jnp.arange(dr_s, dtype=jnp.int32)[None, :]
        )  # [n_r, dr_s]; fixed vars point at the pad row dr
        a_rr = a_rr.at[row_idx[:, :, None], row_idx[:, None, :]].add(
            jnp.transpose(a_blocks, (2, 0, 1))
        )
        b_r = b_r.at[row_idx].add(b_blocks.T)
        # Extras region (real costs whose landmark is FIXED, packed after
        # the buckets by obs_major_repack): no h_ll/g_l/W rows — those are
        # dustbinned — but their camera a_rr/b_r contributions are real and
        # the kernels never see these columns.  Chunked one-hot over the
        # (tiny) tail; pad columns ride along as dustbin rvid.
        eb = fast.extra_base
        if eb is None and fast.obs_k is not None:
            eb = L * fast.obs_k
        if eb is not None and eb < jac.shape[-1]:
            a_rr, b_r = _onehot_reduced_tail(
                jac[:, :, eb:], g0[:, eb:], d1m[eb:], d2m[eb:],
                rvid_j[eb:], robust_block, sel_r, fast, row_idx, dtype,
                a_rr, b_r,
            )
        return cost_sum, (a_rr, b_r, h_ll, g_l, w), wpart
    if info.w_pm is not None and w_impl in ("fused", "fused_interpret"):
        # Fully-fused obs-major leg: one kernel pass over the K-major jac
        # tiles emits h_ll, g_l AND the placed p-major W (the kernel is the
        # sole W writer, same contract as place_w_pm — see
        # ops/pallas/fused_obs.py).  Replaces the he-compose + h_ll/g_l
        # reductions + we-compose + one-hot placement XLA chain.
        from .pallas.fused_obs import fused_obs_leg_pm

        nres, stot = jac.shape[0], jac.shape[1]
        jac_t = (
            jac[:, :, : L * k].reshape(nres, stot, L, k).transpose(0, 1, 3, 2)
        )
        g0_t = g0[:, : L * k].reshape(stot, L, k).transpose(0, 2, 1)
        d1_t = d1m[: L * k].reshape(L, k).T
        d2_t = d2m[: L * k].reshape(L, k).T
        vc_k = jnp.asarray(fast.rvid)[: L * k].reshape(L, k).T
        h_add, g_add, w = fused_obs_leg_pm(
            jac_t, g0_t, d1_t, d2_t, vc_k, n_r, dr_s, dl, int(sel_e[0]),
            interpret=(w_impl == "fused_interpret"),
        )
        h_ll = h_ll.at[:, :, :L].add(h_add)
        g_l = g_l.at[:, :L].add(g_add)
        return cost_sum, _fast_dual_cam_leg(
            fast, variables, dtype, robust_block, sel_r, dr_s,
            a_rr, b_r, h_ll, g_l, w,
        ), wpart

    he = robust_block(jac, g0, d1m, d2m, sel_e, sel_e)
    h_ll = runs_sum(he, h_ll)
    g_l = runs_sum(g0[sel_e] * d1m, g_l)

    if info.implicit:
        # Implicit: keep the per-cost coupling blocks components-major
        # [Sr, dl, B] (masked columns are exactly zero via the masked
        # d1/d2) — the CG matvecs consume this layout directly
        # (SchurCGOps.wpart_obs_k), no batch-major transpose materialized.
        w_cm = robust_block(jac, g0, d1m, d2m, sel_r, sel_e)
        rows = engine._batch_rows(batch, layout)
        rows_r = jnp.where(rows[:, sel_r] >= dr, dr, rows[:, sel_r])
        lid = jnp.asarray(info.elim_ids[info.elim_family])[batch.idx[e]]
        lid = jnp.where(batch.mask, lid, jnp.int32(L))
        lid = jnp.where(rows[:, sel_e[0]] >= layout.dof_total, jnp.int32(L), lid)
        wpart = WPart(
            w_blk=w_cm,
            rows_r=rows_r,
            lid=lid,
            starts=None,
            rvid=jnp.asarray(fast.rvid),
            obs=None,
            cam_obs=None if fast.cam_table is None else jnp.asarray(fast.cam_table),
            row_base=jnp.asarray(fast.row_base),
        )
    else:
        if info.w_pm is not None:
            # Fused Pallas placement in the p-major column layout: the
            # one-hot never reaches HBM and the kernel's output IS the
            # final W — _w_pm_data guarantees it is the sole W writer
            # (see ops/pallas/w_place.py for the Mosaic layout rationale).
            from .pallas.w_place import place_w_pm

            we_b = robust_block(jac, g0, d1m, d2m, sel_r, sel_e)  # [Sr,dl,B]
            we3 = (
                we_b[:, :, : L * k]
                .reshape(dr_s, dl, L, k)
                .transpose(3, 1, 0, 2)
                .reshape(k, dl * dr_s, L)
            )  # [K, d*dr_s + p, L]
            vc2 = jnp.asarray(fast.rvid)[: L * k].reshape(L, k).T  # [K, L]
            w = place_w_pm(
                we3, vc2, n_r, dr_s, dl,
                interpret=(w_impl == "pallas_interpret"),
            )  # [dl, dr_s*nrp, L] landmark-minor p-major
        else:
            # W: one-hot MXU contraction over the run slots (per-slot
            # scatters and one combined scatter both measured 5x slower —
            # TPU scatters rewrite the full 75MB W buffer), landing with a
            # permutation scatter of unique rows — or a plain contiguous add
            # when every camera is unfixed (the permutation is the identity).
            # One contraction per bucket; chunked heavy landmarks simply
            # accumulate into the same W rows.
            we_full = robust_block(jac, g0, d1m, d2m, sel_r, sel_e)
            rvid_np = jnp.asarray(fast.rvid)
            for (l0, lb, kb, c0) in buckets:
                we = we_full[:, :, c0 : c0 + lb * kb].reshape(
                    dr_s, dl, lb, kb
                )
                vc = rvid_np[c0 : c0 + lb * kb].reshape(lb, kb)
                w_parts = []
                for cstart, width in _onehot_chunks(
                    n_r, _FAST_MAX_ONEHOT, lb * kb
                ):
                    oh_w = (
                        vc[:, :, None]
                        == (cstart + jnp.arange(width, dtype=jnp.int32))[None, None, :]
                    ).astype(dtype)  # [L_b, K_b, width]
                    w_parts.append(
                        jnp.einsum(
                            "pdlk,lkv->dlvp", we, oh_w, precision="highest"
                        )
                    )
                w_blocks = jnp.concatenate(w_parts, axis=2)
                if identity_rows:
                    w = w.at[:, l0 : l0 + lb, : n_r * dr_s].add(
                        w_blocks.reshape(dl, lb, n_r * dr_s)
                    )
                else:
                    w_add = jnp.zeros((dl, lb, w.shape[-1]), dtype=dtype)
                    w_add = w_add.at[:, :, jnp.asarray(row_flat)].add(
                        w_blocks.reshape(dl, lb, n_r * dr_s)
                    )
                    w = w.at[:, l0 : l0 + lb].add(w_add)

    if kern is not None and not info.implicit:
        # Adaptive-kernel blocks (reference src/residual.jl:103-107 layout,
        # unhalved, unweighted-gradient cross), each via a SINGLE reduction
        # instead of B duplicate scatters into the same rows:
        #   kk / g_k    : plain sums over the batch;
        #   kernel-cam  : chunked one-hot MXU contraction per camera;
        #   kernel-pt   : per-bucket run reshape-sums into W's kernel
        #                 columns (the kernel is a REDUCED variable, so its
        #                 point coupling is ordinary W data).
        dgrad, dhess = kern
        kdof = dgrad.shape[0] - 1
        kr = jnp.asarray(fast.kernel_rows)
        dga = dgrad[:kdof] * mval
        dha = dhess[:kdof, :kdof] * mval
        dcross = dhess[:kdof, kdof] * mval  # [k, B]
        a_rr = a_rr.at[kr[:, None], kr[None, :]].add(jnp.sum(dha, axis=-1))
        b_r = b_r.at[kr].add(jnp.sum(dga, axis=-1))
        m_b = g0[sel_r][:, None, :] * dcross[None, :, :]  # [dr_s, k, B]
        rvid_j = jnp.asarray(fast.rvid)
        parts = []
        for cstart, width in _onehot_chunks(
            fast.n_r, _FAST_MAX_ONEHOT, rvid_j.shape[0]
        ):
            oh = (
                (cstart + jnp.arange(width, dtype=jnp.int32))[:, None]
                == rvid_j[None, :]
            ).astype(dtype)
            parts.append(
                jnp.einsum("vb,pkb->vpk", oh, m_b, precision="highest")
            )
        cr = jnp.concatenate(parts, axis=0)  # [n_r, dr_s, k]
        row_idx_k = (
            jnp.asarray(fast.row_base)[:, None]
            + jnp.arange(dr_s, dtype=jnp.int32)[None, :]
        )
        a_rr = a_rr.at[row_idx_k[:, :, None], kr[None, None, :]].add(cr)
        a_rr = a_rr.at[kr[None, None, :], row_idx_k[:, :, None]].add(cr)
        m_e = g0[sel_e][:, None, :] * dcross[None, :, :]  # [dl, k, B]
        for (l0, lb, kb, c0) in buckets:
            seg = (
                m_e[..., c0 : c0 + lb * kb]
                .reshape(dl, kdof, lb, kb)
                .sum(-1)
            )  # [dl, k, L_b]
            w = w.at[:, l0 : l0 + lb, kr].add(seg.transpose(0, 2, 1))

    if fast.cam_batch is not None:
        return cost_sum, _fast_dual_cam_leg(
            fast, variables, dtype, robust_block, sel_r, dr_s,
            a_rr, b_r, h_ll, g_l, w,
        ), wpart
    # No camera-major repack (skewed camera degrees, or a bucketed batch):
    # a_rr/b_r via the chunked one-hot MXU contraction over the SAME
    # obs-major Jacobian — no second Jacobian evaluation, one transient
    # [width, B] one-hot per chunk (extras and pad columns ride along via
    # the dustbin rvid).
    row_idx = (
        jnp.asarray(fast.row_base)[:, None]
        + jnp.arange(dr_s, dtype=jnp.int32)[None, :]
    )  # [n_r, dr_s]; fixed vars point at the pad row dr
    a_rr, b_r = _onehot_reduced_tail(
        jac, g0, d1m, d2m, jnp.asarray(fast.rvid), robust_block, sel_r,
        fast, row_idx, dtype, a_rr, b_r,
    )
    return cost_sum, (a_rr, b_r, h_ll, g_l, w), wpart


def _fast_dual_cam_leg(fast, variables, dtype, robust_block, sel_r, dr_s,
                       a_rr, b_r, h_ll, g_l, w):
    """Camera-major leg of the dual-sorted assembly: a_rr and b_r as pure
    reshape-sums over camera runs (cost NOT re-counted; the Jacobian is
    evaluated a second time in camera order — docstring above).  The
    camera slot gather broadcasts over the camera runs (one gather per
    camera instead of per cost)."""
    raw2 = engine.batch_res_jac_cm(
        fast.cam_batch, variables, dtype,
        runs=(fast.r_slot, ((0, fast.n_r, fast.cam_k, 0),)),
    )
    _, _, jac2, g02, d1_2, d2_2, _ = raw2
    m2 = jnp.asarray(fast.cam_batch.mask).astype(dtype)
    d1m2 = d1_2 * m2
    d2m2 = 2.0 * d2_2 * m2
    n_r, kc = fast.n_r, fast.cam_k

    def cam_runs(x):
        return x[..., : n_r * kc].reshape(x.shape[:-1] + (n_r, kc))

    ha = robust_block(jac2, g02, d1m2, d2m2, sel_r, sel_r)
    a_blocks = jnp.sum(cam_runs(ha), axis=-1)  # [Sr, Sr, n_r]
    b_blocks = jnp.sum(cam_runs(g02[sel_r] * d1m2), axis=-1)  # [Sr, n_r]
    row_idx = (
        jnp.asarray(fast.row_base)[:, None]
        + jnp.arange(dr_s, dtype=jnp.int32)[None, :]
    )  # [n_r, dr_s]; fixed vars point at the pad row dr
    a_rr = a_rr.at[row_idx[:, :, None], row_idx[:, None, :]].add(
        jnp.transpose(a_blocks, (2, 0, 1))
    )
    b_r = b_r.at[row_idx].add(b_blocks.T)
    return (a_rr, b_r, h_ll, g_l, w)


def assemble_schur(batches, variables, layout: engine.Layout, info: SchurInfo,
                   dtype, w_dtype=None):
    """Assemble ``(cost, (a_rr, b_r, h_ll, g_l, w))``.

    ``w_dtype`` overrides the dense-W storage dtype (None → the
    ``NLLSTPU_W_DTYPE`` knob via :func:`_w_dtype`); the sharded callers pin
    it to ``dtype`` because their per-device W contributions are psum-reduced
    and a pre-reduction downcast would stack rounding error across devices.

    Reuses the per-batch block computation of the dense path
    (``engine.batch_grad_hess``) and splits each cost's block into
    reduced-reduced (scatter-add), landmark-diagonal and gradient pieces
    (segment-sum keyed by landmark id) and the W coupling (two-index
    scatter-add) — the TPU replacement for the reference's per-block BSM
    scatter (src/linearsystem.jl:132-175)."""
    dr, L, dl = info.dim_reduced, info.num_elim, info.dof_elim
    pad = layout.pad
    a_rr = jnp.zeros((dr + pad, dr + pad), dtype=dtype)
    b_r = jnp.zeros(dr + pad, dtype=dtype)
    # Eliminated blocks accumulate components-major (see module docstring):
    # the landmark axis must stay minor or TPU tiling pads (dl, dl) to
    # (8, 128).
    h_ll = jnp.zeros((dl, dl, L + 1), dtype=dtype)
    g_l = jnp.zeros((dl, L + 1), dtype=dtype)
    w = (
        None
        if info.implicit
        else jnp.zeros((dl, L + 1, dr + pad), dtype=dtype)
    )
    wparts = []
    total = jnp.zeros((), dtype=dtype)
    wi = -1  # index into info.wpart_* (single-elim-slot batches, in order)

    for bi, batch in enumerate(batches):
        elim_slots = [
            i for i, m in enumerate(batch.manifolds)
            if family_name(m) == info.elim_family
        ]
        if len(elim_slots) == 1:
            wi += 1
        fast0 = info.fast[bi] if bi < len(info.fast) else None
        buckets0 = _fast_buckets(fast0, info) if fast0 is not None else None
        # Every obs-major cm batch takes the dual path — a_rr/b_r come from
        # the camera-major leg when the repack qualified, from the
        # in-kernel one-hot of the whole-system fused kernel, or from the
        # chunked one-hot fallback (skewed camera degrees never disqualify
        # the obs-major leg).  The implicit backend takes it exactly when
        # build_schur_info mirrored a cm wpart layout for this batch
        # (SchurCGOps.wpart_buckets) — the sharded local infos pin that
        # mirror empty because their ops consume batch-major wparts.
        if (
            len(elim_slots) == 1
            and fast0 is not None
            and buckets0 is not None
            and (
                not info.implicit
                or (
                    wi < len(info.wpart_buckets)
                    and info.wpart_buckets[wi] is not None
                )
            )
        ):
            c = _assemble_fast_dual(
                batch, variables, layout, info, fast0, elim_slots[0],
                dtype, a_rr, b_r, h_ll, g_l, w,
                w_store=_w_dtype(dtype) if w_dtype is None else w_dtype,
            )
            if c is not None:
                total = total + c[0]
                a_rr, b_r, h_ll, g_l, w = c[1]
                if c[2] is not None:
                    wparts.append(c[2])
                continue
        # Per-cost blocks arrive components-major ([S, B] / [S, S, B]): the
        # batch-major layout pads its tiny trailing block dims to (8, 128)
        # tiles — profiled at ~1.5GB of HBM traffic per assemble at 105k
        # observations, the hottest single cost of an LM iteration.
        c, g_cm, h_cm, rows = engine.batch_grad_hess_cm(
            batch, variables, layout, dtype
        )
        total = total + c
        if not elim_slots:
            # Pure-reduced batch: rows are already reduced offsets (< dr) or
            # dustbin; the dustbin (layout.dof_total = dr + L·dl) must be
            # remapped into this system's pad region.  Block scatters need
            # batch-major operands; these batches are small by construction.
            rows = jnp.where(rows >= dr, dr, rows)
            a_rr = a_rr.at[rows[:, :, None], rows[:, None, :]].add(
                jnp.moveaxis(h_cm, -1, 0)
            )
            b_r = b_r.at[rows].add(g_cm.T)
            continue
        if len(elim_slots) > 1:
            raise ValueError(
                "Schur elimination requires at most one eliminated variable "
                "per cost (reference src/problem.jl:185)"
            )
        e = elim_slots[0]
        # Static positions of the eliminated segment within the block.
        dofs = [m.dof for m in batch.manifolds]
        start = sum(dofs[:e])
        sel_e = np.arange(start, start + dl)
        sel_r = np.array(
            [i for i in range(sum(dofs)) if not (start <= i < start + dl)],
            dtype=np.int64,
        )
        # Landmark ids per cost (masked/fixed → dustbin L).
        lid = jnp.asarray(info.elim_ids[info.elim_family])[batch.idx[e]]
        lid = jnp.where(batch.mask, lid, jnp.int32(L))
        # Reduced rows per cost: drop the eliminated segment; remap any
        # global/dustbin index >= dr into the pad region.
        rows_r = rows[:, sel_r]
        rows_r = jnp.where(rows_r >= dr, dr, rows_r)

        h_rr_cm = h_cm[sel_r[:, None], sel_r[None, :], :]  # [Sr, Sr, B]
        h_le_cm = h_cm[sel_e[:, None], sel_e[None, :], :]  # [dl, dl, B]
        w_blk_cm = h_cm[sel_r[:, None], sel_e[None, :], :]  # [Sr, dl, B]
        g_r_cm = g_cm[sel_r]  # [Sr, B]
        g_e_cm = g_cm[sel_e]  # [dl, B]
        # If the eliminated variable of a cost is FIXED, its h_le/w/g_e parts
        # must be dropped (its rows were already dustbinned in `rows`, so
        # detect via the original row of the eliminated segment).
        elim_fixed = rows[:, sel_e[0]] >= layout.dof_total
        lid = jnp.where(elim_fixed, jnp.int32(L), lid)

        fast = info.fast[bi] if bi < len(info.fast) else None
        # The gather/one-hot branch below assumes 2-slot row geometry
        # (row_base + contiguous dr_s); 3-slot adaptive batches that didn't
        # take the dual path (implicit backend) use the generic scatters.
        if fast is not None and len(batch.manifolds) == 2:
            # Gather/one-hot fast path (see _FastBatch).  Duplicate-index
            # scatters dominated TPU assembly; here:
            #  * camera-keyed sums ride the MXU via a one-hot matmul over the
            #    reduced-variable id, then land with a UNIQUE-index scatter;
            #  * landmark-keyed sums become gathers through the [L, K]
            #    observation table plus a dense axis-sum.
            # All reductions contract over the minor [B] axis of the cm
            # blocks — nothing batch-major is ever materialized.
            dr_s = len(sel_r)
            # One-hot matmuls chunked over the variable axis so transient
            # [chunk, B] memory stays bounded at BAL scale.
            rvid = jnp.asarray(fast.rvid)
            bsz = rvid.shape[0]
            a_parts, b_parts = [], []
            for start, width in _onehot_chunks(fast.n_r, _FAST_MAX_ONEHOT, bsz):
                oh = (
                    (start + jnp.arange(width, dtype=jnp.int32))[:, None]
                    == rvid[None, :]
                ).astype(dtype)  # [width, B]; dustbin columns are all-zero
                a_parts.append(
                    jnp.einsum("vb,pqb->vpq", oh, h_rr_cm, precision="highest")
                )
                b_parts.append(
                    jnp.einsum("vb,pb->vp", oh, g_r_cm, precision="highest")
                )
            a_blocks = jnp.concatenate(a_parts, axis=0)
            b_blocks = jnp.concatenate(b_parts, axis=0)
            row_idx = (
                jnp.asarray(fast.row_base)[:, None]
                + jnp.arange(dr_s, dtype=jnp.int32)[None, :]
            )  # [n_r, dr_s]; fixed vars point at the pad row dr
            a_rr = a_rr.at[row_idx[:, :, None], row_idx[:, None, :]].add(a_blocks)
            b_r = b_r.at[row_idx].add(b_blocks)

            k = fast.obs_k or (
                fast.obs_table.shape[1] if fast.obs_table is not None else None
            )
            fbuckets = _fast_buckets(fast, info)
            if fbuckets is not None:
                # Obs-major batch: each bucket's landmark runs are a pure
                # reshape, NO gather (uniform batches are one bucket).
                # Padding columns hold garbage (copied row-0 values) and
                # must be zeroed via the mask; the camera one-hot needs no
                # masking (masked rvid is the all-zero dustbin column).
                mval = jnp.asarray(batch.mask).astype(dtype)

                def landmark_runs_add(x, out, masked=True):
                    if masked:
                        x = x * mval
                    for (l0, lb, kb, c0) in fbuckets:
                        seg = x[..., c0 : c0 + lb * kb].reshape(
                            x.shape[:-1] + (lb, kb)
                        ).sum(axis=-1)
                        out = out.at[..., l0 : l0 + lb].add(seg)
                    return out

                h_ll = landmark_runs_add(h_le_cm, h_ll)
                g_l = landmark_runs_add(g_e_cm, g_l)
            else:
                tk = jnp.asarray(fast.obs_table.reshape(-1))

                def table_gather_cm(x):
                    # x [..., B] → [..., L, k]; gather along the minor axis
                    # so the whole reduction stays components-major.
                    flat = jnp.take(x, tk, axis=-1, mode="fill", fill_value=0)
                    return flat.reshape(x.shape[:-1] + (L, k))

                h_ll = h_ll.at[:, :, :L].add(
                    jnp.sum(table_gather_cm(h_le_cm), axis=-1)
                )
                g_l = g_l.at[:, :L].add(
                    jnp.sum(table_gather_cm(g_e_cm), axis=-1)
                )
            if info.implicit:
                wparts.append(
                    _make_wpart(
                        info, bi, batch,
                        jnp.transpose(w_blk_cm, (2, 0, 1)),  # [B, Sr, dl]
                        rows_r, lid, fast=fast,
                    )
                )
            else:
                if fbuckets is not None:
                    # Masked costs need no zeroing here: their rvid is the
                    # all-zero dustbin one-hot column.
                    rvid_j = jnp.asarray(fast.rvid)
                    flat_rows = row_idx.reshape(-1)  # unique per (v, p)
                    for (l0, lb, kb, c0) in fbuckets:
                        wc = w_blk_cm[:, :, c0 : c0 + lb * kb].reshape(
                            dr_s, dl, lb, kb
                        )
                        vc = rvid_j[c0 : c0 + lb * kb].reshape(lb, kb)
                        w_parts = []
                        for start, width in _onehot_chunks(
                            fast.n_r, _FAST_MAX_ONEHOT, lb * kb
                        ):
                            oh_w = (
                                vc[:, :, None]
                                == (start + jnp.arange(width, dtype=jnp.int32))[None, None, :]
                            ).astype(dtype)  # [L_b, K_b, width]
                            w_parts.append(
                                jnp.einsum(
                                    "pdlk,lkv->dlvp", wc, oh_w,
                                    precision="highest",
                                )
                            )  # [dl, L_b, width, dr_s]
                        w_blocks = jnp.concatenate(w_parts, axis=2)
                        w_add = jnp.zeros((dl, lb, dr + pad), dtype=dtype)
                        w_add = w_add.at[:, :, flat_rows].add(
                            w_blocks.reshape(dl, lb, fast.n_r * dr_s)
                        )
                        w = w.at[:, l0 : l0 + lb].add(w_add)
                    continue
                wc = table_gather_cm(w_blk_cm)  # [Sr, dl, L, K]
                vc = jnp.take(
                    jnp.asarray(fast.rvid), tk, mode="fill",
                    fill_value=fast.n_r,
                ).reshape(L, k)
                w_parts = []
                for start, width in _onehot_chunks(
                    fast.n_r, _FAST_MAX_ONEHOT, L * k
                ):
                    oh_w = (
                        vc[:, :, None]
                        == (start + jnp.arange(width, dtype=jnp.int32))[None, None, :]
                    ).astype(dtype)  # [L, K, width]
                    w_parts.append(
                        jnp.einsum(
                            "pdlk,lkv->dlvp", wc, oh_w, precision="highest"
                        )
                    )  # [dl, L, width, dr_s]
                w_blocks = jnp.concatenate(w_parts, axis=2)
                w_add = jnp.zeros((dl, L, dr + pad), dtype=dtype)
                flat_rows = row_idx.reshape(-1)  # unique per (v, p)
                w_add = w_add.at[:, :, flat_rows].add(
                    w_blocks.reshape(dl, L, fast.n_r * dr_s)
                )
                w = w.at[:, :L].add(w_add)
            continue

        # Generic fallback: block scatter-adds need batch-major operands.
        a_rr = a_rr.at[rows_r[:, :, None], rows_r[:, None, :]].add(
            jnp.moveaxis(h_rr_cm, -1, 0)
        )
        b_r = b_r.at[rows_r].add(g_r_cm.T)
        h_ll = h_ll.at[:, :, lid].add(h_le_cm)
        g_l = g_l.at[:, lid].add(g_e_cm)
        if info.implicit:
            # Keep the coupling blocks per cost; masked costs are neutralized
            # by zeroing (their lid points at the dustbin anyway).
            wparts.append(
                _make_wpart(
                    info, bi, batch,
                    jnp.transpose(w_blk_cm, (2, 0, 1)),  # [B, Sr, dl]
                    rows_r, lid,
                    rvid=_generic_rvid(batch, layout, info),
                )
            )
        else:
            # [Sr, dl, B] → [dl, B, Sr] scatter into the components-major W.
            w = w.at[:, lid[:, None], rows_r].add(
                jnp.transpose(w_blk_cm, (1, 2, 0))
            )

    if info.implicit:
        w_out = tuple(wparts)
    else:
        if info.w_pm is not None:
            # P-major W arrives straight from the placement kernel in its
            # landmark-minor [dl, dr_s*nrp, L] form (hole/fixed columns are
            # zero and never read back in the standard basis).
            assert w.shape[-1] == L, w.shape
            w_out = w
        else:
            w_out = w[:, :L, :dr]
        w_out = w_out.astype(_w_dtype(dtype) if w_dtype is None else w_dtype)
    return total, (
        a_rr[:dr, :dr],
        b_r[:dr],
        h_ll[:, :, :L],
        g_l[:, :L],
        w_out,
    )
