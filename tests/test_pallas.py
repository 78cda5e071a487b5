"""Pallas kernel tests (interpret mode on CPU): the ragged sorted-run block
reduction must match segment_sum for skewed run-length distributions."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from nllstpu.ops.pallas.segment_sum import (
    CHUNK,
    segment_block_sum,
    segment_block_sum_reference,
)


@pytest.mark.parametrize("seed,nseg", [(0, 7), (1, 32)])
def test_segment_block_sum_matches_reference(seed, nseg):
    rng = np.random.default_rng(seed)
    # Skewed run lengths, including empty runs and one much longer than CHUNK.
    lengths = rng.geometric(0.05, nseg)
    lengths[rng.integers(0, nseg)] = 0
    lengths[rng.integers(0, nseg)] = CHUNK * 2 + 17
    starts = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    n = int(starts[-1])
    d = 16
    data = rng.standard_normal((n + CHUNK, d)).astype(np.float32)
    data[n:] = 0.0  # DMA pad region

    out = segment_block_sum(jnp.asarray(data), jnp.asarray(starts), interpret=True)
    ref = segment_block_sum_reference(jnp.asarray(data), jnp.asarray(starts))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # And against a plain numpy loop.
    expect = np.stack(
        [data[starts[i] : starts[i + 1]].sum(axis=0) for i in range(nseg)]
    )
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_implicit_schur_pallas_segment_matches_scatter(monkeypatch):
    """The implicit-Schur solve with the pallas sorted-run reduction
    (interpret mode on CPU) must match the scatter implementation.

    The obs-major repack supersedes the sorted-run path (it needs no
    gather at all), so disable it here to keep the pallas machinery
    covered for batches that don't qualify for repacking."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import nllstpu as nt
    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_affine_ba, perturb_ba
    from nllstpu.ops import schur as schur_mod

    monkeypatch.setattr(schur_mod, "_OBS_MAJOR_MAX_RATIO", 0.0)
    p, cams, lmks = make_affine_ba(5, 12, 0.7)
    perturb_ba(p, lmks, 0.05, seed=3)
    compiled = compile_problem(p, solver="schur_cg", schur_family=nt.Euclidean(3))
    variables = p.stacked_variables()
    _, sys_i = jax.jit(compiled.assemble)(variables)
    ops_scatter = dataclasses.replace(
        compiled.schur_info.ops(), segment_impl="scatter"
    )
    ops_pallas = dataclasses.replace(
        compiled.schur_info.ops(), segment_impl="pallas_interpret"
    )
    # wparts carry sorted rows + starts; both impls must agree.
    assert sys_i[4][0].starts is not None
    x1 = ops_scatter.solve(sys_i, jnp.asarray(1e-3))
    x2 = ops_pallas.solve(sys_i, jnp.asarray(1e-3))
    np.testing.assert_allclose(x1, x2, rtol=1e-8, atol=1e-10)


def test_place_w_pm_matches_reference():
    """ops/pallas/w_place.place_w_pm (interpret) vs a numpy reference:
    arbitrary camera ids incl. dustbin (>= n_r), L not a tile multiple;
    p-major landmark-minor output [dl, dr_s*nrp, L]."""
    from nllstpu.ops.pallas.w_place import place_w_pm

    rng = np.random.default_rng(4)
    n_r, dr_s, dl, k_len, L = 11, 6, 3, 5, 300  # L % TILE_L != 0
    nrp = -(-n_r // 128) * 128
    we3 = rng.standard_normal((k_len, dl * dr_s, L)).astype(np.float32)
    vc2 = rng.integers(0, n_r + 2, (k_len, L)).astype(np.int32)  # dustbin too
    out = place_w_pm(jnp.asarray(we3), jnp.asarray(vc2), n_r, dr_s, dl,
                     interpret=True)
    assert out.shape == (dl, dr_s * nrp, L)
    expect = np.zeros((dl, dr_s * nrp, L), dtype=np.float32)
    for l in range(L):
        for k in range(k_len):
            v = vc2[k, l]
            if v >= n_r:
                continue
            for d in range(dl):
                for p in range(dr_s):
                    expect[d, p * nrp + v, l] += we3[k, d * dr_s + p, l]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6, atol=1e-6)


def _pm_to_std(sys_pm, info):
    """Un-permute a p-major landmark-minor W back to the standard
    [dl, L, Dr] layout."""
    n_r, nrp, dr_s, pm_of_std = info.w_pm
    return np.asarray(sys_pm[4]).transpose(0, 2, 1)[:, :, pm_of_std]


def test_assemble_pallas_w_pm_matches_onehot(monkeypatch):
    """Direct dual-sorted assembly with NLLSTPU_W_IMPL=pallas_interpret
    (p-major W layout) must reproduce the one-hot system exactly on a
    pinhole cm batch — W compared through the pm_of_std un-permutation,
    and the full solve + quad + dogleg fused solve compared end to end."""
    import jax

    import nllstpu as nt
    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    def build():
        p, cams, lmks = make_pinhole_ba(
            ncameras=5, nlandmarks=30, prop_visible=0.7, noise=1e-3,
            dtype=jnp.float64, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=2)
        c = compile_problem(p, solver="schur", schur_family=nt.Euclidean(3))
        return c, jax.jit(c.assemble)(p.stacked_variables())

    monkeypatch.delenv("NLLSTPU_W_IMPL", raising=False)
    c_ref, (cost_ref, sys_ref) = build()
    assert c_ref.schur_info.w_pm is None
    monkeypatch.setenv("NLLSTPU_W_IMPL", "pallas_interpret")
    c_pl, (cost_pl, sys_pl) = build()
    assert c_pl.schur_info.w_pm is not None
    np.testing.assert_allclose(cost_pl, cost_ref, rtol=1e-14)
    for a, b in zip(sys_pl[:4], sys_ref[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12,
                                   atol=1e-14)
    np.testing.assert_allclose(
        _pm_to_std(sys_pl, c_pl.schur_info), np.asarray(sys_ref[4]),
        rtol=1e-12, atol=1e-14,
    )
    ops_ref, ops_pl = c_ref.schur_info.ops(), c_pl.schur_info.ops()
    x_ref = np.asarray(ops_ref.solve(sys_ref, jnp.asarray(1e-3)))
    x_pl = np.asarray(ops_pl.solve(sys_pl, jnp.asarray(1e-3)))
    np.testing.assert_allclose(x_pl, x_ref, rtol=1e-9, atol=1e-12)
    q_ref = float(ops_ref.quad(sys_ref, jnp.asarray(x_ref)))
    q_pl = float(ops_pl.quad(sys_pl, jnp.asarray(x_ref)))
    np.testing.assert_allclose(q_pl, q_ref, rtol=1e-10)
    # The gradient curvature is gauge-invariant; the UNDAMPED Newton leg
    # x0 is not (7-DoF BA gauge → singular S, null-space component depends
    # on summation order) — compare x0 on a gauge-fixed problem below.
    _, g_ref = ops_ref.solve0_quad_grad(sys_ref)
    _, g_pl = ops_pl.solve0_quad_grad(sys_pl)
    np.testing.assert_allclose(float(g_pl), float(g_ref), rtol=1e-10)

    def build_fixed(cams_unfixed):
        p, cams, lmks = make_pinhole_ba(
            ncameras=5, nlandmarks=30, prop_visible=0.7, noise=1e-3,
            dtype=jnp.float64, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=2)
        c = compile_problem(
            p, solver="schur", schur_family=nt.Euclidean(3),
            unfixed=cams[2:] + lmks,
        )
        return c, jax.jit(c.assemble)(p.stacked_variables())

    monkeypatch.delenv("NLLSTPU_W_IMPL", raising=False)
    cf_ref, (_, fsys_ref) = build_fixed(True)
    monkeypatch.setenv("NLLSTPU_W_IMPL", "pallas_interpret")
    cf_pl, (_, fsys_pl) = build_fixed(True)
    assert cf_pl.schur_info.w_pm is not None  # fixed cams still qualify
    fx_ref, fg_ref = cf_ref.schur_info.ops().solve0_quad_grad(fsys_ref)
    fx_pl, fg_pl = cf_pl.schur_info.ops().solve0_quad_grad(fsys_pl)
    np.testing.assert_allclose(np.asarray(fx_pl), np.asarray(fx_ref),
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(float(fg_pl), float(fg_ref), rtol=1e-10)


def test_assemble_pallas_w_pm_fixed_cameras(monkeypatch):
    """The p-major layout keys columns by family variable id, so FIXED
    cameras (non-identity reduced rows) are supported: full optimize with
    NLLSTPU_W_IMPL=pallas_interpret matches the default path."""
    import nllstpu as nt
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    def run():
        p, cams, lmks = make_pinhole_ba(
            ncameras=6, nlandmarks=40, prop_visible=0.7, noise=1e-3,
            dtype=jnp.float64, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=7)
        return nt.optimize(
            p,
            nt.Options(solver="schur", schur_family=nt.Euclidean(3)),
            unfixed=cams[2:] + lmks,  # two cameras fixed
        )

    monkeypatch.delenv("NLLSTPU_W_IMPL", raising=False)
    r_ref = run()
    monkeypatch.setenv("NLLSTPU_W_IMPL", "pallas_interpret")
    r_pl = run()
    np.testing.assert_allclose(float(r_pl.best_cost), float(r_ref.best_cost),
                               rtol=1e-10)
    assert int(r_pl.num_iterations) == int(r_ref.num_iterations)


def test_assemble_fused_obs_matches_onehot(monkeypatch):
    """The fully-fused obs-major leg (NLLSTPU_W_IMPL=fused_interpret) must
    reproduce the default path's h_ll, g_l AND W (p-major layout, compared
    through the pm_of_std un-permutation) on a pinhole cm batch, including
    with fixed cameras; the damped solve must match end to end."""
    import jax

    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    def build(unfixed=None):
        p, cams, lmks = make_pinhole_ba(
            ncameras=5, nlandmarks=30, prop_visible=0.7, noise=1e-3,
            dtype=jnp.float64, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=2)
        c = compile_problem(
            p, solver="schur",
            schur_family=__import__("nllstpu").Euclidean(3),
            unfixed=None if unfixed is None else cams[2:] + lmks,
        )
        return c, jax.jit(c.assemble)(p.stacked_variables())

    for unfixed in (None, "fix2"):
        monkeypatch.delenv("NLLSTPU_W_IMPL", raising=False)
        c_ref, (cost_ref, sys_ref) = build(unfixed)
        monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_interpret")
        c_f, (cost_f, sys_f) = build(unfixed)
        assert c_f.schur_info.w_pm is not None
        np.testing.assert_allclose(cost_f, cost_ref, rtol=1e-14)
        for a, b in zip(sys_f[:4], sys_ref[:4]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14
            )
        np.testing.assert_allclose(
            _pm_to_std(sys_f, c_f.schur_info), np.asarray(sys_ref[4]),
            rtol=1e-12, atol=1e-14,
        )
        x_ref = np.asarray(c_ref.schur_info.ops().solve(sys_ref, jnp.asarray(1e-3)))
        x_f = np.asarray(c_f.schur_info.ops().solve(sys_f, jnp.asarray(1e-3)))
        np.testing.assert_allclose(x_f, x_ref, rtol=1e-9, atol=1e-12)


def test_reduce_s_matches_einsum():
    """ops/pallas/schur_reduce.reduce_s (interpret) vs the einsum chain:
    random W/H^-1/g_l incl. an L that is not a tile multiple."""
    from nllstpu.ops.pallas.schur_reduce import reduce_s

    rng = np.random.default_rng(7)
    for dl, L, dr in [(3, 300, 23), (2, 8, 5), (3, 512, 40)]:
        w = rng.standard_normal((dl, L, dr))
        a = rng.standard_normal((dl, dl, L))
        h_inv = np.einsum("del,fel->dfl", a, a)  # symmetric like the real one
        g_l = rng.standard_normal((dl, L))
        s_sum, rhs_sum = reduce_s(
            jnp.asarray(w), jnp.asarray(h_inv), jnp.asarray(g_l),
            interpret=True,
        )
        y = np.einsum("dlr,del->elr", w, h_inv)
        np.testing.assert_allclose(
            np.asarray(s_sum), np.einsum("elr,els->rs", y, w),
            rtol=1e-12, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(rhs_sum), np.einsum("elr,el->r", y, g_l),
            rtol=1e-12, atol=1e-12,
        )


def test_solve_pallas_reduce_matches_xla(monkeypatch):
    """SchurOps.solve / solve0_quad_grad with NLLSTPU_SOLVE_IMPL=
    pallas_interpret must match the default einsum path on an assembled
    pinhole system (damped and undamped)."""
    import jax

    import nllstpu as nt
    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    p, cams, lmks = make_pinhole_ba(
        ncameras=5, nlandmarks=30, prop_visible=0.7, noise=1e-3,
        dtype=jnp.float64, batched="cm",
    )
    perturb_ba(p, lmks, 0.03, seed=2)
    # Pin the 7-dof BA gauge (fix two cameras): the UNDAMPED reduced system
    # is otherwise singular and its Newton leg is meaningless to compare.
    c = compile_problem(
        p, solver="schur", schur_family=nt.Euclidean(3),
        unfixed=cams[2:] + lmks,
    )
    _, sys_d = jax.jit(c.assemble)(p.stacked_variables())
    ops = c.schur_info.ops()

    monkeypatch.delenv("NLLSTPU_SOLVE_IMPL", raising=False)
    x_ref = np.asarray(ops.solve(sys_d, jnp.asarray(1e-3)))
    x0_ref, ghg_ref = ops.solve0_quad_grad(sys_d)
    monkeypatch.setenv("NLLSTPU_SOLVE_IMPL", "pallas_interpret")
    x_pl = np.asarray(ops.solve(sys_d, jnp.asarray(1e-3)))
    x0_pl, ghg_pl = ops.solve0_quad_grad(sys_d)
    np.testing.assert_allclose(x_pl, x_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x0_pl), np.asarray(x0_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(ghg_pl), float(ghg_ref), rtol=1e-12)


def test_reduce_s_bf16_w():
    """reduce_s accepts a bf16-stored W (NLLSTPU_W_DTYPE=bf16) and
    accumulates in the h_inv dtype: outputs are f32 and match the einsum
    chain computed from the same (bf16-rounded) W."""
    from nllstpu.ops.pallas.schur_reduce import reduce_s

    rng = np.random.default_rng(13)
    dl, L, dr = 3, 200, 17
    w32 = rng.standard_normal((dl, L, dr)).astype(np.float32)
    a = rng.standard_normal((dl, dl, L)).astype(np.float32)
    h_inv = np.einsum("del,fel->dfl", a, a)
    g_l = rng.standard_normal((dl, L)).astype(np.float32)
    w_bf = jnp.asarray(w32).astype(jnp.bfloat16)
    s_sum, rhs_sum = reduce_s(
        w_bf, jnp.asarray(h_inv), jnp.asarray(g_l), interpret=True
    )
    assert s_sum.dtype == jnp.float32 and rhs_sum.dtype == jnp.float32
    w_r = np.asarray(w_bf).astype(np.float32)  # the rounded W the kernel saw
    y = np.einsum("dlr,del->elr", w_r, h_inv)
    # S runs the bf16x3 emulated-HIGH dot (f32 accumulation path): the
    # dropped lo.lo term is ~2^-18 per product, so cancelled sums carry
    # ~1e-3 relative error — the same arithmetic as XLA's HIGH S
    # contraction in the default solve.  The rhs dot stays HIGHEST.
    np.testing.assert_allclose(
        np.asarray(s_sum), np.einsum("elr,els->rs", y, w_r),
        rtol=2e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(rhs_sum), np.einsum("elr,el->r", y, g_l),
        rtol=2e-5, atol=2e-4,
    )


def test_solve_pallas_reduce_bf16_end_to_end(monkeypatch):
    """NLLSTPU_SOLVE_IMPL=pallas_interpret combined with
    NLLSTPU_W_DTYPE=bf16: the assembled bf16-W system solves through the
    fused kernel and matches the XLA path on the SAME system."""
    import jax

    import nllstpu as nt
    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    monkeypatch.setenv("NLLSTPU_W_DTYPE", "bf16")
    p, cams, lmks = make_pinhole_ba(
        ncameras=4, nlandmarks=24, prop_visible=0.8, noise=1e-3,
        dtype=jnp.float32, batched="cm",
    )
    perturb_ba(p, lmks, 0.03, seed=5)
    c = compile_problem(p, solver="schur", schur_family=nt.Euclidean(3))
    _, sys_b = jax.jit(c.assemble)(p.stacked_variables())
    assert sys_b[4].dtype == jnp.bfloat16
    ops = c.schur_info.ops()
    monkeypatch.delenv("NLLSTPU_SOLVE_IMPL", raising=False)
    x_ref = np.asarray(ops.solve(sys_b, jnp.asarray(1e-2)))
    monkeypatch.setenv("NLLSTPU_SOLVE_IMPL", "pallas_interpret")
    x_pl = np.asarray(ops.solve(sys_b, jnp.asarray(1e-2)))
    np.testing.assert_allclose(x_pl, x_ref, rtol=1e-4, atol=1e-6)


def test_reduce_s_lm_matches_einsum():
    """reduce_s_lm (landmark-minor p-major W) vs the einsum chain."""
    from nllstpu.ops.pallas.schur_reduce import reduce_s_lm

    rng = np.random.default_rng(17)
    dl, L, wc = 3, 300, 23
    w = rng.standard_normal((dl, wc, L))
    a = rng.standard_normal((dl, dl, L))
    h_inv = np.einsum("del,fel->dfl", a, a)
    g_l = rng.standard_normal((dl, L))
    s_sum, rhs_sum = reduce_s_lm(
        jnp.asarray(w), jnp.asarray(h_inv), jnp.asarray(g_l), interpret=True
    )
    y = np.einsum("drl,del->erl", w, h_inv)
    np.testing.assert_allclose(
        np.asarray(s_sum), np.einsum("erl,esl->rs", y, w),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(rhs_sum), np.einsum("erl,el->r", y, g_l),
        rtol=1e-12, atol=1e-12,
    )


def test_reduce_s_lm_damped_matches_reference():
    """reduce_s_lm_damped (in-kernel damped inverse + reduction, f32)
    vs batched_inv_spd_cm + the einsum chain — incl. λ=0 at an L that is
    not a tile multiple (the identity-padded h_ll blocks must keep the
    undamped solve finite) and a bf16-stored W."""
    from nllstpu.core.linearsolver import batched_inv_spd_cm
    from nllstpu.ops.pallas.schur_reduce import reduce_s_lm_damped

    rng = np.random.default_rng(23)
    for dl, L, wc, lam, w_dt in [
        (3, 300, 23, 0.0, np.float32),
        (3, 300, 23, 1e-2, np.float32),
        (2, 130, 17, 3.0, np.float32),
        (1, 64, 9, 0.5, np.float32),
        (3, 256, 23, 1e-3, jnp.bfloat16),
    ]:
        w = rng.standard_normal((dl, wc, L)).astype(np.float32)
        a = rng.standard_normal((dl, dl, L)).astype(np.float32)
        # SPD + diagonal boost so the λ=0 inverse is well conditioned.
        h_ll = np.einsum("del,fel->dfl", a, a) + 2.0 * np.eye(
            dl, dtype=np.float32
        )[:, :, None]
        g_l = rng.standard_normal((dl, L)).astype(np.float32)
        w_j = jnp.asarray(w).astype(w_dt)
        s_sum, rhs_sum, h_inv = reduce_s_lm_damped(
            w_j, jnp.asarray(h_ll), jnp.asarray(g_l), lam, interpret=True
        )
        h_inv_ref = np.asarray(
            batched_inv_spd_cm(
                jnp.asarray(h_ll)
                + lam * jnp.eye(dl, dtype=jnp.float32)[:, :, None]
            )
        )
        np.testing.assert_allclose(
            np.asarray(h_inv), h_inv_ref, rtol=1e-5, atol=1e-6
        )
        w_r = np.asarray(w_j).astype(np.float32)  # rounded if bf16-stored
        y = np.einsum("drl,del->erl", w_r, h_inv_ref)
        # S runs the bf16x3 emulated-HIGH dots (see test_reduce_s_bf16_w);
        # the rhs dot stays HIGHEST.
        np.testing.assert_allclose(
            np.asarray(s_sum), np.einsum("erl,esl->rs", y, w_r),
            rtol=2e-3, atol=5e-3,
        )
        np.testing.assert_allclose(
            np.asarray(rhs_sum), np.einsum("erl,el->r", y, g_l),
            rtol=1e-4, atol=1e-4,
        )
        assert np.all(np.isfinite(np.asarray(s_sum)))


def test_reduce_s_lm_damped_wide_panels():
    """Wide-wc damped reduce rides the column-PANELIZED body: wc=1152 is
    the Snavely 9-dof shape at >=128 lane-padded camera slots (VERDICT r4
    weak #2 — the register-accumulator body overflows scoped VMEM there,
    r4_queue15c.log leg 6).  Checks the gate split (narrow gate None, wide
    plan available) and numerical agreement with the XLA chain, including
    λ=0 at a non-tile-multiple L and bf16-stored W."""
    from nllstpu.core.linearsolver import batched_inv_spd_cm
    from nllstpu.ops.pallas.schur_reduce import (
        damped_solve_fits,
        damped_tile_l,
        damped_wide_plan,
        reduce_s_lm_damped,
    )

    assert damped_tile_l(3, 1152) is None
    assert damped_wide_plan(3, 1152) is not None
    assert damped_solve_fits(3, 1152)

    rng = np.random.default_rng(31)
    for dl, L, wc, lam, w_dt in [
        (3, 140, 1152, 0.0, np.float32),
        (3, 140, 1152, 1e-2, np.float32),
        (3, 130, 1152, 1e-3, jnp.bfloat16),
    ]:
        w = rng.standard_normal((dl, wc, L)).astype(np.float32)
        a = rng.standard_normal((dl, dl, L)).astype(np.float32)
        h_ll = np.einsum("del,fel->dfl", a, a) + 2.0 * np.eye(
            dl, dtype=np.float32
        )[:, :, None]
        g_l = rng.standard_normal((dl, L)).astype(np.float32)
        w_j = jnp.asarray(w).astype(w_dt)
        s_sum, rhs_sum, h_inv = reduce_s_lm_damped(
            w_j, jnp.asarray(h_ll), jnp.asarray(g_l), lam, interpret=True
        )
        h_inv_ref = np.asarray(
            batched_inv_spd_cm(
                jnp.asarray(h_ll)
                + lam * jnp.eye(dl, dtype=jnp.float32)[:, :, None]
            )
        )
        np.testing.assert_allclose(
            np.asarray(h_inv), h_inv_ref, rtol=1e-5, atol=1e-6
        )
        w_r = np.asarray(w_j).astype(np.float32)
        y = np.einsum("drl,del->erl", w_r, h_inv_ref)
        np.testing.assert_allclose(
            np.asarray(s_sum), np.einsum("erl,esl->rs", y, w_r),
            rtol=2e-3, atol=5e-3,
        )
        np.testing.assert_allclose(
            np.asarray(rhs_sum), np.einsum("erl,el->r", y, g_l),
            rtol=1e-4, atol=1e-4,
        )
        assert np.all(np.isfinite(np.asarray(s_sum)))


def test_solve_pallas_damped_matches_xla_f32():
    """SchurOps.solve with SOLVE_IMPL=pallas_interpret on an f32 pm-layout
    system (the damped-kernel path) matches the default XLA solve to the
    f32 HIGH-precision noise level."""
    import jax

    import nllstpu as nt
    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    def build():
        p, cams, lmks = make_pinhole_ba(
            ncameras=5, nlandmarks=30, prop_visible=0.7, noise=1e-3,
            dtype=jnp.float32, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=2)
        return compile_problem(
            p, solver="schur", schur_family=nt.Euclidean(3),
            unfixed=cams[2:] + lmks,
        ), p

    prev_w = os.environ.get("NLLSTPU_W_IMPL")
    prev_s = os.environ.get("NLLSTPU_SOLVE_IMPL")
    try:
        # Force the p-major W layout off-TPU so the pm damped path runs.
        os.environ["NLLSTPU_W_IMPL"] = "fused_all_interpret"
        os.environ.pop("NLLSTPU_SOLVE_IMPL", None)
        c, p = build()
        _, sys_d = jax.jit(c.assemble)(p.stacked_variables())
        ops = c.schur_info.ops()
        assert ops.pm is not None
        x_ref = np.asarray(ops.solve(sys_d, jnp.asarray(1e-3, jnp.float32)))
        x0_ref, ghg_ref = ops.solve0_quad_grad(sys_d)
        os.environ["NLLSTPU_SOLVE_IMPL"] = "pallas_interpret"
        x_pl = np.asarray(ops.solve(sys_d, jnp.asarray(1e-3, jnp.float32)))
        x0_pl, ghg_pl = ops.solve0_quad_grad(sys_d)
    finally:
        for k, v in (("NLLSTPU_W_IMPL", prev_w), ("NLLSTPU_SOLVE_IMPL", prev_s)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    scale = np.max(np.abs(x_ref))
    np.testing.assert_allclose(x_pl, x_ref, rtol=5e-3, atol=5e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(x0_pl), np.asarray(x0_ref), rtol=5e-3,
        atol=5e-4 * max(1.0, float(np.max(np.abs(np.asarray(x0_ref))))),
    )
    np.testing.assert_allclose(float(ghg_pl), float(ghg_ref), rtol=1e-4)


def test_pm_with_pallas_solve_end_to_end(monkeypatch):
    """W_IMPL=pallas_interpret (p-major W) combined with
    SOLVE_IMPL=pallas_interpret (reduce_s_lm) optimizes to the same result
    as the all-default path."""
    import nllstpu as nt
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    def run():
        p, cams, lmks = make_pinhole_ba(
            ncameras=6, nlandmarks=40, prop_visible=0.7, noise=1e-3,
            dtype=jnp.float64, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=9)
        return nt.optimize(
            p, nt.Options(solver="schur", schur_family=nt.Euclidean(3))
        )

    monkeypatch.delenv("NLLSTPU_W_IMPL", raising=False)
    monkeypatch.delenv("NLLSTPU_SOLVE_IMPL", raising=False)
    r_ref = run()
    monkeypatch.setenv("NLLSTPU_W_IMPL", "pallas_interpret")
    monkeypatch.setenv("NLLSTPU_SOLVE_IMPL", "pallas_interpret")
    r_pm = run()
    np.testing.assert_allclose(float(r_pm.best_cost), float(r_ref.best_cost),
                               rtol=1e-10)
    assert int(r_pm.num_iterations) == int(r_ref.num_iterations)

def test_assemble_fused_all_matches_onehot(monkeypatch):
    """The whole-system fused assembly (NLLSTPU_W_IMPL=fused_all_interpret)
    must reproduce the default path's ENTIRE system — a_rr and b_r now come
    from the in-kernel one-hot MXU contraction instead of the camera-major
    second Jacobian evaluation — on a pinhole cm batch, including with
    fixed cameras; the damped solve must match end to end."""
    import jax

    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    def build(unfixed=None):
        p, cams, lmks = make_pinhole_ba(
            ncameras=5, nlandmarks=30, prop_visible=0.7, noise=1e-3,
            dtype=jnp.float64, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=2)
        c = compile_problem(
            p, solver="schur",
            schur_family=__import__("nllstpu").Euclidean(3),
            unfixed=None if unfixed is None else cams[2:] + lmks,
        )
        return c, jax.jit(c.assemble)(p.stacked_variables())

    for unfixed in (None, "fix2"):
        monkeypatch.delenv("NLLSTPU_W_IMPL", raising=False)
        c_ref, (cost_ref, sys_ref) = build(unfixed)
        monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_all_interpret")
        c_f, (cost_f, sys_f) = build(unfixed)
        assert c_f.schur_info.w_pm is not None
        np.testing.assert_allclose(cost_f, cost_ref, rtol=1e-14)
        for name, a, b in zip("a_rr b_r h_ll g_l".split(), sys_f[:4],
                              sys_ref[:4]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14,
                err_msg=name,
            )
        np.testing.assert_allclose(
            _pm_to_std(sys_f, c_f.schur_info), np.asarray(sys_ref[4]),
            rtol=1e-12, atol=1e-14,
        )
        x_ref = np.asarray(
            c_ref.schur_info.ops().solve(sys_ref, jnp.asarray(1e-3))
        )
        x_f = np.asarray(c_f.schur_info.ops().solve(sys_f, jnp.asarray(1e-3)))
        np.testing.assert_allclose(x_f, x_ref, rtol=1e-9, atol=1e-12)


def test_assemble_fused_all_bf16_w(monkeypatch):
    """fused_all + NLLSTPU_W_DTYPE=bf16 on an f32 problem: W comes out of
    the kernel already bf16 (no downcast pass) and matches the f32 W within
    bf16 rounding; a_rr/b_r/h_ll/g_l stay full f32 precision."""
    import jax

    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    def build():
        p, cams, lmks = make_pinhole_ba(
            ncameras=5, nlandmarks=30, prop_visible=0.7, noise=1e-3,
            dtype=jnp.float32, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=2)
        c = compile_problem(
            p, solver="schur", schur_family=__import__("nllstpu").Euclidean(3)
        )
        return c, jax.jit(c.assemble)(p.stacked_variables())

    monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_all_interpret")
    monkeypatch.delenv("NLLSTPU_W_DTYPE", raising=False)
    c32, (_, sys32) = build()
    assert sys32[4].dtype == jnp.float32
    monkeypatch.setenv("NLLSTPU_W_DTYPE", "bf16")
    c16, (_, sys16) = build()
    assert sys16[4].dtype == jnp.bfloat16
    for a, b in zip(sys16[:4], sys32[:4]):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sys16[4]).astype(np.float32), np.asarray(sys32[4]),
        rtol=1e-2, atol=1e-2,
    )


def _prior_residual_cm(params, v_cm):
    return v_cm - params.T


def test_fused_all_keeps_w_pm_with_priors(monkeypatch):
    """Real-BA composition: a BAL problem PLUS a point-prior batch (touches
    the eliminated family, single slot — h_ll/g_l only) PLUS a camera-prior
    batch (pure reduced) must keep the fused/p-major path for the
    observation batch, and the full assembled system must match the one-hot
    build."""
    import jax

    from nllstpu.core.optimize import compile_problem
    from nllstpu.models import bal
    from nllstpu.models.ba import perturb_ba

    data = bal.make_synthetic_bal(5, 40, obs_per_point=4, noise=1e-3)

    def build():
        p, cams, pts = bal.make_bal_problem(data, dtype=jnp.float64)
        rng = np.random.default_rng(4)
        p.add_cost_batch(
            _prior_residual_cm,
            slots=[(bal.PT, np.arange(0, 40, 3, dtype=np.int32))],
            params=data["points"][::3] + rng.standard_normal((14, 3)) * 0.01,
            batched="cm",
        )
        p.add_cost_batch(
            _prior_residual_cm,
            slots=[(bal.CAM, np.arange(5, dtype=np.int32))],
            params=data["cameras"] * 1.001,
            batched="cm",
        )
        perturb_ba(p, pts, 0.01, seed=7)
        c = compile_problem(p, solver="schur", schur_family=bal.PT)
        return p, c, jax.jit(c.assemble)(p.stacked_variables())

    monkeypatch.setenv("NLLSTPU_W_IMPL", "onehot")
    p1, c_ref, (cost_ref, sys_ref) = build()
    monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_all_interpret")
    p2, c_f, (cost_f, sys_f) = build()
    assert c_f.schur_info.w_pm is not None  # priors must not kill the path
    np.testing.assert_allclose(float(cost_f), float(cost_ref), rtol=1e-13)
    for name, a, b in zip("a_rr b_r h_ll g_l".split(), sys_f[:4], sys_ref[:4]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12, err_msg=name
        )
    np.testing.assert_allclose(
        _pm_to_std(sys_f, c_f.schur_info), np.asarray(sys_ref[4]),
        rtol=1e-10, atol=1e-12,
    )
    # End to end: both builds converge to the same optimum.
    import nllstpu as nt

    r_f = nt.optimize(p2, nt.Options(solver="schur", schur_family=bal.PT))
    monkeypatch.setenv("NLLSTPU_W_IMPL", "onehot")
    r_ref = nt.optimize(p1, nt.Options(solver="schur", schur_family=bal.PT))
    np.testing.assert_allclose(
        float(r_f.best_cost), float(r_ref.best_cost), rtol=1e-9
    )


def test_fused_all_keeps_w_pm_with_camera_skew(monkeypatch):
    """Skewed obs-per-camera degree distributions (real BAL) bail the
    camera-major repack; fused_all never uses it, so the p-major fused
    path must stay on and match the one-hot system."""
    import jax

    from nllstpu.core.optimize import compile_problem
    from nllstpu.models import bal
    from nllstpu.models.ba import perturb_ba

    # Heavily skewed camera degrees: camera 0 sees almost every point.
    rng = np.random.default_rng(8)
    ncam, npt, opp = 16, 40, 2
    data = bal.make_synthetic_bal(ncam, npt, obs_per_point=opp)
    prob = np.array([0.55] + [0.45 / (ncam - 1)] * (ncam - 1))
    for j in range(npt):
        cams = rng.choice(ncam, size=opp, replace=False, p=prob)
        data["cam_idx"][j * opp : (j + 1) * opp] = cams
    # Regenerate observations from ground truth for the new cam_idx.
    data = dict(data)

    def reproject(d):
        cams_cm = jnp.asarray(d["cameras"][d["cam_idx"]].T)
        pts_cm = jnp.asarray(d["points"][d["pt_idx"]].T)
        zero = jnp.zeros((d["cam_idx"].shape[0], 2))
        return np.asarray(bal.snavely_residual_cm(zero, cams_cm, pts_cm).T)

    data["observations"] = reproject(data)

    def build():
        p, cams, pts = bal.make_bal_problem(data, dtype=jnp.float64)
        perturb_ba(p, pts, 0.01, seed=7)
        return p, compile_problem(p, solver="schur", schur_family=bal.PT)

    monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_all_interpret")
    p2, c_f = build()
    fast = c_f.schur_info.fast[0]
    assert fast.cam_batch is None  # the skew killed the camera repack...
    assert c_f.schur_info.w_pm is not None  # ...but not the fused path
    cost_f, sys_f = jax.jit(c_f.assemble)(p2.stacked_variables())
    monkeypatch.setenv("NLLSTPU_W_IMPL", "onehot")
    p1, c_ref = build()
    cost_ref, sys_ref = jax.jit(c_ref.assemble)(p1.stacked_variables())
    np.testing.assert_allclose(float(cost_f), float(cost_ref), rtol=1e-13)
    for name, a, b in zip("a_rr b_r h_ll g_l".split(), sys_f[:4], sys_ref[:4]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12, err_msg=name
        )
    np.testing.assert_allclose(
        _pm_to_std(sys_f, c_f.schur_info), np.asarray(sys_ref[4]),
        rtol=1e-10, atol=1e-12,
    )


def test_w_pm_vmem_gate(monkeypatch):
    """Problems whose reduced space is too wide for the fused kernels'
    VMEM blocks must fall back to the standard W layout (w_pm None) even
    when NLLSTPU_W_IMPL requests a pallas path — Mosaic would otherwise
    fail at trace time on an oversized [dl, dr_s*nrp, TILE_L] block."""
    import nllstpu as nt
    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_all_interpret")

    def build(ncam):
        p, cams, lmks = make_pinhole_ba(
            ncameras=ncam, nlandmarks=40, prop_visible=2.0 / ncam,
            noise=1e-3, dtype=jnp.float64, batched="cm",
        )
        perturb_ba(p, lmks, 0.03, seed=2)
        return compile_problem(
            p, solver="schur", schur_family=nt.Euclidean(3)
        )

    assert build(5).schur_info.w_pm is not None  # nrp=128: fits
    # nrp = 384 (dr_s=6): too wide at 256 lanes but fits at the reduced
    # 128-lane tile (_fused_tile_l) — the fused path stays engaged.
    assert build(300).schur_info.w_pm is not None
    # nrp = 640: over budget at EVERY tile width under the corrected
    # (round-5 probe-calibrated) Mosaic staging model — 3 staged W blocks
    # at 128 lanes is already 17.7 MB — so the standard layout runs.  The
    # pre-probe model passed this shape; it was never compiled on-chip.
    assert build(520).schur_info.w_pm is None
    # nrp = 1280: over budget at EVERY tile width → standard layout.
    assert build(1200).schur_info.w_pm is None


def test_assemble_fused_all_robust_kernel(monkeypatch):
    """fused_all with a Huber-robustified pinhole batch: the in-kernel
    IRLS composition (rows scaled by rho', 2rho''*g0g0^T second-order term)
    must match the one-hot path on a problem where the robust weights are
    actually non-trivial (large noise drives some costs into the Huber
    tail)."""
    import jax

    from nllstpu.core.optimize import compile_problem
    from nllstpu.models.ba import make_pinhole_ba, perturb_ba

    def build():
        p, cams, lmks = make_pinhole_ba(
            ncameras=5, nlandmarks=30, prop_visible=0.7, noise=2e-2,
            robust_width=1e-2, dtype=jnp.float64, batched="cm",
        )
        perturb_ba(p, lmks, 0.05, seed=4)
        c = compile_problem(
            p, solver="schur", schur_family=__import__("nllstpu").Euclidean(3)
        )
        return c, jax.jit(c.assemble)(p.stacked_variables())

    monkeypatch.setenv("NLLSTPU_W_IMPL", "onehot")
    c_ref, (cost_ref, sys_ref) = build()
    monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_all_interpret")
    c_f, (cost_f, sys_f) = build()
    assert c_f.schur_info.w_pm is not None
    np.testing.assert_allclose(cost_f, cost_ref, rtol=1e-14)
    for name, a, b in zip("a_rr b_r h_ll g_l".split(), sys_f[:4], sys_ref[:4]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14, err_msg=name
        )
    np.testing.assert_allclose(
        _pm_to_std(sys_f, c_f.schur_info), np.asarray(sys_ref[4]),
        rtol=1e-12, atol=1e-14,
    )


def test_assemble_fused_all_dl2(monkeypatch):
    """fused_all kernel generality at dl=2 (2-D landmarks, Euclidean(4+2)
    affine observations, hand cm Jacobian): h_ll/g_l/W/a_rr/b_r must match
    the one-hot path — the kernel's unrolled loops are generic over
    (n, dl, dr_s), pinned here at a shape no other test covers."""
    import jax

    import nllstpu as nt
    from nllstpu.core.optimize import compile_problem

    rng = np.random.default_rng(11)
    ncam, nlmk = 4, 20
    cam0 = rng.standard_normal((ncam, 6)) * 0.2 + np.array(
        [1.0, 0, 0, 1.0, 0, 0]
    )
    lmk0 = rng.standard_normal((nlmk, 2))

    def residual(meas, cam, lmk):
        # cm layout: cam [6, B], lmk [2, B], meas [B, 2] -> r [2, B]
        m = meas.T
        r1 = cam[0] * lmk[0] + cam[1] * lmk[1] + cam[4] - m[0]
        r2 = cam[2] * lmk[0] + cam[3] * lmk[1] + cam[5] - m[1]
        return jnp.stack([r1, r2])

    def jacobian(meas, cam, lmk):
        r = residual(meas, cam, lmk)
        b = r.shape[-1]
        z = jnp.zeros((b,), r.dtype)
        o = jnp.ones((b,), r.dtype)
        # columns: cam tangent (6) then lmk tangent (2)
        j1 = jnp.stack([lmk[0], lmk[1], z, z, o, z, cam[0], cam[1]])
        j2 = jnp.stack([z, z, lmk[0], lmk[1], z, o, cam[2], cam[3]])
        return r, jnp.stack([j1, j2])

    ci0, li0, meas0 = [], [], []
    for lj in range(nlmk):
        for cj in range(ncam):
            ci0.append(cj)
            li0.append(lj)
            a = cam0[cj]
            A = np.array([[a[0], a[1]], [a[2], a[3]]])
            meas0.append(A @ lmk0[lj] + a[4:] + 0.01 * rng.standard_normal(2))

    def build():
        p = nt.Problem(dtype=jnp.float64)
        cams = [p.add_variable(nt.Euclidean(6), c) for c in cam0]
        lmks = [p.add_variable(nt.Euclidean(2), l) for l in lmk0]
        ci = [cams[c].index for c in ci0]
        li = [lmks[l].index for l in li0]
        meas = meas0
        p.add_cost_batch(
            residual,
            [(nt.Euclidean(6), np.array(ci)), (nt.Euclidean(2), np.array(li))],
            params=np.array(meas),
            jacobian=jacobian,
            batched="cm",
        )
        c = compile_problem(p, solver="schur", schur_family=nt.Euclidean(2))
        return c, jax.jit(c.assemble)(p.stacked_variables())

    monkeypatch.setenv("NLLSTPU_W_IMPL", "onehot")
    c_ref, (cost_ref, sys_ref) = build()
    monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_all_interpret")
    c_f, (cost_f, sys_f) = build()
    assert c_f.schur_info.w_pm is not None
    np.testing.assert_allclose(cost_f, cost_ref, rtol=1e-14)
    for name, a, b in zip("a_rr b_r h_ll g_l".split(), sys_f[:4], sys_ref[:4]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13, err_msg=name
        )
    np.testing.assert_allclose(
        _pm_to_std(sys_f, c_f.schur_info), np.asarray(sys_ref[4]),
        rtol=1e-12, atol=1e-13,
    )
