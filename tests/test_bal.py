"""BAL model family tests: loader round-trip (native C++ parser vs numpy
fallback), Snavely residual ground truth, and end-to-end convergence with the
Schur backend on synthetic BAL data."""

import os

import numpy as np
import pytest

import nllstpu as nt
from nllstpu.models import bal
from nllstpu.models.ba import perturb_ba
from nllstpu.utils import native


def test_synthetic_zero_cost():
    data = bal.make_synthetic_bal(8, 64, obs_per_point=4)
    p, cams, pts = bal.make_bal_problem(data)
    # Measurements generated from ground truth → zero cost at the optimum.
    assert nt.cost(p) < 1e-18


def test_loader_roundtrip(tmp_path):
    data = bal.make_synthetic_bal(5, 17, obs_per_point=3)
    path = os.path.join(tmp_path, "toy.txt")
    bal.write_bal(path, data)
    loaded = bal.load_bal(path)
    for key in ("cameras", "points", "observations"):
        np.testing.assert_allclose(loaded[key], data[key], rtol=1e-15)
    np.testing.assert_array_equal(loaded["cam_idx"], data["cam_idx"])
    np.testing.assert_array_equal(loaded["pt_idx"], data["pt_idx"])


def test_native_loader_matches_numpy(tmp_path):
    lib = native._load()
    if lib is None:
        pytest.skip("native loader not built and g++ unavailable")
    data = bal.make_synthetic_bal(4, 11, obs_per_point=2)
    path = os.path.join(tmp_path, "toy.txt")
    bal.write_bal(path, data)
    nat = native.parse_bal(path)
    assert nat is not None
    for key in ("cameras", "points", "observations"):
        np.testing.assert_allclose(nat[key], data[key], rtol=1e-15)
    np.testing.assert_array_equal(nat["cam_idx"], data["cam_idx"])


def test_bal_optimize_schur():
    data = bal.make_synthetic_bal(8, 96, obs_per_point=5)
    p, cams, pts = bal.make_bal_problem(data)
    perturb_ba(p, pts, 0.01, seed=7)
    start = nt.cost(p)
    assert start > 1e-4
    result = nt.optimize(
        p, nt.Options(solver="schur", schur_family=bal.PT)
    )
    assert result.best_cost < start * 1e-12


def test_bal_robust_kernel():
    data = bal.make_synthetic_bal(8, 64, obs_per_point=4, noise=0.5)
    # Inject gross outliers into 5% of observations.
    rng = np.random.default_rng(3)
    k = data["observations"].shape[0]
    out = rng.choice(k, size=k // 20, replace=False)
    data["observations"][out] += 500.0
    p, cams, pts = bal.make_bal_problem(data, robust_width=5.0)
    perturb_ba(p, pts, 0.01, seed=7)
    result = nt.optimize(p, nt.Options(solver="schur", schur_family=bal.PT))
    assert result.best_cost < result.start_cost


def test_bal_ladybug_scale_schur_cg():
    """BAL Ladybug-49-ish scale (49 cameras, 7k points, ~28k observations)
    with the implicit Schur backend: a few LM iterations must reduce the
    cost by orders of magnitude (BASELINE.json config 5 at single-host
    test scale)."""
    data = bal.make_synthetic_bal(49, 7000, obs_per_point=4, noise=0.0)
    p, cams, pts = bal.make_bal_problem(data)
    perturb_ba(p, pts, 0.02, seed=11)
    start = nt.cost(p)
    result = nt.optimize(
        p,
        nt.Options(solver="schur_cg", schur_family=bal.PT, max_iters=8),
    )
    assert result.best_cost < start * 1e-6


def test_native_loader_adversarial_text(tmp_path):
    """Native (strtol/strtod) vs numpy parsing on a NON-trivial text file:
    scientific notation (both cases), explicit +, 17-significant-digit
    round-trip values, negative zero, tabs/multi-space/blank-line
    whitespace.  Guards against int/float text-parsing skew that synthetic
    writer-formatted data would never expose."""
    lib = native._load()
    if lib is None:
        pytest.skip("native loader not built and g++ unavailable")
    rng = np.random.default_rng(9)
    ncam, npt, nobs = 3, 5, 8
    cam_idx = rng.integers(0, ncam, nobs)
    pt_idx = rng.integers(0, npt, nobs)
    obs = rng.standard_normal((nobs, 2)) * np.array([1e-17, 1e14])
    cams = rng.standard_normal((ncam, 9)) * 10.0 ** rng.integers(-12, 12, (ncam, 9))
    cams[0, 0] = -0.0
    cams[1, 1] = 0.1 + 0.2  # 0.30000000000000004 — needs all 17 digits
    pts = rng.standard_normal((npt, 3))
    path = os.path.join(tmp_path, "adversarial.txt")
    with open(path, "w") as f:
        f.write(f"{ncam}  {npt}\t{nobs}\n\n")
        fmts = ["{:.17e}", "{:.17E}", "{:+.17e}"]
        for k in range(nobs):
            sep = "\t" if k % 2 else "   "
            f.write(
                f"{cam_idx[k]}{sep}{pt_idx[k]} "
                + fmts[k % 3].format(obs[k, 0])
                + " "
                + fmts[(k + 1) % 3].format(obs[k, 1])
                + "\n"
            )
        f.write("\n")
        for row in cams:
            for i, v in enumerate(row):
                f.write(fmts[i % 3].format(v) + ("\n" if i % 3 == 2 else " \t"))
            f.write("\n")
        for row in pts:
            f.write(" ".join("{:.17e}".format(v) for v in row) + "\n")

    nat = native.parse_bal(path)
    assert nat is not None
    # Reference: the pure-numpy fallback parser on the same bytes.
    raw = np.fromfile(path, sep=" ")
    body = raw[3:]
    ref_obs = body[: nobs * 4].reshape(nobs, 4)
    rest = body[nobs * 4 :]
    ref_cams = rest[: ncam * 9].reshape(ncam, 9)
    ref_pts = rest[ncam * 9 : ncam * 9 + npt * 3].reshape(npt, 3)
    np.testing.assert_array_equal(nat["cam_idx"], cam_idx)
    np.testing.assert_array_equal(nat["pt_idx"], pt_idx)
    # Bitwise: strtod and numpy must agree on correctly-rounded parsing.
    np.testing.assert_array_equal(nat["observations"], ref_obs[:, 2:4])
    np.testing.assert_array_equal(nat["cameras"], ref_cams)
    np.testing.assert_array_equal(nat["points"], ref_pts)
    # And the 17-digit values round-trip the original doubles exactly.
    np.testing.assert_array_equal(nat["cameras"], cams)
    np.testing.assert_array_equal(nat["observations"], obs)


def test_bal_cm_matches_per_cost():
    """The components-major BAL formulation (synthesized cm Jacobian via
    linearize + basis tangents) must match the per-cost vmapped path:
    identical cost, matching assembled Schur system, and the same
    converged optimum."""
    import jax
    import jax.numpy as jnp
    from nllstpu.core.optimize import compile_problem

    data = bal.make_synthetic_bal(6, 48, obs_per_point=4, noise=1e-3)

    def build(batched):
        p, cams, pts = bal.make_bal_problem(data, batched=batched)
        perturb_ba(p, pts, 0.01, seed=7)
        return p

    p_cm, p_ref = build("cm"), build(False)
    c_cm = compile_problem(p_cm, solver="schur", schur_family=bal.PT)
    c_ref = compile_problem(p_ref, solver="schur", schur_family=bal.PT)
    assert c_cm.batches[0].batched == "cm"
    v_cm, v_ref = p_cm.stacked_variables(), p_ref.stacked_variables()
    np.testing.assert_allclose(
        float(jax.jit(c_cm.cost)(v_cm)), float(jax.jit(c_ref.cost)(v_ref)),
        rtol=1e-13,
    )
    _, sys_cm = jax.jit(c_cm.assemble)(v_cm)
    _, sys_ref = jax.jit(c_ref.assemble)(v_ref)
    for name, a, b in zip("a_rr b_r h_ll g_l w".split(), sys_cm, sys_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-11, err_msg=name
        )
    r_cm = nt.optimize(p_cm, nt.Options(solver="schur", schur_family=bal.PT))
    r_ref = nt.optimize(p_ref, nt.Options(solver="schur", schur_family=bal.PT))
    np.testing.assert_allclose(
        float(r_cm.best_cost), float(r_ref.best_cost), rtol=1e-9
    )


def test_snavely_hand_jacobian_matches_synthesized():
    """The hand analytic cm Snavely Jacobian must match the synthesized
    (linearize + 12 basis-tangent passes) one, including at the tiny-angle
    series branch and with strong distortion."""
    import jax.numpy as jnp
    from nllstpu.core.problem import _auto_cm_jacobian

    rng = np.random.default_rng(5)
    b = 64
    cams = rng.standard_normal((9, b))
    cams[:3] *= 0.8  # exercise the large-angle branch
    cams[:3, :8] *= 1e-9  # and the θ²<1e-14 series branch
    cams[6] = 300.0 + 200.0 * rng.random(b)
    cams[7] = rng.standard_normal(b) * 1e-2
    cams[8] = rng.standard_normal(b) * 1e-3
    pts = rng.standard_normal((3, b))
    pts[2] += 6.0
    meas = rng.standard_normal((b, 2)) * 5.0
    auto = _auto_cm_jacobian(bal.snavely_residual_cm, (bal.CAM, bal.PT))
    r_a, j_a = auto(jnp.asarray(meas), jnp.asarray(cams), jnp.asarray(pts))
    r_h, j_h = bal.snavely_jacobian_cm(
        jnp.asarray(meas), jnp.asarray(cams), jnp.asarray(pts)
    )
    np.testing.assert_allclose(np.asarray(r_h), np.asarray(r_a), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(j_h), np.asarray(j_a), rtol=1e-8, atol=1e-10
    )


def test_bal_hand_jacobian_end_to_end():
    """make_bal_problem's default (hand Jacobian) converges to the same
    optimum as the synthesized-Jacobian build."""
    data = bal.make_synthetic_bal(6, 48, obs_per_point=4, noise=1e-3)

    def run(hand):
        p, cams, pts = bal.make_bal_problem(data, hand_jacobian=hand)
        perturb_ba(p, pts, 0.01, seed=7)
        return nt.optimize(p, nt.Options(solver="schur", schur_family=bal.PT))

    r_hand, r_auto = run(True), run(False)
    np.testing.assert_allclose(
        float(r_hand.best_cost), float(r_auto.best_cost), rtol=1e-9
    )


def test_bal_cm_fused_all_kernel(monkeypatch):
    """Real-data composition: BAL cm batch (synthesized Jacobian, dr_s=9
    Snavely cameras) through the whole-system fused kernel
    (NLLSTPU_W_IMPL=fused_all_interpret) matches the one-hot path."""
    import jax
    from nllstpu.core.optimize import compile_problem

    data = bal.make_synthetic_bal(5, 40, obs_per_point=4, noise=1e-3)

    def build():
        p, cams, pts = bal.make_bal_problem(data)
        perturb_ba(p, pts, 0.01, seed=7)
        return p, compile_problem(p, solver="schur", schur_family=bal.PT)

    monkeypatch.setenv("NLLSTPU_W_IMPL", "onehot")
    p1, c_ref = build()
    monkeypatch.setenv("NLLSTPU_W_IMPL", "fused_all_interpret")
    p2, c_f = build()
    assert c_f.schur_info.w_pm is not None
    cost_ref, sys_ref = jax.jit(c_ref.assemble)(p1.stacked_variables())
    cost_f, sys_f = jax.jit(c_f.assemble)(p2.stacked_variables())
    np.testing.assert_allclose(float(cost_f), float(cost_ref), rtol=1e-13)
    for name, a, b in zip("a_rr b_r h_ll g_l".split(), sys_f[:4], sys_ref[:4]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12, err_msg=name
        )
    n_r, nrp, dr_s, pm_of_std = c_f.schur_info.w_pm
    w_std = np.asarray(sys_f[4]).transpose(0, 2, 1)[:, :, pm_of_std]
    np.testing.assert_allclose(
        w_std, np.asarray(sys_ref[4]), rtol=1e-10, atol=1e-12
    )
