"""Pallas kernel tests (interpret mode on CPU): the ragged sorted-run block
reduction must match segment_sum for skewed run-length distributions."""

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
