"""Pallas TPU kernel: ragged sorted-run block reduction.

``segment_block_sum(data [N, D], starts [L+1]) -> out [L, D]`` where rows of
``data`` are grouped into L contiguous runs (``starts`` ascending, run l =
rows [starts[l], starts[l+1])).  This is the landmark-keyed reduction of
Schur assembly for *skewed* track-length distributions: the gather-table
fast path needs O(L·K_max) memory and XLA scatter serializes on duplicate
indices, while this kernel streams each run once from HBM (double-buffered
DMA) and is insensitive to skew.

Grid: one program per segment; run offsets arrive via scalar prefetch; the
data stays in HBM and is DMA'd in fixed-size chunks into VMEM scratch.

Falls back to ``jax.ops.segment_sum`` off-TPU; ``interpret=True`` is used in
CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Rows DMA'd per chunk (tuned for VMEM; D is padded to 128 lanes).
CHUNK = 256


def _kernel(starts_ref, data_ref, out_ref, scratch, sem):
    seg = pl.program_id(0)
    start = starts_ref[seg]
    end = starts_ref[seg + 1]
    count = end - start
    d = out_ref.shape[-1]

    num_chunks = pl.cdiv(count, jnp.int32(CHUNK))

    def body(c, acc):
        offset = start + c * CHUNK
        take = jnp.minimum(CHUNK, count - c * CHUNK)
        dma = pltpu.make_async_copy(
            data_ref.at[pl.ds(offset, CHUNK), :],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, d), 0)
        masked = jnp.where(row_ids < take, scratch[:, :], 0.0)
        return acc + jnp.sum(masked, axis=0)

    acc = jax.lax.fori_loop(
        0, num_chunks, body, jnp.zeros((d,), dtype=out_ref.dtype)
    )
    out_ref[0, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_block_sum(data, starts, interpret: bool = False):
    """Sum contiguous runs of rows: ``out[l] = data[starts[l]:starts[l+1]].sum(0)``.

    ``data`` must be padded with at least CHUNK extra zero rows beyond the
    last run (DMA reads fixed-size chunks).  ``starts`` is int32 [L+1].
    """
    n, d = data.shape
    num_segments = starts.shape[0] - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_segments,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, d), lambda i, starts: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, d), data.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments, d), data.dtype),
        interpret=interpret,
    )(starts, data)


def segment_block_sum_reference(data, starts):
    """Pure-XLA reference implementation (also the non-TPU fallback)."""
    num_segments = starts.shape[0] - 1
    n = data.shape[0]
    row = jnp.arange(n, dtype=jnp.int32)
    seg_of_row = jnp.searchsorted(starts[1:], row, side="right")
    in_range = row < starts[-1]
    seg_of_row = jnp.where(in_range, seg_of_row, num_segments)
    return jax.ops.segment_sum(
        data, seg_of_row, num_segments=num_segments + 1
    )[:num_segments]
