"""Pallas TPU kernel: ragged sorted-run block reduction.

``segment_block_sum(data [N, D], starts [L+1]) -> out [L, D]`` where rows of
``data`` are grouped into L contiguous runs (``starts`` ascending, run l =
rows [starts[l], starts[l+1])).  This is the landmark-keyed reduction of
Schur assembly for *skewed* track-length distributions: the gather-table
fast path needs O(L·K_max) memory and XLA scatter serializes on duplicate
indices, while this kernel streams each run once from HBM (chunked DMA) and
is insensitive to skew.

TPU tiling: output blocks must be (8, 128)-aligned, so each grid program
reduces SEGS_PER_PROGRAM=8 consecutive segments and the wrapper pads the
feature dimension to a multiple of 128 (and the segment count to a multiple
of 8), slicing the result back.  Run offsets arrive via scalar prefetch; the
data stays in HBM (memory_space=ANY) and is DMA'd in fixed-size chunks into
VMEM scratch.

Verified against ``jax.ops.segment_sum`` in interpret mode (CPU tests) and
compiled on a real v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Rows DMA'd per chunk.
CHUNK = 256
#: Segments reduced by one grid program (sublane alignment).
SEGS_PER_PROGRAM = 8


def _kernel(starts_ref, data_ref, out_ref, scratch, sem):
    block = pl.program_id(0)
    d = out_ref.shape[-1]

    # The per-program segment loop is unrolled with STATIC j (dynamic-index
    # stores into the output block don't legalize in Mosaic); the inner DMA
    # chunk loop keeps its dynamic trip count.  lax arithmetic avoids jnp
    # ufunc dispatch inside the Mosaic trace (RecursionError with x64 on).
    for j in range(SEGS_PER_PROGRAM):
        seg = jax.lax.add(jax.lax.mul(block, jnp.int32(SEGS_PER_PROGRAM)), jnp.int32(j))
        start = starts_ref[seg]
        end = starts_ref[jax.lax.add(seg, jnp.int32(1))]
        count = jax.lax.sub(end, start)
        num_chunks = jax.lax.div(
            jax.lax.add(count, jnp.int32(CHUNK - 1)), jnp.int32(CHUNK)
        )

        def chunk_body(c, acc, start=start, count=count):
            offset = jax.lax.add(start, jax.lax.mul(c, jnp.int32(CHUNK)))
            take = jnp.minimum(
                jnp.int32(CHUNK), jax.lax.sub(count, jax.lax.mul(c, jnp.int32(CHUNK)))
            )
            dma = pltpu.make_async_copy(
                data_ref.at[pl.ds(offset, CHUNK), :],
                scratch,
                sem,
            )
            dma.start()
            dma.wait()
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, d), 0)
            masked = jnp.where(row_ids < take, scratch[:, :], 0.0)
            # 2-D accumulator: Mosaic legalizes 2-D vectors only.
            return acc + jnp.sum(masked, axis=0, keepdims=True)

        acc = jax.lax.fori_loop(
            jnp.int32(0), num_chunks, chunk_body,
            jnp.zeros((1, d), dtype=out_ref.dtype),
        )
        out_ref[pl.ds(j, 1), :] = acc


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def _call(data, starts, num_segments: int, interpret: bool):
    d = data.shape[-1]
    grid = num_segments // SEGS_PER_PROGRAM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (SEGS_PER_PROGRAM, d),
            # i * 0 keeps both coordinates int32: a literal 0 traces as i64
            # under x64 and the mixed-type index map fails Mosaic
            # legalization.
            lambda i, starts: (i, i * 0),
            memory_space=pltpu.VMEM,
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


def segment_block_sum(data, starts, interpret: bool = False):
    """Sum contiguous runs of rows: ``out[l] = data[starts[l]:starts[l+1]].sum(0)``.

    ``data`` must be padded with at least CHUNK extra zero rows beyond the
    last run (DMA reads fixed-size chunks).  ``starts`` is int32 [L+1].
    Feature and segment counts are padded internally to TPU tile multiples.
    """
    n, d = data.shape
    num_segments = starts.shape[0] - 1
    d_pad = _round_up(max(d, 1), 128)
    l_pad = _round_up(max(num_segments, 1), SEGS_PER_PROGRAM)
    if d_pad != d:
        data = jnp.pad(data, ((0, 0), (0, d_pad - d)))
    if l_pad != num_segments:
        # Padding segments are empty runs at the end of the data.
        tail = jnp.full((l_pad - num_segments,), starts[-1], dtype=starts.dtype)
        starts = jnp.concatenate([starts, tail])
    out = _call(data, starts, l_pad, interpret)
    return out[:num_segments, :d]


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
