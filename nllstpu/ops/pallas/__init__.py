"""Pallas TPU kernels for hot operations.

Currently: :func:`segment_block_sum` — ragged sorted-run block reduction
(skew-robust landmark accumulation).  The main assembly paths use gather
tables + one-hot MXU reductions (see ops/schur.py), which profiling showed
beat scatters by ~2.4x; this kernel covers the extreme-skew regime where the
table memory would blow up.
"""

from .segment_sum import segment_block_sum, segment_block_sum_reference

__all__ = ["segment_block_sum", "segment_block_sum_reference"]
