"""Multi-device execution: residual batches sharded over a device mesh.

The reference is single-threaded/single-process (SURVEY.md §5: no MPI/NCCL).
The TPU-native scaling strategy (SURVEY.md §2 parallelism table, §7 step 8)
is **data parallelism over residual blocks**: each cost-type batch is sharded
on its batch dimension across the mesh's ``data`` axis, every device computes
the cost/gradient/Hessian contributions of its shard, and the (small) normal
equations are ``psum``-reduced over ICI so the reduced solve runs replicated.
Works for both the dense and the Schur-reduced backends because the system
pytree is just summed blockwise.

Used with real TPU meshes in production and with
``--xla_force_host_platform_device_count=N`` CPU meshes in tests and the
driver's multi-chip dry run.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import engine, iterators
from ..core.optimize import CompiledProblem
from ..core.problem import CostBatch

DATA_AXIS = "data"


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    """1-D ``data`` mesh over the first ``n_devices`` available devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def _repad_batch(batch: CostBatch, multiple: int) -> CostBatch:
    """Re-pad a batch so its padded length divides the device count."""
    b = batch.n_padded
    target = -(-b // multiple) * multiple
    if target == b:
        return batch
    extra = target - b

    def pad_leaf(l):
        pad_width = [(0, extra)] + [(0, 0)] * (np.asarray(l).ndim - 1)
        return np.pad(np.asarray(l), pad_width)

    return dataclasses.replace(
        batch,
        idx=tuple(pad_leaf(i) for i in batch.idx),
        params=None if batch.params is None else jtu.tree_map(pad_leaf, batch.params),
        mask=pad_leaf(batch.mask),
    )


@dataclasses.dataclass
class ParallelCompiled:
    """Drop-in replacement for :class:`CompiledProblem` whose ``cost`` and
    ``assemble`` run under ``shard_map`` with batch data sharded on the mesh
    and psum-reduced outputs."""

    base: CompiledProblem
    mesh: Mesh
    batches: list  # re-padded batches (arrays live host-side until sharded)
    batch_args: Any  # pytree of sharded device arrays

    @property
    def layout(self):
        return self.base.layout

    @property
    def dtype(self):
        return self.base.dtype

    @property
    def manifolds(self):
        return self.base.manifolds

    @property
    def schur_info(self):
        return self.base.schur_info

    def _rebuild(self, batch_args):
        return [
            dataclasses.replace(b, idx=tuple(i), params=p, mask=m)
            for b, (i, p, m) in zip(self.batches, batch_args)
        ]

    def _local_cost(self, variables, batch_args):
        c = engine.total_cost(self._rebuild(batch_args), variables, self.dtype)
        return jax.lax.psum(c, DATA_AXIS)

    def _local_assemble(self, variables, batch_args):
        bs = self._rebuild(batch_args)
        if self.schur_info is not None:
            from ..ops import schur

            # The gather/one-hot fast tables index the *global* batch; each
            # device only holds its shard, so use the generic scatter path.
            local_info = dataclasses.replace(self.schur_info, fast=())
            c, sys = schur.assemble_schur(
                bs, variables, self.layout, local_info, self.dtype
            )
        else:
            c, a, g = engine.assemble_dense(bs, variables, self.layout, self.dtype)
            sys = (a, g)
        return jax.lax.psum((c, sys), DATA_AXIS)

    def cost(self, variables):
        f = jax.shard_map(
            self._local_cost,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=P(),
        )
        return f(variables, self.batch_args)

    def assemble(self, variables):
        f = jax.shard_map(
            self._local_assemble,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=P(),
        )
        return f(variables, self.batch_args)

    def apply(self, variables, x):
        return self.base.apply(variables, x)

    def ctx(self) -> iterators.IterCtx:
        base_ctx = self.base.ctx()
        return dataclasses.replace(base_ctx, cost=self.cost)


def parallelize(compiled: CompiledProblem, mesh: Mesh) -> ParallelCompiled:
    """Shard a compiled problem's cost batches across ``mesh``."""
    n = int(np.prod(mesh.devices.shape))
    batches = [_repad_batch(b, n) for b in compiled.batches]
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def shard_leaf(l):
        return jax.device_put(l, sharding)

    batch_args = [
        (
            tuple(shard_leaf(i) for i in b.idx),
            None if b.params is None else jtu.tree_map(shard_leaf, b.params),
            shard_leaf(b.mask),
        )
        for b in batches
    ]
    return ParallelCompiled(
        base=compiled, mesh=mesh, batches=batches, batch_args=batch_args
    )
