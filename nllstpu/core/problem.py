"""Problem definition: variable families + type-grouped cost batches.

Reference parity: src/problem.jl (``NLLSProblem``, ``addvariable!``,
``addcost!``, ``subproblem``) and src/VectorRepo.jl (the type-keyed cost
store).  The TPU-native translation (SURVEY.md §7): variables of one manifold
family are stacked into a single ``[n, *shape]`` array, and costs of one
*type* — same residual function, same kernel, same dependent families, same
parameter structure — form a padded struct-of-arrays batch evaluated by a
single vmapped kernel.  The reference achieves type-stable homogeneous inner
loops with ``VectorRepo``'s ``Dict{DataType, Vector}``; here the grouping is
explicit and the "inner loop" is one fused XLA computation per batch.

Host-side (numpy) index bookkeeping happens once per problem build; the
resulting integer arrays are trace-time constants of the compiled solver.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import numpy as np
import jax.numpy as jnp
import jax.tree_util as jtu

from .manifolds import Manifold
from .robust import AdaptiveRobustifier, NoRobust, Robustifier

#: Batch padding granularity.  Cost batches are padded to a multiple of this
#: so recompilation is avoided for small count changes and batch dims stay
#: friendly to lane tiling.
BATCH_ALIGN = 8


def family_name(manifold: Manifold) -> str:
    """Stable string key for a variable family (dict pytree keys must be
    orderable, so we key the variable dict by this rather than the manifold
    object itself)."""
    return repr(manifold)


@dataclasses.dataclass(frozen=True)
class VarHandle:
    """Reference to a single variable block: (family, index-within-family).
    Plays the role of the reference's integer index into
    ``problem.variables`` (src/problem.jl:114-122)."""

    manifold: Manifold
    index: int

    @property
    def family(self) -> str:
        return family_name(self.manifold)


@dataclasses.dataclass
class _CostGroup:
    """Host-side accumulation of one cost type before finalization."""

    kind: str  # "residual" or "cost"
    fn: Callable
    kernel: Any
    families: tuple  # manifold per dependency slot
    params: list  # list of per-cost param pytrees
    indices: list  # list of per-cost tuples of variable indices


def _group_key(kind, fn, kernel, families, params_struct):
    return (kind, fn, kernel, families, params_struct)


@dataclasses.dataclass
class CostBatch:
    """Finalized, padded struct-of-arrays batch of one cost type."""

    kind: str
    fn: Callable
    kernel: Any
    adaptive: bool
    manifolds: tuple  # per slot
    idx: tuple  # per slot: int32 [B_pad] indices into the family array
    params: Any  # pytree with [B_pad, ...] leaves
    mask: Any  # bool [B_pad]; False for padding
    n: int  # true cost count

    @property
    def n_padded(self) -> int:
        return int(self.idx[0].shape[0]) if self.idx else int(self.mask.shape[0])

    @property
    def block_dof(self) -> int:
        """Total tangent dimension of one cost's variable block (kernel slot
        included for adaptive costs)."""
        return sum(m.dof for m in self.manifolds)


class Problem:
    """User-facing problem container (reference ``NLLSProblem``).

    Usage::

        p = Problem()
        x = p.add_variable(Scalar(), 0.0)
        p.add_cost(lambda params, x: params * (1.0 - x), (x,), params=1.0)
        result = optimize(p)
    """

    def __init__(self, dtype=None):
        from .. import config

        self.dtype = dtype or config.default_dtype
        # family name -> (manifold, list of numpy values)
        self._families: dict = {}
        self._groups: dict = {}
        self._group_order: list = []
        self._dirty = True
        self._built = None

    # -- variables ---------------------------------------------------------

    def add_variable(self, manifold: Manifold, value) -> VarHandle:
        """Add a variable block; returns its handle
        (reference ``addvariable!``, src/problem.jl:114-122)."""
        name = family_name(manifold)
        if name not in self._families:
            self._families[name] = (manifold, [])
        man, values = self._families[name]
        value = np.asarray(value, dtype=self.dtype)
        if value.shape != man.shape:
            raise ValueError(
                f"variable value shape {value.shape} != manifold shape {man.shape}"
            )
        values.append(value)
        self._dirty = True
        return VarHandle(manifold, len(values) - 1)

    def num_variables(self) -> int:
        return sum(len(v) for _, v in self._families.values())

    def get_value(self, handle: VarHandle):
        return self._families[handle.family][1][handle.index]

    def set_value(self, handle: VarHandle, value):
        man, values = self._families[handle.family]
        values[handle.index] = np.asarray(value, dtype=self.dtype)
        self._dirty = True

    def set_values(self, variables: dict):
        """Write back a solver-produced variables dict (family -> stacked
        array) into the host-side store."""
        for name, arr in variables.items():
            man, values = self._families[name]
            arr = np.asarray(arr)
            for i in range(len(values)):
                values[i] = arr[i]
        self._dirty = True

    # -- costs -------------------------------------------------------------

    def add_cost(
        self,
        fn: Callable,
        variables: tuple,
        params: Any = None,
        kernel: Any = None,
        kind: str = "residual",
    ):
        """Add one cost block (reference ``addcost!``, src/problem.jl:90-107).

        ``fn(params, *values)`` must return the residual vector (``kind ==
        "residual"``; robustified as ½·ρ(‖r‖²)) or a scalar cost (``kind ==
        "cost"``, the reference's plain ``AbstractCost``; used as-is).

        For an adaptive kernel, pass ``kernel`` as an
        :class:`AdaptiveRobustifier` and make the *first* element of
        ``variables`` the kernel-parameter variable (reference convention:
        kernel is the first element of ``getvars``, src/residual.jl:46-47).
        ``fn`` receives only the non-kernel variables.
        """
        from .. import config

        variables = tuple(variables)
        if not variables:
            raise ValueError("a cost must depend on at least one variable")
        if len(variables) > config.MAX_ARGS:
            raise ValueError(f"at most {config.MAX_ARGS} variable blocks per cost")
        if kind not in ("residual", "cost"):
            raise ValueError(f"unknown cost kind {kind!r}")
        if kernel is None:
            kernel = NoRobust() if kind == "residual" else None
        adaptive = isinstance(kernel, AdaptiveRobustifier)
        if adaptive:
            if kind != "residual":
                raise ValueError("adaptive kernels only apply to residual costs")
            if variables[0].manifold != kernel.manifold:
                raise ValueError(
                    "first variable of an adaptive cost must live on the "
                    f"kernel's manifold {kernel.manifold}"
                )
        if kind == "cost" and kernel is not None and not adaptive:
            if not isinstance(kernel, NoRobust):
                raise ValueError("plain costs are not robustified")
            kernel = None
        for h in variables:
            man, values = self._families.get(h.family, (None, []))
            if man is None or not (0 <= h.index < len(values)):
                raise ValueError(f"unknown variable handle {h}")

        families = tuple(h.manifold for h in variables)
        params_struct = jtu.tree_structure(params)
        key = _group_key(kind, fn, kernel, families, params_struct)
        group = self._groups.get(key)
        if group is None:
            group = _CostGroup(kind, fn, kernel, families, [], [])
            self._groups[key] = group
            self._group_order.append(key)
        group.params.append(params)
        group.indices.append(tuple(h.index for h in variables))
        self._dirty = True

    def num_costs(self) -> int:
        """Reference ``countcosts(costnum, ...)`` (src/problem.jl:201-207)."""
        return sum(len(g.indices) for g in self._groups.values())

    # -- finalization ------------------------------------------------------

    def manifold_of(self, name: str) -> Manifold:
        return self._families[name][0]

    def family_names(self):
        return list(self._families.keys())

    def stacked_variables(self) -> dict:
        """Variables as a dict of stacked jnp arrays (the solver state)."""
        out = {}
        for name, (man, values) in self._families.items():
            out[name] = jnp.asarray(np.stack(values), dtype=self.dtype)
        return out

    def batches(self) -> list:
        """Finalize cost groups into padded CostBatch objects."""
        out = []
        for key in self._group_order:
            g = self._groups[key]
            n = len(g.indices)
            n_pad = -(-n // BATCH_ALIGN) * BATCH_ALIGN
            idx_arr = np.zeros((len(g.families), n_pad), dtype=np.int32)
            ind = np.array(g.indices, dtype=np.int32)  # [n, nslots]
            idx_arr[:, :n] = ind.T
            mask = np.zeros(n_pad, dtype=bool)
            mask[:n] = True

            def pad_leaf(*leaves):
                arr = np.stack([np.asarray(l) for l in leaves])
                padded = np.zeros((n_pad,) + arr.shape[1:], dtype=arr.dtype)
                padded[:n] = arr
                return jnp.asarray(padded)

            if g.params[0] is None:
                params = None
            else:
                params = jtu.tree_map(pad_leaf, *g.params)
            out.append(
                CostBatch(
                    kind=g.kind,
                    fn=g.fn,
                    kernel=g.kernel,
                    adaptive=isinstance(g.kernel, AdaptiveRobustifier),
                    manifolds=g.families,
                    idx=tuple(jnp.asarray(idx_arr[i]) for i in range(len(g.families))),
                    params=params,
                    mask=jnp.asarray(mask),
                    n=n,
                )
            )
        return out

    def subproblem(self, predicate) -> "Problem":
        """New problem sharing this problem's variables but keeping only the
        costs for which ``predicate(slot_handles) -> bool``
        (reference ``subproblem``, src/problem.jl:47-83)."""
        sub = Problem(dtype=self.dtype)
        sub._families = self._families  # shared, as in the reference
        for key in self._group_order:
            g = self._groups[key]
            for params, indices in zip(g.params, g.indices):
                handles = tuple(
                    VarHandle(man, i) for man, i in zip(g.families, indices)
                )
                if predicate(handles):
                    sub.add_cost(g.fn, handles, params=params, kernel=g.kernel, kind=g.kind)
        return sub

    def var_cost_counts(self) -> dict:
        """Per-family array counting how many costs touch each variable — the
        row sums of the reference's ``varcostmap`` incidence matrix
        (src/problem.jl:124-168)."""
        counts = {
            name: np.zeros(len(values), dtype=np.int64)
            for name, (_, values) in self._families.items()
        }
        for g in self._groups.values():
            for indices in g.indices:
                for man, i in zip(g.families, indices):
                    counts[family_name(man)][i] += 1
        return counts
