"""Weight targets — the bridge between reference-style weight names and the
functional (possibly stacked) parameter pytrees.

The reference addresses every prunable weight by its
``named_parameters`` string and mutates it in place. Here, model adapters
expose each prunable 2-D weight as a ``WeightTarget``: a named, functional
view into the params pytree. Stacked-block storage (one leaf of shape
``(L, in, out)`` per linear kind, the TPU-friendly layout for ``lax.scan``)
is supported via ``block_index`` slicing, so the per-block reference names
("visual.blocks.12.mlp.fc1.weight") remain the public API for sparsity
dicts (wanda_pruner.py:275,553) even though the storage is stacked.

Layout: params store jax-convention kernels ``(in, out)`` (or ``(L, in, out)``
stacked); ``get``/``set`` expose torch-layout ``(out, in)`` so all pruning
math matches the reference's row/column semantics exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.core.pytree import get_leaf, set_leaf

PyTree = Any


@dataclass(frozen=True)
class WeightTarget:
    """A named, functional view of one prunable 2-D weight."""

    name: str  # reference-style key, e.g. "t5_model.encoder.block.3.layer.0.SelfAttention.q.weight"
    tree_path: str  # dotted path to the pytree leaf holding it
    block_index: Optional[int] = None  # index into a stacked (L, ...) leaf
    transpose: bool = True  # leaf is (in, out); expose (out, in)
    group: str = ""  # coarse-stage group (filled by granularity mapping)

    def _leaf(self, params: PyTree) -> jax.Array:
        leaf = get_leaf(params, self.tree_path)
        if self.block_index is not None:
            leaf = leaf[self.block_index]
        return leaf

    def get(self, params: PyTree) -> jax.Array:
        """Torch-layout (out, in) weight view."""
        leaf = self._leaf(params)
        return leaf.T if self.transpose else leaf

    def set(self, params: PyTree, w: jax.Array) -> PyTree:
        """Functionally write a torch-layout (out, in) weight back."""
        val = w.T if self.transpose else w
        if self.block_index is None:
            return set_leaf(params, self.tree_path, val.astype(self.dtype(params)))
        full = get_leaf(params, self.tree_path)
        return set_leaf(
            params, self.tree_path, full.at[self.block_index].set(val.astype(full.dtype))
        )

    def add(self, params: PyTree, delta: jax.Array) -> PyTree:
        """Functionally add a torch-layout delta (MeZO perturbation)."""
        val = delta.T if self.transpose else delta
        if self.block_index is None:
            leaf = get_leaf(params, self.tree_path)
            return set_leaf(params, self.tree_path, leaf + val.astype(leaf.dtype))
        full = get_leaf(params, self.tree_path)
        return set_leaf(
            params, self.tree_path, full.at[self.block_index].add(val.astype(full.dtype))
        )

    def shape(self, params: PyTree) -> Tuple[int, ...]:
        s = self._leaf(params).shape
        return (s[1], s[0]) if self.transpose else s

    def numel(self, params: PyTree) -> int:
        leaf = self._leaf(params)
        return int(leaf.size)

    def dtype(self, params: PyTree):
        return self._leaf(params).dtype


def targets_by_name(targets: List[WeightTarget]) -> Dict[str, WeightTarget]:
    return {t.name: t for t in targets}


def total_numel(params: PyTree, targets: List[WeightTarget]) -> int:
    return sum(t.numel(params) for t in targets)
