"""Shared StackSpec plumbing for the model zoo.

Every model stores its blocks as stacked nested dicts whose 2-D linears live
under ``<local>.kernel`` in jax layout ``(in, out)``. These helpers build the
accessor closures each ``StackSpec`` needs, exposing torch-layout ``(out, in)``
weights at the pruning boundary (cf. targets.py docstring).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax

from ecoflap_tpu.core.pytree import get_leaf, set_leaf
from ecoflap_tpu.pruning.adapter import StackSpec

PyTree = Any


def kernel_get(
    bp: PyTree, local: str, local_to_path: Optional[Dict[str, str]] = None
) -> jax.Array:
    """Torch-layout (out, in) view of block-local linear ``local``.

    ``local_to_path`` maps reference-style local names (the public sparsity-key
    component, e.g. T5's ``layer.0.SelfAttention.q``) onto the model's internal
    tree path (``attn.q``)."""
    path = (local_to_path or {}).get(local, local)
    return get_leaf(bp, f"{path}.kernel").T


def kernel_set(
    bp: PyTree, local: str, w: jax.Array,
    local_to_path: Optional[Dict[str, str]] = None,
) -> PyTree:
    path = (local_to_path or {}).get(local, local)
    old = get_leaf(bp, f"{path}.kernel")
    return set_leaf(bp, f"{path}.kernel", w.T.astype(old.dtype))


def stacked_get_block(blocks_path: str, params: PyTree, i) -> PyTree:
    return jax.tree_util.tree_map(lambda a: a[i], get_leaf(params, blocks_path))


def stacked_set_block(blocks_path: str, params: PyTree, i, bp: PyTree) -> PyTree:
    blocks = get_leaf(params, blocks_path)
    new = jax.tree_util.tree_map(
        lambda full, b: full.at[i].set(b.astype(full.dtype)), blocks, bp
    )
    return set_leaf(params, blocks_path, new)


def make_stack(
    name: str,
    num_blocks: int,
    linear_names: Tuple[str, ...],
    per_row_mask: bool,
    prepare_inputs: Callable,
    block_forward: Callable,
    blocks_path: str = "blocks",
    local_to_path: Optional[Dict[str, str]] = None,
) -> StackSpec:
    """StackSpec over a stacked-blocks subtree at ``blocks_path``."""
    return StackSpec(
        name=name,
        num_blocks=num_blocks,
        linear_names=linear_names,
        per_row_mask=per_row_mask,
        prepare_inputs=prepare_inputs,
        block_forward=block_forward,
        get_block=functools.partial(stacked_get_block, blocks_path),
        set_block=functools.partial(stacked_set_block, blocks_path),
        weight_get=functools.partial(kernel_get, local_to_path=local_to_path),
        weight_set=functools.partial(kernel_set, local_to_path=local_to_path),
        blocks_path=blocks_path,
        local_to_path=local_to_path,
    )
