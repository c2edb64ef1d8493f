"""Global / layerwise mask construction for the baseline global pruners.

Mirrors ``LayerSparsity.get_mask`` / ``get_layerwise_mask``
(LAVIS/lavis/compression/pruners/layer_single_base_pruner.py:156-197, also
duplicated in global_pruner.py:116-157):

* global mask: per tensor, the top ``(1 - max_sparsity)`` fraction of scores
  is promoted to +max (a keep-floor), then one global threshold at the p-th
  smallest concatenated score; mask keeps strictly-greater entries.
* layerwise mask: per-tensor threshold, same strict comparison.

Masks are float (1.0 = keep), matching the reference's multiply-in-place
convention. Importance scores are nonnegative (|W|, |W·G|, squares, |MeZO|),
so thresholds come from the sort-free bit-bisection selectors
(pruning/select.py) — the reference's ``torch.sort(concat(all))`` would both
pay a TPU sort AND materialize an O(total-params) concatenation (~15 GB at
BLIP-2 XL scale).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp

from ecoflap_tpu.pruning.select import (
    _bits,
    kth_smallest_bits,
    kth_smallest_bits_global,
)

_FINFO_MAX = float(jnp.finfo(jnp.float32).max)


def global_mask(
    importance: Mapping[str, jnp.ndarray],
    p: float,
    max_sparsity_per_layer: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """One global threshold over all tensors, with per-tensor keep-floors."""
    protected = {}
    total = 0
    for k, v in importance.items():
        v = v.astype(jnp.float32)
        total += v.size
        num_keep_floor = int(v.size * (1.0 - max_sparsity_per_layer))
        if num_keep_floor > 0:
            # (num_keep_floor)-th largest == ascending rank (size - floor)
            kth = kth_smallest_bits(
                _bits(v).reshape(1, -1), v.size - num_keep_floor)[0]
            v = jnp.where(_bits(v) >= kth, _FINFO_MAX, v)
        protected[k] = v

    num_zero = int(p * total)
    if num_zero <= 0:
        return {k: jnp.ones_like(v) for k, v in protected.items()}
    threshold = kth_smallest_bits_global(
        tuple(_bits(v).reshape(-1) for v in protected.values()), num_zero - 1
    )
    return {
        k: (_bits(v) > threshold).astype(jnp.float32)
        for k, v in protected.items()
    }


def layerwise_mask(
    importance: Mapping[str, jnp.ndarray], p: float
) -> Dict[str, jnp.ndarray]:
    """Per-tensor threshold at the p-th smallest value, keep strictly greater."""
    masks = {}
    for k, v in importance.items():
        v = v.astype(jnp.float32)
        num_zero = int(p * v.size)
        if num_zero <= 0:
            masks[k] = jnp.ones_like(v)
            continue
        thr = kth_smallest_bits(_bits(v).reshape(1, -1), num_zero - 1)[0]
        masks[k] = (_bits(v) > thr).astype(jnp.float32)
    return masks


def iterative_sparsity_schedule(target_sparsity: float, iterations: int):
    """p_i = target ** (iterations / i) — the reference's cubic ramp
    (global_pruner.py:166, layer_single_base_pruner.py:213)."""
    return [
        target_sparsity ** (iterations / i) for i in range(1, iterations + 1)
    ]
