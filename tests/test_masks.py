"""Global/layerwise mask construction vs torch oracle
(layer_single_base_pruner.py:156-197)."""

import numpy as np
import torch

import jax.numpy as jnp

from ecoflap_tpu.pruning.masks import (
    global_mask,
    iterative_sparsity_schedule,
    layerwise_mask,
)


def torch_global_mask(importance, p, max_sp):
    scores = {k: torch.as_tensor(np.asarray(v)).clone() for k, v in importance.items()}
    for k, v in scores.items():
        num_to_set = int(v.numel() * (1 - max_sp))
        if num_to_set > 0:
            threshold, _ = torch.topk(v.flatten(), num_to_set, largest=True)
            threshold = threshold[-1]
            v[torch.where(v >= threshold)] = torch.finfo(v.dtype).max
    all_scores = torch.cat([t.flatten() for t in scores.values()])
    num_zero = int(p * all_scores.numel())
    threshold, _ = torch.topk(all_scores, num_zero, largest=False)
    threshold = threshold[-1]
    return {k: (v > threshold).float().numpy() for k, v in scores.items()}


def test_global_mask_matches_reference():
    rng = np.random.default_rng(0)
    imp = {
        "a": rng.uniform(size=(8, 16)).astype(np.float32),
        "b": rng.uniform(size=(4, 32)).astype(np.float32),
        "c": rng.uniform(size=(10, 10)).astype(np.float32),
    }
    for p, max_sp in [(0.5, 1.0), (0.3, 0.8), (0.7, 0.9)]:
        ours = global_mask({k: jnp.asarray(v) for k, v in imp.items()}, p, max_sp)
        ref = torch_global_mask(imp, p, max_sp)
        for k in imp:
            np.testing.assert_array_equal(np.asarray(ours[k]), ref[k])


def test_layerwise_mask():
    rng = np.random.default_rng(1)
    imp = {"a": rng.uniform(size=(8, 16)).astype(np.float32)}
    masks = layerwise_mask({k: jnp.asarray(v) for k, v in imp.items()}, 0.5)
    zeros = (np.asarray(masks["a"]) == 0).mean()
    assert abs(zeros - 0.5) < 0.02


def test_keep_floor_limits_per_tensor_sparsity():
    rng = np.random.default_rng(2)
    # tensor "b" has tiny scores: without a floor it would be fully pruned
    imp = {
        "a": rng.uniform(10, 20, size=(32, 32)).astype(np.float32),
        "b": rng.uniform(0, 0.1, size=(32, 32)).astype(np.float32),
    }
    masks = global_mask({k: jnp.asarray(v) for k, v in imp.items()}, 0.5, 0.6)
    b_sparsity = (np.asarray(masks["b"]) == 0).mean()
    # keep-floor is int-truncated (reference :161), so allow one-element slack
    assert b_sparsity <= 0.6 + 1.0 / imp["b"].size + 1e-6


def test_iterative_schedule():
    sched = iterative_sparsity_schedule(0.5, 3)
    assert len(sched) == 3
    np.testing.assert_allclose(sched[-1], 0.5)
    assert sched[0] < sched[1] < sched[2]
