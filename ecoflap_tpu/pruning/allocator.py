"""Exact-budget water-filling sparsity allocator (ECoFLaP coarse stage, step 2).

Converts per-group importance scores into a per-group sparsity-ratio dict that
preserves the global parameter budget, mirroring
``LayerSparsity.compute_the_sparsity_per_group``
(LAVIS/lavis/compression/pruners/layer_single_base_pruner.py:247-314):

  1. every group starts with its keep-floor ``ceil(n_i * (1 - max_sparsity))``
     so no group exceeds ``max_sparsity_per_layer``;
  2. the remaining keep-budget is distributed proportionally to scores
     (``ceil(score_i / sum(scores) * rest)``), saturated groups' scores are
     zeroed, keeps are clamped to group size;
  3. fix-up loops make the kept-parameter total EXACTLY equal the budget.

Deviation from the reference (documented, intentional): the reference's
overshoot fix-up *adds* instead of subtracts
(``parameters_to_keep_per_group[index] += parameters_can_remove``,
layer_single_base_pruner.py:301 — a sign bug that inflates the budget whenever
the proportional step overshoots). We subtract, so the exact-budget invariant
``sum(keep) == total_to_keep`` always holds. The overshoot branch DOES
trigger on published configs (the ceil step overshoots by up to #groups
params), but the bug's magnitude is O(#groups) out of O(1e9) kept — ratios
agree with a faithful reference oracle to ~1e-6 on the BLIP-2 XL block
profile (tests/test_allocator.py overshoot-equivalence test).

This is deliberately host-side numpy: group counts are O(100), the arrays are
scalars per group, and exact integer arithmetic matters more than device
placement here. The expensive part of the coarse stage (the score computation)
lives in ``scores.py`` / ``mezo.py`` on the TPU.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def compute_sparsity_per_group(
    total_parameters_to_keep: int,
    group_scores: Mapping[str, float],
    group_num_parameters: Mapping[str, int],
    max_sparsity_per_layer: float = 0.8,
    max_iters: int = 10_000,
) -> Dict[str, float]:
    """Allocate per-group sparsity ratios preserving the global keep-budget.

    Args:
      total_parameters_to_keep: global number of parameters to keep.
      group_scores: importance score per group (already aggregated).
      group_num_parameters: parameter count per group.
      max_sparsity_per_layer: cap on any single group's sparsity.

    Returns:
      dict group-name -> sparsity ratio in [0, 1]; kept totals sum exactly to
      ``total_parameters_to_keep`` (clipped to the feasible range).
    """
    keys = list(group_scores.keys())
    scores = np.asarray([float(group_scores[k]) for k in keys], dtype=np.float64)
    num_params = np.asarray(
        [int(group_num_parameters[k]) for k in keys], dtype=np.int64
    )

    total = int(num_params.sum())
    # Feasible range: floors force at least ceil(n*(1-max_sp)) per group.
    floors = np.ceil(num_params * (1.0 - max_sparsity_per_layer)).astype(np.int64)
    budget = int(np.clip(total_parameters_to_keep, floors.sum(), total))

    keep = floors.copy()
    scores = scores.copy()

    for _ in range(max_iters):
        if keep.sum() >= budget:
            break
        total_score = scores.sum()
        rest = budget - keep.sum()
        if total_score > 0:
            add = np.ceil(scores / total_score * rest).astype(np.int64)
        else:
            add = np.zeros_like(keep)

        keep = keep + add
        scores[keep >= num_params] = 0  # saturated groups take no more
        keep = np.minimum(keep, num_params)

        if add.sum() == 0 and keep.sum() < budget:
            # Proportional step stuck (all remaining scores zero): distribute
            # the remainder greedily over groups that still have headroom
            # (reference fix-up at layer_single_base_pruner.py:269-286, but we
            # allow zero-score groups too so the budget is always reachable).
            need = budget - keep.sum()
            headroom = num_params - keep
            order = np.argsort(-headroom, kind="stable")
            for idx in order:
                if need <= 0:
                    break
                take = min(need, int(headroom[idx]))
                keep[idx] += take
                need -= take

        if keep.sum() > budget:
            # Overshoot: remove extras from the largest-keep groups, never
            # below the floor (sign-fixed version of
            # layer_single_base_pruner.py:288-306).
            need_remove = int(keep.sum() - budget)
            order = np.argsort(-keep, kind="stable")
            for idx in order:
                if need_remove <= 0:
                    break
                removable = min(need_remove, int(keep[idx] - floors[idx]))
                keep[idx] -= removable
                need_remove -= removable

    assert keep.sum() == budget, (keep.sum(), budget)
    assert np.all(keep >= floors) and np.all(keep <= num_params)

    sparsity = np.clip(1.0 - keep / num_params, 0.0, 1.0)
    return {k: float(s) for k, s in zip(keys, sparsity)}


class UniformSparsity:
    """Maps every key to the same ratio — the reference's
    ``uniform_sparsity_module`` (layer_single_base_pruner.py:327-331), returned
    when no granularity/grouping is requested."""

    def __init__(self, ratio: float):
        self.ratio = float(ratio)

    def __getitem__(self, key: str) -> float:
        return self.ratio

    def get(self, key: str, default=None) -> float:
        return self.ratio

    def __contains__(self, key: str) -> bool:
        return True

    def __repr__(self) -> str:
        return f"UniformSparsity({self.ratio})"
