"""Water-filling allocator: exact-budget and cap invariants, plus agreement
with a torch oracle implementing the reference algorithm
(layer_single_base_pruner.py:247-314) on non-degenerate inputs."""

import numpy as np
import pytest
import torch

from ecoflap_tpu.pruning.allocator import UniformSparsity, compute_sparsity_per_group


def oracle_reference(total_keep, group_scores, group_num_parameters, max_sp):
    """Torch reimplementation of compute_the_sparsity_per_group from its spec
    (common path only: proportional ceil-distribution with saturation)."""
    scores = torch.FloatTensor(list(group_scores.values()))
    num_parameters = torch.LongTensor(list(group_num_parameters.values()))
    keep = torch.ceil(num_parameters * (1 - max_sp)).int().to(torch.int64)

    guard = 0
    while keep.sum() < total_keep and guard < 1000:
        guard += 1
        total_ratio = torch.sum(scores)
        rest = total_keep - keep.sum()
        add = torch.ceil((scores / total_ratio) * rest).to(torch.int64)
        keep = keep + add
        scores[keep >= num_parameters] = 0
        keep = torch.clamp(keep, max=num_parameters)
        if add.sum() == 0:
            break
        if keep.sum() > total_keep:
            # reference's overshoot branch has a sign bug (+= instead of -=,
            # layer_single_base_pruner.py:301); oracle applies the intended
            # subtraction, matching our documented fix
            need = keep.sum() - total_keep
            order = torch.argsort(keep, descending=True, stable=True)
            floors = torch.ceil(num_parameters * (1 - max_sp)).to(torch.int64)
            for idx in order:
                removable = min(int(need), int(keep[idx] - floors[idx]))
                keep[idx] -= removable
                need -= removable
                if need <= 0:
                    break
    out = {}
    for k, kp, n in zip(group_scores, keep, num_parameters):
        out[k] = float(torch.clamp(1 - kp / n, 0, 1))
    return out


def test_exact_budget_and_caps():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n_groups = int(rng.integers(2, 30))
        sizes = {f"g{i}": int(rng.integers(100, 10000)) for i in range(n_groups)}
        scores = {f"g{i}": float(rng.uniform(0, 10)) for i in range(n_groups)}
        total = sum(sizes.values())
        sparsity = float(rng.uniform(0.2, 0.7))
        max_sp = min(1.0, sparsity + float(rng.uniform(0.05, 0.3)))
        budget = int(total * (1 - sparsity))

        out = compute_sparsity_per_group(budget, scores, sizes, max_sp)
        kept = sum(round((1 - out[k]) * sizes[k]) for k in sizes)
        assert kept == budget, (trial, kept, budget)
        for k in sizes:
            assert out[k] <= max_sp + 1e-9
            assert 0.0 <= out[k] <= 1.0


def test_higher_score_gets_lower_sparsity():
    sizes = {"a": 1000, "b": 1000, "c": 1000}
    scores = {"a": 10.0, "b": 1.0, "c": 0.1}
    out = compute_sparsity_per_group(1500, scores, sizes, max_sparsity_per_layer=0.9)
    assert out["a"] <= out["b"] <= out["c"]


def test_uniform_scores_give_uniform_sparsity():
    sizes = {f"g{i}": 1000 for i in range(4)}
    scores = {f"g{i}": 1.0 for i in range(4)}
    out = compute_sparsity_per_group(2000, scores, sizes, max_sparsity_per_layer=0.8)
    vals = list(out.values())
    assert max(vals) - min(vals) < 0.01


def test_matches_reference_oracle():
    rng = np.random.default_rng(42)
    for trial in range(10):
        n_groups = int(rng.integers(3, 15))
        sizes = {f"g{i}": int(rng.integers(500, 5000)) for i in range(n_groups)}
        scores = {f"g{i}": float(rng.uniform(0.1, 5)) for i in range(n_groups)}
        total = sum(sizes.values())
        budget = int(total * 0.5)
        max_sp = 0.7

        ours = compute_sparsity_per_group(budget, scores, sizes, max_sp)
        ref = oracle_reference(budget, scores, sizes, max_sp)
        for k in sizes:
            assert ours[k] == pytest.approx(ref[k], abs=2e-3), (trial, k)


def test_budget_clipped_to_feasible_range():
    sizes = {"a": 1000, "b": 1000}
    scores = {"a": 1.0, "b": 1.0}
    # infeasible budget (smaller than the keep floors) gets clipped
    out = compute_sparsity_per_group(10, scores, sizes, max_sparsity_per_layer=0.5)
    for k in sizes:
        assert out[k] <= 0.5 + 1e-9


def test_uniform_sparsity_object():
    u = UniformSparsity(0.5)
    assert u["anything"] == 0.5
    assert "whatever" in u


def _reference_allocator(total_keep, group_scores, group_num_parameters,
                         max_sparsity_per_layer=0.8):
    """Behavioral oracle: faithful numpy port of the reference
    compute_the_sparsity_per_group (layer_single_base_pruner.py:247-314),
    INCLUDING its overshoot sign bug (:301, `+=` where `-=` was meant).
    Test-oracle reimplementation, labeled as such."""
    import numpy as np

    keys = list(group_scores.keys())
    scores = np.asarray([group_scores[k] for k in keys], np.float64)
    num_params = np.asarray([group_num_parameters[k] for k in keys], np.int64)
    keep = np.ceil(num_params * (1 - max_sparsity_per_layer)).astype(np.int64)

    while keep.sum() < total_keep:
        rest = total_keep - keep.sum()
        add = np.ceil(scores / scores.sum() * rest).astype(np.int64)
        keep = keep + add
        scores[keep >= num_params] = 0
        keep = np.minimum(keep, num_params)
        if add.sum() == 0 and keep.sum() < total_keep:
            need = total_keep - keep.sum()
            for idx in np.where(scores > 0)[0]:
                can = min(need, int(num_params[idx] - keep[idx]))
                keep[idx] += can
                need -= can
                if need == 0:
                    break
        if keep.sum() > total_keep:
            need_remove = int(keep.sum() - total_keep)
            for idx in np.argsort(-keep, kind="stable"):
                can = min(need_remove,
                          int(keep[idx] - int(num_params[idx] * (1 - max_sparsity_per_layer))))
                keep[idx] += can  # the reference's sign bug, reproduced
                need_remove -= can
                if need_remove == 0:
                    break
    return {k: float(np.clip(1 - kp / n, 0, 1))
            for k, kp, n in zip(keys, keep, num_params)}, int(keep.sum())


def test_overshoot_equivalence_vs_reference_on_published_profile():
    """Replay a published-config-shaped group profile (BLIP-2 XL, block
    granularity: 39 ViT + 24 enc + 24 dec groups, keep 0.5, cap 0.6 —
    scripts/blip2/ecoflap_zeroth.py) through our sign-fixed allocator and a
    faithful reference oracle. The reference's overshoot branch DOES trigger
    (the ceil step overshoots by up to #groups), but its sign bug inflates
    the kept total by only O(#groups) out of O(1e9) — ratios agree to float
    noise while ours keeps the budget exact."""
    import numpy as np

    rng = np.random.default_rng(0)
    groups, counts = {}, {}
    for i in range(39):  # EVA-ViT-g block: qkv+proj+fc1+fc2 params
        counts[f"visual_encoder.blocks.{i}"] = 1408 * (3 * 1408 + 1408 + 2 * 6144)
    for i in range(24):  # T5-XL encoder block
        counts[f"t5_model.encoder.block.{i}"] = 4 * 2048 * 2048 + 3 * 2048 * 5120
    for i in range(24):  # T5-XL decoder block
        counts[f"t5_model.decoder.block.{i}"] = 8 * 2048 * 2048 + 3 * 2048 * 5120
    for k in counts:
        groups[k] = float(rng.lognormal(0, 1))

    total = sum(counts.values())
    budget = int(total * 0.5)
    ours = compute_sparsity_per_group(budget, groups, counts, 0.6)
    ref, ref_kept = _reference_allocator(budget, groups, counts, 0.6)

    assert set(ours) == set(ref)
    # the sign bug parks ~2x the ceil-overshoot (O(#groups) params) on the
    # largest-keep group -> ratio divergence of a few 1e-6 on that group
    for k in ours:
        assert abs(ours[k] - ref[k]) < 1e-5, (k, ours[k], ref[k])
    # ours is exact; the reference overshoots by a negligible absolute amount
    kept_ours = sum(round((1 - ours[k]) * counts[k]) for k in ours)
    assert abs(kept_ours - budget) <= len(counts)  # ratio rounding only
    assert 0 <= ref_kept - budget <= 4 * len(counts)
