"""Coarse-stage orchestrator: importance scores -> per-layer sparsity dict.

Functional rebuild of ``LayerSparsity``
(LAVIS/lavis/compression/pruners/layer_single_base_pruner.py:120-561):

* empty group mapping              -> UniformSparsity(original_sparsity)
  (:327-331)
* score method "Real*"             -> 3-iteration real global pruning; the
  observed per-leaf zero fractions become the sparsity dict (:199-245,321-325)
* "MEZO-*" methods                 -> zeroth-order scalar scores (mezo.py)
* "Grad*" methods                  -> first-order tensors (first_order.py)
* aggregation per group: sum of per-element importance, optionally normalized
  by group parameter count ("_avg" suffix) (:362-377)
* water-filling allocation with per-group sparsity cap (allocator.py)
* optional per-submodel budget split (prune_per_model, :379-393).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ecoflap_tpu.pruning.allocator import (
    UniformSparsity,
    compute_sparsity_per_group,
)
from ecoflap_tpu.pruning.first_order import (
    first_order_group_sums,
    first_order_importance,
)
from ecoflap_tpu.pruning.masks import global_mask, iterative_sparsity_schedule
from ecoflap_tpu.pruning.mezo import mezo_group_sums, mezo_leaf_scores
from ecoflap_tpu.pruning.targets import WeightTarget

PyTree = Any
LossFn = Callable[[PyTree, Any], jax.Array]
SparsityDict = Union[Dict[str, float], UniformSparsity]


def _mk_progress(verbose, on_progress, fmt):
    """Progress callback combining the verbose print with an optional
    machine hook (phase instrumentation); None when neither is wanted."""
    if not verbose and on_progress is None:
        return None
    t0 = time.time()

    def cb(*a):
        if on_progress is not None:
            on_progress(int(a[0]))
        if verbose:
            print(fmt(*a, time.time() - t0))

    return cb


def _split_method(score_method: str):
    compute, aggregate = score_method.split("_")
    return compute, aggregate


def compute_layer_sparsity(
    loss_fn: LossFn,
    params: PyTree,
    data: Any,
    num_microbatches: int,
    targets: List[WeightTarget],
    original_sparsity: float,
    layer_to_group_mapping: Optional[Mapping[str, str]],
    max_sparsity_per_layer: float = 0.8,
    score_method: str = "MEZO-GradOnly_sum",
    num_noise: int = 1,
    noise_eps: float = 1e-3,
    prune_per_model: bool = False,
    per_model_group: Sequence[str] = (),
    key: Optional[jax.Array] = None,
    noise_mode: str = "per_batch",
    first_order_batches: Optional[Sequence[Any]] = None,
    partition_prefixes: Optional[Sequence[str]] = None,
    loss_plans: Optional[Sequence[Any]] = None,
    eval_chunks: Optional[int] = None,
    verbose: bool = True,
    on_progress: Optional[Callable[[int], None]] = None,
) -> SparsityDict:
    """ECoFLaP coarse stage: per-layer sparsity ratios under a global budget.

    ``data`` is one stacked calibration batch (leading dim divisible by
    ``num_microbatches``); ``first_order_batches`` optionally provides the
    per-batch list used by gradient scoring (defaults to splitting ``data``).
    Returns a dict target-name -> sparsity (or UniformSparsity when no
    grouping is requested).
    """
    assert max_sparsity_per_layer >= original_sparsity, (
        "max_sparsity_per_layer must be >= the global target sparsity "
        "(layer_single_base_pruner.py:154)"
    )

    if layer_to_group_mapping is None or len(layer_to_group_mapping) == 0:
        return UniformSparsity(original_sparsity)

    score_compute, score_aggregate = _split_method(score_method)
    by_name = {t.name: t for t in targets}
    scored_targets = [by_name[k] for k in layer_to_group_mapping if k in by_name]

    if score_compute.startswith("Real"):
        return _real_global_sparsity(
            loss_fn,
            params,
            data,
            num_microbatches,
            scored_targets,
            original_sparsity,
            score_compute[len("Real") :].lstrip("-") or "GradMagAbs",
            first_order_batches,
        )

    # ---- importance sums per target -------------------------------------
    if score_compute.startswith("MEZO"):
        leaf_scores = mezo_leaf_scores(
            loss_fn,
            params,
            data,
            num_microbatches,
            scored_targets,
            eps=noise_eps,
            num_noise=num_noise,
            key=key,
            noise_mode=noise_mode,
            loss_plans=loss_plans,
            eval_chunks=eval_chunks,
            progress=_mk_progress(
                verbose, on_progress,
                lambda i, n, dt: f"{i} {n} +{dt:.1f}s"),
        )
        importance_sums = mezo_group_sums(
            params, scored_targets, leaf_scores, score_compute
        )
    else:
        batches = first_order_batches
        if batches is None:
            batches = _split_batches(data, num_microbatches)
        importance_sums = first_order_group_sums(
            loss_fn, params, batches, scored_targets, score_compute,
            partition_prefixes=partition_prefixes,
            stream_plans=loss_plans,
            progress=_mk_progress(
                verbose, on_progress,
                lambda b, p, dt: f"grad batch {b} part {p} +{dt:.1f}s"),
        )

    # ---- group aggregation (return_sparsity, :343-377) -------------------
    group_scores: Dict[str, float] = {}
    group_num_parameters: Dict[str, int] = {}
    for t in scored_targets:
        g = layer_to_group_mapping[t.name]
        group_scores[g] = group_scores.get(g, 0.0) + float(importance_sums[t.name])
        group_num_parameters[g] = group_num_parameters.get(g, 0) + t.numel(params)
    if score_aggregate == "avg":
        for g in group_scores:
            group_scores[g] /= group_num_parameters[g]

    total_parameters = sum(group_num_parameters.values())
    total_to_keep = int(total_parameters * (1.0 - original_sparsity))

    # ---- allocation ------------------------------------------------------
    if prune_per_model:
        group_sparsity: Dict[str, float] = {}
        for prefix in per_model_group:
            sub_scores = {k: v for k, v in group_scores.items() if k.startswith(prefix)}
            sub_params = {
                k: v for k, v in group_num_parameters.items() if k.startswith(prefix)
            }
            sub_keep = int(sum(sub_params.values()) * (1.0 - original_sparsity))
            group_sparsity.update(
                compute_sparsity_per_group(
                    sub_keep, sub_scores, sub_params, max_sparsity_per_layer
                )
            )
    else:
        group_sparsity = compute_sparsity_per_group(
            total_to_keep, group_scores, group_num_parameters, max_sparsity_per_layer
        )

    if verbose:
        kept = sum(
            (1.0 - group_sparsity[g]) * n for g, n in group_num_parameters.items()
        )
        print(kept, total_to_keep)  # budget sanity print (:402-407)

    return {k: group_sparsity[v] for k, v in layer_to_group_mapping.items()}


def _split_batches(data: Any, num_microbatches: int) -> List[Any]:
    return [
        jax.tree_util.tree_map(
            lambda x: x.reshape(num_microbatches, -1, *x.shape[1:])[b], data
        )
        for b in range(num_microbatches)
    ]


def _real_global_sparsity(
    loss_fn: LossFn,
    params: PyTree,
    data: Any,
    num_microbatches: int,
    targets: List[WeightTarget],
    target_sparsity: float,
    score_compute: str,
    first_order_batches: Optional[Sequence[Any]],
    iterations: int = 3,
) -> Dict[str, float]:
    """'Real*' methods: actually prune globally for 3 iterations and read off
    the per-leaf sparsities (global_iterative_pruning, :199-245). Weights are
    functional so no restore step is needed."""
    batches = first_order_batches
    if batches is None:
        batches = _split_batches(data, num_microbatches)

    work = params
    masks: Optional[Dict[str, jax.Array]] = None
    for p_i in iterative_sparsity_schedule(target_sparsity, iterations):
        imp = first_order_importance(loss_fn, work, batches, targets, score_compute)
        if masks is not None:
            imp = {k: imp[k] * masks[k] for k in imp}
        masks = global_mask(imp, p_i, max_sparsity_per_layer=1.0)
        for t in targets:
            work = t.set(work, t.get(work) * masks[t.name].astype(t.dtype(params)))

    sparsity_dict = {}
    for t in targets:
        w = t.get(work)
        sparsity_dict[t.name] = float(jnp.mean((w == 0).astype(jnp.float32)))
    return sparsity_dict
