"""Model-adapter protocol — the seam between the shared pruning core and the
model zoo.

The reference implements the same pruning logic 3-4 times (LAVIS, CoOp, UPop,
LLaMA image_classifiers — SURVEY.md §2.2) because each model family needs its
own module-walking, hook-wiring and kwargs-caching code. Here a model family
instead provides ONE adapter object describing:

* ``stacks`` — its prunable transformer stacks, each with functional
  ``prepare_inputs`` (everything before the stack, replacing the reference's
  ``Catcher``-raises-ValueError input capture, wanda_pruner.py:179-215) and
  ``block_forward`` (one block, optionally collecting per-linear activation
  statistics inline — replacing forward hooks, wanda_pruner.py:241-248);
* ``targets`` — every prunable 2-D weight as a named functional view
  (reference ``named_parameters`` naming preserved for sparsity dicts);
* ``loss_fn`` — the calibration loss, per-sample
  (loss_vision_language / loss_language / loss_vision,
  compression/pruners/utils.py:21-66);
* ``group_mapping`` — the granularity->grouping rule for the coarse stage
  (wanda_pruner.py:292-324,721-776).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax

from ecoflap_tpu.pruning.targets import WeightTarget

PyTree = Any

# collect mode: None (plain forward) | "wanda" (Σ x² per in-col) | "hessian"
# (Σ XᵀX per linear). Stats are raw sums; the engine normalizes by sequence
# count to match WrappedGPT.add_batch / SparseGPT.add_batch semantics.
CollectMode = Optional[str]


@dataclass
class StackSpec:
    """One prunable transformer stack (e.g. 'visual.blocks',
    't5_model.encoder.block')."""

    name: str  # reference module_to_process prefix used in sparsity keys
    num_blocks: int
    linear_names: Tuple[str, ...]  # local names, e.g. ("attn.qkv", "mlp.fc1")
    per_row_mask: bool  # T5-style per-row (True) vs ViT per-tensor (False)

    # (params, batch) -> (x0, cache); cache is a pytree of per-stack
    # side-inputs (attention masks, position biases, encoder states).
    prepare_inputs: Callable[[PyTree, Any], Tuple[jax.Array, Any]]
    # (block_params, x, cache, collect) -> (x_out, stats)
    block_forward: Callable[[PyTree, jax.Array, Any, CollectMode], Tuple[jax.Array, Dict[str, jax.Array]]]
    get_block: Callable[[PyTree, int], PyTree]
    set_block: Callable[[PyTree, int, PyTree], PyTree]
    # local linear access inside one block's params (torch layout (out, in))
    weight_get: Callable[[PyTree, str], jax.Array]
    weight_set: Callable[[PyTree, str, jax.Array], PyTree]
    # standard stacked-storage metadata (set by models.adapters.make_stack):
    # lets the core build direct path-addressed WeightTargets, enabling the
    # low-allocation donated perturbation path in mezo.py
    blocks_path: Optional[str] = None
    local_to_path: Optional[Dict[str, str]] = None

    def weight_key(self, i: int, local_name: str) -> str:
        """Reference-style sparsity-dict key (wanda_pruner.py:275,553)."""
        return f"{self.name}.{i}.{local_name}.weight"


@dataclass
class LossPlan:
    """A specialized (loss_fn, data) pair for a subset of MeZO targets.

    TPU-native optimization absent from the reference (which re-runs the FULL
    model for every group perturbation, layer_single_base_pruner.py:507-536):
    when a perturbation can only touch a suffix of the network, the frozen
    prefix's activations are precomputed once and the plan's loss starts from
    them — e.g. BLIP-2's T5-block groups reuse cached query embeddings,
    skipping the (dominant) ViT+Q-Former forward entirely.
    """

    match: Callable[[str], bool]  # target.name -> does this plan apply?
    loss_fn: Callable[[PyTree, Any], jax.Array]
    data: Any


@dataclass
class ModelAdapter:
    """Everything the pruning core needs to know about one model family."""

    name: str
    params: PyTree
    # (params, batch) -> (B,) per-sample calibration losses
    loss_fn: Callable[[PyTree, Any], jax.Array]
    stacks: List[StackSpec]
    # submodel prefix per stack, for prune_per_model grouping; e.g.
    # {"visual_encoder.blocks": "visual_encoder"}
    model_prefixes: Dict[str, str] = field(default_factory=dict)
    # optional (params, data, num_chunks=...) -> List[LossPlan] MeZO fast
    # paths; num_chunks streams any precompute at microbatch memory scale
    build_mezo_plans: Optional[Callable[..., List["LossPlan"]]] = None
    # False for losses whose per-sample values depend on the WHOLE batch
    # (in-batch negatives, e.g. CLIP InfoNCE): sub-chunking the loss eval
    # would silently shrink each sample's negative set. Microbatch-level
    # grouping stays reference-consistent (the reference also scores per
    # loader batch); only the memory sub-chunking is disabled.
    chunk_safe: bool = True

    def targets(self) -> List[WeightTarget]:
        """All prunable weights as functional views, reference-named."""
        out: List[WeightTarget] = []
        for stack in self.stacks:
            for i in range(stack.num_blocks):
                for local in stack.linear_names:
                    out.append(self._make_target(stack, i, local))
        return out

    def _make_target(self, stack: StackSpec, i: int, local: str) -> WeightTarget:
        # Standard stacked storage: direct path-addressed target (fast,
        # donation-friendly). Custom layouts fall back to accessor routing.
        if stack.blocks_path is not None:
            path = (stack.local_to_path or {}).get(local, local)
            return WeightTarget(
                name=stack.weight_key(i, local),
                tree_path=f"{stack.blocks_path}.{path}.kernel",
                block_index=i,
                transpose=True,
            )
        return StackWeightTarget(
            name=stack.weight_key(i, local),
            tree_path="",  # unused by StackWeightTarget
            block_index=i,
            stack=stack,
            local=local,
        )

    def group_mapping(self, granularity: Optional[str]) -> Dict[str, str]:
        """granularity in {None, 'layer', 'block', 'model'} ->
        {weight_key: group} (wanda_pruner.py:292-324, 743-776)."""
        if granularity is None:
            return {}
        mapping: Dict[str, str] = {}
        for stack in self.stacks:
            prefix = self.model_prefixes.get(stack.name, stack.name.split(".")[0])
            for i in range(stack.num_blocks):
                for local in stack.linear_names:
                    key = stack.weight_key(i, local)
                    if granularity == "layer":
                        mapping[key] = key
                    elif granularity == "block":
                        mapping[key] = f"{stack.name}.{i}"
                    elif granularity == "model":
                        mapping[key] = prefix
                    else:
                        raise NotImplementedError(granularity)
        return mapping


@dataclass(frozen=True)
class StackWeightTarget(WeightTarget):
    """WeightTarget routed through a StackSpec's block accessors, so stacked
    storage layouts stay private to each model."""

    stack: Any = None
    local: str = ""

    def get(self, params: PyTree) -> jax.Array:
        bp = self.stack.get_block(params, self.block_index)
        return self.stack.weight_get(bp, self.local)

    def set(self, params: PyTree, w: jax.Array) -> PyTree:
        bp = self.stack.get_block(params, self.block_index)
        bp = self.stack.weight_set(bp, self.local, w)
        return self.stack.set_block(params, self.block_index, bp)

    def add(self, params: PyTree, delta: jax.Array) -> PyTree:
        return self.set(params, self.get(params) + delta.astype(self.dtype(params)))

    def shape(self, params: PyTree):
        return tuple(self.get(params).shape)

    def numel(self, params: PyTree) -> int:
        s = self.shape(params)
        n = 1
        for d in s:
            n *= d
        return n

    def dtype(self, params: PyTree):
        return self.get(params).dtype
