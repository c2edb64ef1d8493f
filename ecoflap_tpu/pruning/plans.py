"""Suffix-cached MeZO loss plans — prefix reuse for the zeroth-order stage.

The reference re-runs the FULL model for every group perturbation
(layer_single_base_pruner.py:507-536): scoring block i of an L-block stack
pays for blocks 0..L-1 plus everything downstream, twice per noise draw. But
a perturbation confined to block i cannot change the input of block i — the
prefix (blocks < i) is both unperturbed and identical across the antithetic
pair and across every target inside block i.

``SuffixPlan`` exploits this with TPU-friendly structure:

* a ROLLING CACHE of block-i's input activations, advanced by ONE extra
  block forward when scoring moves to the next block (total prefix cost over
  the whole stack = one stack forward, amortized);
* a cond-MASKED SCAN for the suffix: one compiled program scans ALL blocks
  but skips steps ``j < start`` via ``lax.cond`` (the start index is a traced
  scalar, so there is exactly ONE program per stack, not one per block —
  compile time through the axon tunnel is the expensive resource);
* a model-supplied ``finish_fn`` mapping the stack's output to per-sample
  losses (e.g. BLIP-2's ViT stack: ln_vision -> Q-Former -> t5_proj -> T5).

Scores are numerically identical to the full-forward path up to float
reduction order (tested in tests/test_mezo_plans.py). Expected effect at
BLIP-2 XL scale: prefix compute drops from O(L/2) blocks per eval to O(1)
amortized — roughly 35-40% of the coarse stage.

Plan protocol consumed by ``mezo_leaf_scores``: ``match(name)``,
``loss_fn(params, data)``, ``data``, plus optional ``prepare(params, name)``
(returns per-target data; lets the plan roll its cache) and ``static_keys``
(data keys that must NOT be chunked/microbatch-sliced, e.g. the start index).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ecoflap_tpu.core.pytree import get_leaf, set_leaf
from ecoflap_tpu.pruning.adapter import StackSpec

PyTree = Any

X_KEY = "__suffix_x"
CACHE_KEY = "__suffix_cache"
START_KEY = "__suffix_start"


def masked_suffix_scan(
    block_forward: Callable,
    blocks: PyTree,
    x: jax.Array,
    cache: Any,
    start: jax.Array,
) -> jax.Array:
    """Scan all blocks, passing ``x`` through unchanged for steps < start.
    ``x`` must already be block ``start``'s input. One compiled program for
    any start value."""
    n = jax.tree_util.tree_leaves(blocks)[0].shape[0]

    def body(x, inp):
        j, bp = inp
        y = jax.lax.cond(
            j >= start,
            lambda h: block_forward(bp, h, cache, collect=None)[0],
            lambda h: h,
            x,
        )
        return y, None

    y, _ = jax.lax.scan(body, x, (jnp.arange(n), blocks))
    return y


class SuffixPlan:
    """Rolling-prefix MeZO plan for one StackSpec.

    Args:
      stack: the stack whose targets this plan serves.
      finish_fn: (params, stack_output, data) -> (B,) per-sample losses.
      params: UNPERTURBED model params (cache built from these; MeZO's
        antithetic cycle restores weights before ``prepare`` is called).
      batch: full calibration batch.
      batch_keys: batch fields the finish_fn reads (defaults to all) — keep
        this tight so unused leaves don't ride through the chunked loss.
      extra_data: additional (batch-leading-dim) arrays for finish_fn, e.g.
        the fused encoder mask for a T5-decoder loss.
      num_chunks: memory-chunking for the initial prepare_inputs pass.
    """

    static_keys = (START_KEY,)

    def __init__(
        self,
        stack: StackSpec,
        finish_fn: Callable[[PyTree, jax.Array, Dict], jax.Array],
        params: PyTree,
        batch: Any,
        batch_keys: Optional[Sequence[str]] = None,
        extra_data: Optional[Dict[str, Any]] = None,
        num_chunks: int = 1,
    ) -> None:
        self.stack = stack
        self.finish_fn = finish_fn
        self._prefix = stack.name + "."
        # batch-vs-shared leaf discrimination for chunking/microbatching:
        # cache leaves like a (1, 1, S, S) causal bias must ride whole
        self.batch_size = jax.tree_util.tree_leaves(batch)[0].shape[0]
        keep = batch_keys if batch_keys is not None else list(batch.keys())
        self._base = {k: batch[k] for k in keep}
        self._base.update(extra_data or {})
        # LAZY device work: nothing touches the backend until the plan is
        # actually used for MeZO scoring (first `.data`/`prepare` access).
        # Construction is then free, which lets the streamed first-order
        # backward (first_order.streamed_plan_grad_sums) reuse these objects
        # as pure (stack, finish_fn, base-data) descriptors.
        self._init_params = params
        self._init_batch = batch
        self._num_chunks = num_chunks
        self._x = None
        self._cache = None
        self._advance = None
        self._block = 0
        self._data_cache: Optional[Dict[str, Any]] = None

    @property
    def base_data(self) -> Dict[str, Any]:
        """Finish-fn data fields (full-batch leading dim) without the
        rolling-cache keys — the streamed first-order path slices these per
        microbatch."""
        return dict(self._base)

    def _ensure(self) -> None:
        """Build the rolling prefix cache on first use."""
        if self._x is not None:
            return
        from ecoflap_tpu.pruning.engine import (
            chunked_block_apply,
            chunked_prepare,
        )

        stack, num_chunks = self.stack, self._num_chunks
        x, cache = jax.jit(
            lambda p, b: chunked_prepare(stack.prepare_inputs, p, b,
                                         num_chunks)
        )(self._init_params, self._init_batch)
        # drop the pristine-params reference: MeZO's donated in-place
        # perturbation cycle invalidates those buffers later, and _ensure
        # must only ever run before the first perturbation (plan_pairs setup)
        self._init_params = self._init_batch = None
        self._x = x
        self._cache = cache
        # donate x: the pre-advance activations are dead afterwards (the
        # rolling cache would otherwise churn a stack's worth of activation
        # buffers against the device allocation budget). The advance streams
        # in the SAME chunks as the loss evals: a full-batch single-block
        # forward holds the whole batch's attention scores at once —
        # 8.6 GB at OpenLLaMA-3B (32 samples × 32 heads × 2048²·bf16),
        # which OOM'd the first block advance on a 16 GB chip.
        def _adv(bp, h, c):
            y, _ = chunked_block_apply(
                stack.block_forward, bp, h, c, None, num_chunks)
            return y

        self._advance = jax.jit(_adv, donate_argnums=(1,))

    # -- LossPlan protocol ---------------------------------------------------
    def match(self, name: str) -> bool:
        return name.startswith(self._prefix)

    def loss_fn(self, params: PyTree, data: Dict[str, Any]) -> jax.Array:
        blocks = get_leaf(params, self.stack.blocks_path)
        y = masked_suffix_scan(
            self.stack.block_forward, blocks, data[X_KEY], data[CACHE_KEY],
            data[START_KEY],
        )
        return self.finish_fn(params, y, data)

    @property
    def data(self) -> Dict[str, Any]:
        """Eval data dict, MEMOIZED per block position. Rebuilding it per
        target (the naive property) materializes a fresh START_KEY scalar
        and a fresh dict of the same buffers on every call — through the
        axon tunnel each novel input-set to the jitted loss leaks device
        allocations, and an LLM-scale coarse stage (OpenLLaMA-3B, 7 targets
        per block) died RESOURCE_EXHAUSTED after ~8 targets. Same-block
        calls must return the IDENTICAL pytree (bit-identical buffers)."""
        self._ensure()
        if self._data_cache is None:
            self._data_cache = {
                **self._base,
                X_KEY: self._x,
                CACHE_KEY: self._cache,
                START_KEY: jnp.asarray(self._block, jnp.int32),
            }
        return self._data_cache

    def prepare(self, params: PyTree, name: str) -> Dict[str, Any]:
        """Advance the rolling cache to the target's block (using the
        UNPERTURBED params) and return the eval data."""
        self._ensure()
        i = int(name[len(self._prefix):].split(".", 1)[0])
        if i < self._block:
            raise ValueError(
                f"SuffixPlan targets must arrive in block order: got block "
                f"{i} after {self._block} ({name})"
            )
        while self._block < i:
            bp = self.stack.get_block(params, self._block)
            self._x = self._advance(bp, self._x, self._cache)
            self._block += 1
            self._data_cache = None  # X and START changed
        return self.data

    # -- lane-ensemble scoring (mezo.py groups same-block targets) -----------
    def lane_paths(self, targets) -> tuple:
        """In-block kernel paths for a group of same-block targets."""
        pre = self.stack.blocks_path + "."
        return tuple(t.tree_path[len(pre):] for t in targets)

    def make_lane_scorer(
        self,
        paths: tuple,
        mode: str = "per_batch",
        chunks: int = 1,
        num_microbatches: int = 1,
    ):
        """ONE jitted program scoring K same-block targets at once.

        Serial MeZO scoring pays 2 suffix-forwards per (target, microbatch,
        noise) at calibration batch size — through the axon tunnel each is a
        separate ~ms dispatch of an MXU-underutilized batch-8 program. The
        lane ensemble evaluates every target of block ``start`` in one
        program: lane k's FIRST block runs with ``paths[k]``'s kernel
        perturbed (a K-variant copy of ONE block's params — tens of MB, never
        the stacked leaf), the suffix (blocks start+1..) and the downstream
        ``finish_fn`` run lane-batched with SHARED weights (vmap broadcasts
        them, so no K-fold weight memory). Sampling is bitwise-identical to
        the serial path: lane k draws ``normal(keys[k], w.shape)`` — the same
        key and shape the donated in-place path uses — so per-target scores
        match the serial estimator up to vmap reduction order (tested in
        tests/test_mezo_ensemble.py).

        Returns a jitted ``score(params, data, keys, eps) -> (K,)``:
          * mode="per_batch": |L(θ+εz) − L(θ−εz)| / 2ε per lane, where L is
            the mean loss over the (already-sliced) microbatch — one call per
            (microbatch, noise draw), reference-exact sampling
            (layer_single_base_pruner.py:488-561).
          * mode="shared": Σ_mb |ḡ⁺_mb − ḡ⁻_mb| / 2ε over all microbatches in
            one call, evaluated in ``chunks`` memory chunks.
        """
        fwd = self.stack.block_forward
        blocks_path = self.stack.blocks_path
        finish = self.finish_fn
        static_keys = tuple(self.static_keys)
        batch_size = self.batch_size

        def build_lanes(params, start, keys, scale):
            blocks = get_leaf(params, blocks_path)
            bp = jax.tree_util.tree_map(lambda l: l[start], blocks)
            variants = []
            for p, k in zip(paths, keys):
                w = get_leaf(bp, p)
                z = (jax.random.normal(k, w.shape, jnp.float32)
                     * scale).astype(w.dtype)
                variants.append(set_leaf(bp, p, w + z))
            return jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *variants)

        def lanes_losses(params, data, lanes):
            blocks = get_leaf(params, blocks_path)
            x, cache, start = data[X_KEY], data[CACHE_KEY], data[START_KEY]
            y0 = jax.vmap(lambda bp: fwd(bp, x, cache, None)[0])(lanes)
            y = jax.vmap(lambda h: masked_suffix_scan(
                fwd, blocks, h, cache, start + 1))(y0)
            return jax.vmap(lambda h: finish(params, h, data))(y)  # (K, B)

        from ecoflap_tpu.pruning.mezo import _is_batch_leaf, _split_static

        if mode == "per_batch":
            # ONE program per block scores every (lane, microbatch, noise):
            # lax.map over microbatches (fresh z per mb from keys[b, n, k] —
            # the reference's exact sampling, :488-561) with the antithetic
            # pair evaluated inside. Returns the per-lane per-batch score
            # contribution Σ_b |Σ_n |L⁺−L⁻|/2ε| already accumulated.
            def score(params, data, keys, eps):
                start = data[START_KEY]
                static, dyn = _split_static(data, static_keys)
                leaves, treedef = jax.tree_util.tree_flatten(dyn)
                idx = [i for i, l in enumerate(leaves)
                       if _is_batch_leaf(l, batch_size)]
                mb_n = keys.shape[0]
                stacked = [leaves[i].reshape(mb_n, -1, *leaves[i].shape[1:])
                           for i in idx]

                def body(args):
                    mb_leaves, krow = args  # krow: (N, K) keys
                    merged = list(leaves)
                    for i, v in zip(idx, mb_leaves):
                        merged[i] = v
                    d = jax.tree_util.tree_unflatten(treedef, merged)
                    if static:
                        d = {**d, **static}
                    pb = jnp.zeros((len(paths),), jnp.float32)
                    for n in range(krow.shape[0]):  # num_noise, static
                        kr = [krow[n, g] for g in range(len(paths))]
                        lp = lanes_losses(params, d, build_lanes(
                            params, start, kr, eps))
                        lm = lanes_losses(params, d, build_lanes(
                            params, start, kr, -eps))
                        pb = pb + jnp.abs(lp.mean(axis=1)
                                          - lm.mean(axis=1)) / (2.0 * eps)
                    # reference: gradients_dict[name] += |per_batch| (:549)
                    return jnp.abs(pb)

                per_mb = jax.lax.map(body, (stacked, keys))  # (MB, K)
                return jnp.sum(per_mb, axis=0)

            return jax.jit(score)

        def eval_all(params, data, lanes):
            """(K, N) lane losses over the FULL coarse batch, chunked."""
            static, dyn = _split_static(data, static_keys)
            leaves, treedef = jax.tree_util.tree_flatten(dyn)
            idx = [i for i, l in enumerate(leaves)
                   if _is_batch_leaf(l, batch_size)]
            stacked = [leaves[i].reshape(chunks, -1, *leaves[i].shape[1:])
                       for i in idx]

            def body(mb_leaves):
                merged = list(leaves)
                for i, v in zip(idx, mb_leaves):
                    merged[i] = v
                d = jax.tree_util.tree_unflatten(treedef, merged)
                if static:
                    d = {**d, **static}
                return lanes_losses(params, d, lanes)

            out = jax.lax.map(body, stacked)  # (chunks, K, b)
            return jnp.moveaxis(out, 1, 0).reshape(len(paths), -1)

        def score_shared(params, data, keys, eps):
            start = data[START_KEY]
            lp = eval_all(params, data, build_lanes(params, start, keys, eps))
            lm = eval_all(params, data, build_lanes(params, start, keys, -eps))
            gp = lp.reshape(len(paths), num_microbatches, -1).mean(axis=2)
            gm = lm.reshape(len(paths), num_microbatches, -1).mean(axis=2)
            return jnp.sum(jnp.abs(gp - gm), axis=1) / (2.0 * eps)

        return jax.jit(score_shared)
