"""Pruner classes — the registry-facing API, one shared implementation.

The reference has ~10 near-identical pruner classes across 4 subprojects
(SURVEY.md §2.1-2.2). Here there is ONE ``TwoStagePruner`` (coarse sparsity
allocation + local fine pruning) parameterized by (a) a ModelAdapter and
(b) the local method ("wanda" | "sparsegpt"), plus ONE ``GlobalPruner`` for
the global-mask baselines. The reference registry names map onto thin
factories so config files and scripts keep working:

  t5_wanda_pruner / vit_wanda_pruner / blipt5_wanda_pruner
  t5_sparsegpt_pruner / vit_sparsegpt_pruner / blipt5_sparsegpt_pruner
  blipt5_global_mag_pruner / blipt5_global_gradmagabs_pruner /
  blipt5_global_mezo_pruner
  (wanda_pruner.py:87,378,660; sparsegpt_pruner.py:225,494,752;
   global_pruner.py:246,254,303)
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import yaml

from ecoflap_tpu.core.registry import registry
from ecoflap_tpu.core.spec import parse_prune_spec
from ecoflap_tpu.pruning.adapter import ModelAdapter
from ecoflap_tpu.pruning.allocator import UniformSparsity
from ecoflap_tpu.pruning.engine import (
    check_stack_sparsity,
    prune_stack_sparsegpt,
    prune_stack_wanda,
)
from ecoflap_tpu.pruning.first_order import first_order_importance
from ecoflap_tpu.pruning.masks import (
    global_mask,
    iterative_sparsity_schedule,
    layerwise_mask,
)
from ecoflap_tpu.pruning.mezo import mezo_leaf_scores
from ecoflap_tpu.pruning.sparsity import compute_layer_sparsity

PyTree = Any


class TwoStagePruner:
    """ECoFLaP coarse-to-fine pruner: LayerSparsity + local Wanda/SparseGPT.

    Args mirror the reference kwargs (layer_single_base_pruner.py:19-63):
    prune_spec / per-stack specs, sparsity_ratio_granularity,
    max_sparsity_per_layer, score_method, num_data_first_stage, num_noise,
    noise_eps, sparsity_dict, prune_per_model, prune_n/prune_m.
    """

    local_method = "wanda"

    def __init__(
        self,
        adapter: ModelAdapter,
        data: Any,
        num_microbatches: int,
        prune_spec: Optional[str] = None,
        stack_specs: Optional[Mapping[str, Optional[str]]] = None,
        sparsity_ratio_granularity: Optional[str] = None,
        max_sparsity_per_layer: float = 0.8,
        score_method: str = "MEZO-GradOnly_sum",
        num_data_first_stage: int = 128,
        num_noise: int = 1,
        noise_eps: float = 1e-3,
        sparsity_dict: Optional[Union[str, Mapping[str, float]]] = None,
        prune_per_model: bool = False,
        prune_n: int = 0,
        prune_m: int = 0,
        noise_mode: str = "per_batch",
        key: Optional[jax.Array] = None,
        eval_chunk_size: Optional[int] = None,
        # bool | list of stack names. Default ON: TPU-validated at XL for
        # both fine methods — Wanda fine stage 82 s fused vs ~130 s
        # per-linear, SparseGPT 3/3 green 429-613 s (vs decoder-phase
        # RESOURCE_EXHAUSTED per-linear in-process and ~1900 s isolated);
        # the fused per-block program keeps Hessians/stats jit-internal so
        # the axon cumulative-allocation budget never trips (ROUND2_NOTES.md)
        fuse_block_step: Any = True,
        consume_params: bool = False,
        host_stream: bool = False,
        hessian_bf16: bool = False,
        # Grad* coarse scoring: None = ECOFLAP_STREAM_GRAD env (off),
        # True/False = explicit (no process-global state touched)
        stream_grad: Optional[bool] = None,
        verbose: bool = True,
        on_coarse_dict: Optional[Callable[[Mapping[str, float]], Any]] = None,
        **kwargs: Any,
    ) -> None:
        self.adapter = adapter
        self.data = data
        self.num_microbatches = num_microbatches
        self.eval_chunk_size = eval_chunk_size
        self.fuse_block_step = fuse_block_step
        self.consume_params = consume_params
        self.host_stream = host_stream
        self.hessian_bf16 = hessian_bf16
        self.stream_grad = stream_grad
        self.prune_spec = prune_spec
        self.stack_specs = dict(stack_specs or {})
        self.sparsity_ratio_granularity = sparsity_ratio_granularity
        self.max_sparsity_per_layer = max_sparsity_per_layer
        self.score_method = score_method
        self.num_data_first_stage = num_data_first_stage
        self.num_noise = num_noise
        self.noise_eps = noise_eps
        self.sparsity_dict = sparsity_dict
        self.prune_per_model = prune_per_model
        self.prune_n = prune_n
        self.prune_m = prune_m
        self.noise_mode = noise_mode
        self.key = key
        self.verbose = verbose
        self.on_coarse_dict = on_coarse_dict

    # -- coarse stage ------------------------------------------------------
    def _spec_for_stack(self, stack_name: str) -> Optional[str]:
        if stack_name in self.stack_specs:
            return self.stack_specs[stack_name]
        return self.prune_spec

    def _coarse_data(self):
        """First ``num_data_first_stage`` samples of the calibration batch
        (reference: separate count-limited loader, runner_base.py:645-693).

        The microbatch count must DIVIDE the sliced sample count (the
        chunked losses reshape to (num_mb, -1)); requests that don't line
        up are rounded down to whole microbatches (and clamped to the
        available samples), like a drop-last loader."""
        total = _leading_dim(self.data)
        bs = max(1, total // self.num_microbatches)
        n = min(self.num_data_first_stage, total)
        num_mb = max(1, n // bs)
        n = num_mb * bs
        data = jax.tree_util.tree_map(lambda x: x[:n], self.data)
        return data, num_mb

    def get_sparsity(
        self, original_sparsity: float, sparsity_ratio_granularity: Optional[str]
    ):
        """Sparsity dict for the fine stage (wanda_pruner.py:292-340)."""
        if self.sparsity_dict is not None:
            if isinstance(self.sparsity_dict, str):
                with open(self.sparsity_dict) as f:
                    sd = yaml.safe_load(f)
            else:
                sd = dict(self.sparsity_dict)
            return self._adapt_sparsity_dict(sd)

        mapping = self.adapter.group_mapping(sparsity_ratio_granularity)
        data, num_mb = self._coarse_data()
        plans = None
        # MEZO-*: suffix plans are the prefix-reuse fast path. Grad*: the
        # SAME plan objects (now lazily constructed — no device work) carry
        # the (stack, finish_fn) pairs that let first_order stream each
        # stack's backward block-by-block instead of compiling one giant
        # grad-of-scan per stack (ECOFLAP_STREAM_GRAD=1; the remat'd ViT
        # backward's ~375 s remote compile was round 3's cold critical
        # path). Real* methods still take the plain full-tree path.
        method = self.score_method.upper()
        stream = (self.stream_grad if self.stream_grad is not None
                  else os.environ.get("ECOFLAP_STREAM_GRAD", "0") == "1")
        want_plans = ("MEZO" in method
                      or (method.startswith("GRAD") and stream))
        if self.adapter.build_mezo_plans is not None and want_plans:
            plans = self.adapter.build_mezo_plans(
                self.adapter.params, data, num_chunks=self._eval_chunks(data) or num_mb
            )
        return compute_layer_sparsity(
            self.adapter.loss_fn,
            self.adapter.params,
            data,
            num_mb,
            self.adapter.targets(),
            original_sparsity,
            mapping,
            max_sparsity_per_layer=self.max_sparsity_per_layer,
            score_method=self.score_method,
            num_noise=self.num_noise,
            noise_eps=self.noise_eps,
            prune_per_model=self.prune_per_model,
            per_model_group=list(self.adapter.model_prefixes.values()),
            key=self.key,
            noise_mode=self.noise_mode,
            on_progress=self._coarse_mark,
            partition_prefixes=[
                s.blocks_path for s in self.adapter.stacks
                if s.blocks_path is not None
            ],
            loss_plans=plans,
            # batch-coupled losses (adapter.chunk_safe=False) must not be
            # sub-chunked: per-sample values depend on the whole microbatch
            eval_chunks=(self._eval_chunks(data)
                         if getattr(self.adapter, "chunk_safe", True)
                         else None),
            verbose=self.verbose,
        )

    def _adapt_sparsity_dict(self, sd: Dict[str, float]) -> Dict[str, float]:
        """Cross-model sparsity-dict reuse (wanda_pruner.py:570-585): a
        BLIP-2-derived dict feeds the EVA-CLIP pruner — ``visual_encoder.*``
        keys remap to the eva_clip tower's ``visual.*`` names (and the
        reverse direction), and targets the SOURCE model lacks (BLIP-2's ViT
        drops EVA block 39) fill with sparsity 0 = keep dense, exactly like
        the reference's explicit block-39 zero-fill. Fills are loud; a dict
        covering under half the targets is a wrong dict and raises (the
        legitimate case is a handful of trailing blocks, 39/40).

        Scope: only the stacks actually BEING PRUNED (spec not None) — a
        ViT-only dict driving ``--stacks visual_encoder.blocks`` on BLIP-2
        must not be rejected for missing T5 keys the fine stage never
        indexes (the reference's eva_clip->blip2 reuse direction)."""
        pruned = [s for s in self.adapter.stacks
                  if self._spec_for_stack(s.name) is not None]
        targets = {s.weight_key(i, ln) for s in pruned
                   for i in range(s.num_blocks) for ln in s.linear_names}
        if targets <= set(sd):
            return sd
        out = dict(sd)
        for a, b in (("visual_encoder.", "visual."),
                     ("visual.", "visual_encoder.")):
            if (any(k.startswith(a) for k in sd)
                    and any(t.startswith(b) for t in targets)):
                for k, v in sd.items():
                    if k.startswith(a):
                        out.setdefault(b + k[len(a):], v)
        missing = sorted(t for t in targets if t not in out)
        if missing:
            covered = len(targets) - len(missing)
            if covered < 0.5 * len(targets):
                raise KeyError(
                    f"--sparsity_dict covers only {covered}/{len(targets)} "
                    f"targets (first missing: {missing[:3]}) — wrong dict "
                    "for this model")
            print(f"sparsity_dict: zero-filling {len(missing)} targets the "
                  f"source model lacks (kept dense): {missing[:4]}"
                  f"{' ...' if len(missing) > 4 else ''}")
            for t in missing:
                out[t] = 0.0
        return out

    def _eval_chunks(self, data: Any) -> Optional[int]:
        """Memory-chunk count from eval_chunk_size (None = per-microbatch).

        Chunks must DIVIDE the batch (chunked_prepare asserts it) and the
        actual chunk size must not EXCEED the requested cap (it bounds
        activation memory): pick the smallest divisor of n with
        n/chunks <= eval_chunk_size."""
        if self.eval_chunk_size is None:
            return None
        n = _leading_dim(data)
        want = max(1, -(-n // max(self.eval_chunk_size, 1)))  # ceil
        for c in range(want, n + 1):
            if n % c == 0:
                return c
        return n

    # -- fine stage --------------------------------------------------------
    def _build_fine_programs(self) -> Dict[str, Any]:
        """AOT compile-overlap for the fine stage (engine.FinePrograms):
        every to-be-pruned stack's fused program starts lowering+compiling
        against abstract inputs in a daemon thread at prune() begin, so the
        per-stack XL compiles (~110 s each through the axon tunnel — they
        dominated the round-5 SparseGPT preset) overlap the coarse stage and
        each other instead of serializing at each stack's block 0. Gated
        like the plan warm: default ON on tpu, ECOFLAP_WARM_FINE=0/1
        overrides."""
        env = os.environ.get("ECOFLAP_WARM_FINE")
        # default: when a coarse SCORING stage will run (the device-busy
        # window the compiles hide under: zeroth_pb fine stage 62 s -> 34 s)
        # or when the programs are compile-dominated (SparseGPT: ~110 s
        # compile vs ~20 s execution per stack; uniform preset measured
        # 375 s -> 345 s). Wanda-only presets LOSE on a single-core host —
        # the first stack's inline compile time-shares with every warm
        # thread (77 s -> 114 s measured) — so they stay serial.
        has_coarse = (self.sparsity_ratio_granularity is not None
                      and self.sparsity_dict is None)
        on = (env == "1" if env is not None
              else jax.default_backend() == "tpu"
              and (has_coarse or self.local_method == "sparsegpt"))
        if not on or self.host_stream:
            return {}
        from ecoflap_tpu.core.pytree import get_leaf
        from ecoflap_tpu.pruning.engine import (
            chunked_prepare,
            make_block_programs,
            make_sparsegpt_prune_fns,
            make_wanda_prune_fn,
        )

        num_chunks = self._eval_chunks(self.data) or self.num_microbatches
        out: Dict[str, Any] = {}
        for stack in self.adapter.stacks:
            if (self._spec_for_stack(stack.name) is None
                    or stack.blocks_path is None
                    or not self._fuse_for(stack)):
                continue
            if self.local_method == "wanda":
                pw = make_wanda_prune_fn(stack.per_row_mask, self.prune_n,
                                         self.prune_m)
                collect, group_fn = "wanda", None
            else:
                pw, group_fn = make_sparsegpt_prune_fns(
                    128, 0.01, self.prune_n, self.prune_m)
                collect = "hessian_bf16" if self.hessian_bf16 else "hessian"
            blocks = get_leaf(self.adapter.params, stack.blocks_path)
            progs = make_block_programs(stack, collect, pw, num_chunks,
                                        group_fn, blocks)
            try:
                x_abs, cache_abs = jax.eval_shape(
                    lambda p, b, st=stack: chunked_prepare(
                        st.prepare_inputs, p, b, num_chunks),
                    self.adapter.params, self.data)
                blocks_abs = jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), blocks)
                progs.warm_async(blocks_abs, x_abs, cache_abs,
                                 stack.linear_names)
            except Exception:
                pass  # warm is best-effort; the jit path still compiles
            out[stack.name] = progs
        return out

    def _prune_stack(self, stack, params, ratios):
        programs = getattr(self, "_fine_programs", {}).get(stack.name)
        if self.local_method == "wanda":
            return prune_stack_wanda(
                stack,
                params,
                self.data,
                ratios,
                prune_n=self.prune_n,
                prune_m=self.prune_m,
                num_chunks=self._eval_chunks(self.data) or self.num_microbatches,
                verbose=self.verbose,
                counters=self._counters,
                fuse_block_step=self._fuse_for(stack),
                consume_params=self.consume_params,
                host_stream=self.host_stream,
                programs=programs,
            )
        if self.local_method == "sparsegpt":
            return prune_stack_sparsegpt(
                stack,
                params,
                self.data,
                ratios,
                prune_n=self.prune_n,
                prune_m=self.prune_m,
                num_chunks=self._eval_chunks(self.data) or self.num_microbatches,
                verbose=self.verbose,
                counters=self._counters,
                fuse_block_step=self._fuse_for(stack),
                consume_params=self.consume_params,
                hessian_bf16=self.hessian_bf16,
                host_stream=self.host_stream,
                programs=programs,
            )
        raise ValueError(self.local_method)

    def _fuse_for(self, stack) -> bool:
        """fuse_block_step: bool, or a collection of stack names to fuse —
        lets memory-tight runs fuse stat-heavy stacks (Hessians stay
        jit-internal) while keeping small per-linear programs elsewhere."""
        f = self.fuse_block_step
        if isinstance(f, bool):
            return f
        return stack.name in f

    def _coarse_mark(self, i: int) -> None:
        if not hasattr(self, "_coarse_marks"):
            self._coarse_marks = []
        self._coarse_marks.append(time.time())

    def prune(self):
        """Returns (pruned_params, sparsity_dict) — reference ``prune()``
        contract (wanda_pruner.py:799-876). ``phase_times`` afterwards holds
        the wall split: coarse stage (with first-item vs steady attribution —
        the first scored item absorbs the remote compiles) and per-stack fine
        stages (each stack's first block likewise carries its compile)."""
        t0 = time.time()
        params = self.adapter.params
        self._counters: Dict[str, int] = {}
        self._coarse_marks: list = []
        self.phase_times: Dict[str, float] = {}
        # fine-stage AOT compile overlap: threads start now so the per-stack
        # fused-program compiles ride under the coarse stage's wall
        self._fine_programs = self._build_fine_programs()

        # Coarse stage runs once over the union of stacks when granularity is
        # requested (blipt5 orchestrator, wanda_pruner.py:803-812).
        global_dict = None
        if self.sparsity_ratio_granularity is not None or self.sparsity_dict is not None:
            specs = [
                self._spec_for_stack(s.name)
                for s in self.adapter.stacks
                if self._spec_for_stack(s.name) is not None
            ]
            if not specs:
                return params, None
            ratios = {parse_prune_spec(s).sparsity for s in specs}
            assert len(ratios) == 1, (
                "all stacks must share the target sparsity (wanda_pruner.py:807)"
            )
            global_dict = self.get_sparsity(
                ratios.pop(), self.sparsity_ratio_granularity
            )
            tc = time.time()
            self.phase_times["coarse_s"] = round(tc - t0, 2)
            if self._coarse_marks:
                # setup (plan/program builds; under parallel compile warm the
                # first mark lands after the overlapped compiles finish)
                self.phase_times["coarse_to_first_mark_s"] = round(
                    self._coarse_marks[0] - t0, 2)
            if len(self._coarse_marks) >= 2:
                # item 0 starts at marks[0], item 1 at marks[1]: the gap is
                # the first item's full duration incl. its program compiles
                self.phase_times["coarse_first_item_s"] = round(
                    self._coarse_marks[1] - self._coarse_marks[0], 2)
                self.phase_times["coarse_steady_s"] = round(
                    tc - self._coarse_marks[1], 2)
            if self.on_coarse_dict is not None:
                # Persist the coarse dict BEFORE the fine stage: a 7B coarse
                # stage is ~26 min of scoring, and a fine-stage failure
                # (e.g. the axon cumulative-allocation budget) must not lose
                # it — the saved YAML re-enters via --sparsity_dict.
                self.on_coarse_dict(global_dict)

        if self.host_stream:
            # Pull every stack's stacked leaves to HOST and drop the device
            # copies BEFORE the fine stage: the streaming loop re-uploads one
            # block at a time, and a 7B LLaMA's 13 GB of device-resident
            # blocks would otherwise coexist with the calibration
            # activations (engine._host_stream_prune_stack).
            import numpy as np

            from ecoflap_tpu.core.pytree import get_leaf, set_leaf

            for stack in self.adapter.stacks:
                if stack.blocks_path is None:
                    continue
                leaf = get_leaf(params, stack.blocks_path)
                host = jax.tree_util.tree_map(
                    lambda a: np.asarray(a).copy(), leaf)
                params = set_leaf(params, stack.blocks_path, host)
            self.adapter.params = params

        for stack in self.adapter.stacks:
            spec = self._spec_for_stack(stack.name)
            if spec is None:
                continue
            sparsity_ratio = parse_prune_spec(spec).sparsity
            stack_dict = (
                global_dict
                if global_dict is not None
                else UniformSparsity(sparsity_ratio)
            )
            ts = time.time()
            params = self._prune_stack(stack, params, stack_dict)
            self.phase_times[f"fine_{stack.name}_s"] = round(
                time.time() - ts, 2)

        self.adapter.params = params
        if self.verbose:
            print(f"prune spent {time.time() - t0:.3f} s")
        return params, global_dict

    def check_sparsity(self) -> float:
        """Global zero-fraction over prunable weights. Prefers the counters
        measured IN-program during the fine stage (a post-prune counting pass
        allocates against a possibly exhausted device budget); falls back to
        jitted whole-leaf reductions.

        The counter fast path only applies when EVERY stack was pruned
        in-process — a partial run's counters cover a different weight
        population than the global fallback (e.g. --stacks subsets), which
        would silently change the metric's denominator."""
        counters = getattr(self, "_counters", None)
        all_pruned = all(self._spec_for_stack(s.name) is not None
                         for s in self.adapter.stacks)
        if counters and counters.get("total") and all_pruned:
            return counters["zeros"] / counters["total"]
        from ecoflap_tpu.core.pytree import get_leaf

        count_zeros = jax.jit(lambda l: jnp.sum(l == 0))
        count = total = 0
        for stack in self.adapter.stacks:
            if stack.blocks_path is not None:
                blocks = get_leaf(self.adapter.params, stack.blocks_path)
                seen = set()
                for local in stack.linear_names:
                    path = (stack.local_to_path or {}).get(local, local)
                    if path in seen:
                        continue
                    seen.add(path)
                    leaf = get_leaf(blocks, f"{path}.kernel")
                    count += int(count_zeros(leaf))
                    total += int(leaf.size)
            else:
                for i in range(stack.num_blocks):
                    bp = stack.get_block(self.adapter.params, i)
                    for local in stack.linear_names:
                        w = stack.weight_get(bp, local)
                        count += int(count_zeros(w))
                        total += int(w.size)
        return count / max(total, 1)


class WandaPruner(TwoStagePruner):
    local_method = "wanda"


class SparseGPTPruner(TwoStagePruner):
    local_method = "sparsegpt"


class GlobalPruner:
    """Global-mask baselines (global_pruner.py:56-244): iterative global /
    per-model-global / layerwise magnitude-or-gradient-or-MeZO pruning."""

    score = "mag"  # "mag" | "gradmagabs" | "mezo"

    def __init__(
        self,
        adapter: ModelAdapter,
        data: Any,
        num_microbatches: int,
        prune_spec: Optional[str] = None,
        stack_specs: Optional[Mapping[str, Optional[str]]] = None,
        is_global: bool = True,
        prune_per_model: bool = False,
        iteration: int = 1,
        num_samples: int = 64,
        num_noise: int = 1,
        noise_eps: float = 1e-3,
        key: Optional[jax.Array] = None,
        noise_mode: str = "per_batch",
        verbose: bool = True,
        **kwargs: Any,
    ) -> None:
        self.adapter = adapter
        self.data = data
        self.num_microbatches = num_microbatches
        self.prune_spec = prune_spec
        self.stack_specs = dict(stack_specs or {})
        self.is_global = is_global
        self.prune_per_model = prune_per_model
        self.iteration = iteration
        self.num_samples = num_samples
        self.num_noise = num_noise
        self.noise_eps = noise_eps
        self.key = key
        self.noise_mode = noise_mode
        self.verbose = verbose

    def _score_data(self):
        """First ``num_samples`` of the calibration batch, rounded down to
        whole microbatches (the reference's num_samples-limited global
        scoring loader) — previously the kwarg was stored but scoring always
        consumed the full batch."""
        total = _leading_dim(self.data)
        bs = max(1, total // self.num_microbatches)
        num_mb = max(1, min(self.num_samples, total) // bs)
        data = jax.tree_util.tree_map(lambda x: x[: num_mb * bs], self.data)
        return data, num_mb

    def _importance(self, params, targets):
        if self.score == "mag":
            return {t.name: jnp.abs(t.get(params).astype(jnp.float32)) for t in targets}
        data, num_mb = self._score_data()
        if self.score == "gradmagabs":
            from ecoflap_tpu.pruning.sparsity import _split_batches

            return first_order_importance(
                self.adapter.loss_fn, params, _split_batches(data, num_mb),
                targets, "GradMagAbs"
            )
        if self.score == "mezo":
            # Scalar per tensor — masks then keep/drop whole tensors, exactly
            # like the reference (global_pruner.py:383-387 + get_mask on
            # shape-[1] tensors).
            scores = mezo_leaf_scores(
                self.adapter.loss_fn,
                params,
                data,
                num_mb,
                targets,
                eps=self.noise_eps,
                num_noise=self.num_noise,
                key=self.key,
                noise_mode=self.noise_mode,
            )
            return {k: jnp.abs(v).reshape(1) for k, v in scores.items()}
        raise ValueError(self.score)

    def prune(self):
        params = self.adapter.params
        targets = self.adapter.targets()
        spec = self.prune_spec or next(iter(self.stack_specs.values()), None)
        if spec is None:
            return params, None
        target_sparsity = parse_prune_spec(spec).sparsity

        masks = None
        for p_i in iterative_sparsity_schedule(target_sparsity, self.iteration):
            imp = self._importance(params, targets)
            if masks is not None:
                imp = {k: imp[k] * masks[k] for k in imp}

            if self.is_global and not self.prune_per_model:
                masks = global_mask(imp, p_i, max_sparsity_per_layer=1.0)
            elif self.is_global and self.prune_per_model:
                masks = {}
                for prefix in self.adapter.model_prefixes.values():
                    sub = {k: v for k, v in imp.items() if k.startswith(prefix)}
                    masks.update(global_mask(sub, p_i, max_sparsity_per_layer=1.0))
            else:
                masks = layerwise_mask(imp, p_i)

            for t in targets:
                w = t.get(params)
                m = masks[t.name].astype(w.dtype)
                if m.size == 1:  # whole-tensor MeZO mask
                    m = m.reshape(())
                params = t.set(params, w * m)
            if self.verbose:
                print(f"target sparsity: {p_i:.4f}")

        self.adapter.params = params
        return params, None


class GlobalMagPruner(GlobalPruner):
    score = "mag"


class GlobalGradMagAbsPruner(GlobalPruner):
    score = "gradmagabs"


class GlobalMeZoPruner(GlobalPruner):
    score = "mezo"


def _leading_dim(data: Any) -> int:
    leaves = jax.tree_util.tree_leaves(data)
    return leaves[0].shape[0]


# -- registry names (parity with the reference) ----------------------------
for _name, _cls in [
    ("t5_wanda_pruner", WandaPruner),
    ("vit_wanda_pruner", WandaPruner),
    ("blipt5_wanda_pruner", WandaPruner),
    ("llama_wanda_pruner", WandaPruner),
    ("clip_wanda_pruner", WandaPruner),
    ("bert_wanda_pruner", WandaPruner),
    ("blipbert_wanda_pruner", WandaPruner),
    ("t5_sparsegpt_pruner", SparseGPTPruner),
    ("vit_sparsegpt_pruner", SparseGPTPruner),
    ("blipt5_sparsegpt_pruner", SparseGPTPruner),
    ("llama_sparsegpt_pruner", SparseGPTPruner),
    ("clip_sparsegpt_pruner", SparseGPTPruner),
    ("deit_wanda_pruner", WandaPruner),
    ("vit_classifier_wanda_pruner", WandaPruner),
    ("convnext_wanda_pruner", WandaPruner),
    ("blipt5_global_mag_pruner", GlobalMagPruner),
    ("blipt5_global_gradmagabs_pruner", GlobalGradMagAbsPruner),
    ("blipt5_global_mezo_pruner", GlobalMeZoPruner),
    ("llama_magnitude_pruner", GlobalMagPruner),
]:
    registry.register("pruner", _name, _cls, force=True)
