"""Zeroth-order (MeZO-style) importance scoring — the ECoFLaP headline path.

Reference semantics (``LayerSparsity.compute_importance_scores_mezo``,
LAVIS/lavis/compression/pruners/layer_single_base_pruner.py:488-561): for each
prunable weight tensor independently, draw Gaussian noise z, evaluate the
calibration loss at θ+εz and θ−εz, and accumulate the absolute projected
gradient ``|loss⁺ − loss⁻| / 2ε`` over batches and noise draws. The score is a
*scalar per tensor*; per-element variants multiply it back onto the weights:

  MEZO-GradOnly:       s
  MEZO-GradMagAbs:     |W| · s        (per element)
  MEZO-GradMagSquare:  W² · s²       (per element)

Cost = 2 · |tensors| · num_batches forwards — HOT LOOP #1 in SURVEY.md §3.1.

TPU-native design (this module): the loss fn returns *per-sample* losses, so
all calibration data rides in ONE forward per perturbation side: the
(num_batches × batch_size) samples are stacked and group-means reproduce the
per-batch losses exactly. Two execution modes:

* ``noise_mode="per_batch"`` (DEFAULT, reference-exact): fresh z per
  microbatch — the reference's exact sampling scheme. The cost model that
  once favored "shared" is gone: with SuffixPlan lane ensembles (one vmapped
  program scores every target of a block at once, see plans.py
  ``make_lane_scorer``) the per-batch mode is both parity-exact and the
  fastest measured configuration (BENCH_LOCAL.json).
* ``noise_mode="shared"``: one z per (tensor, noise draw) shared across all
  microbatches, evaluated in one big chunked forward per side. Still an
  unbiased |z·∇L| sample with fewer RNG draws; kept as an option (PARITY.md
  "Documented deviations", demoted from default in round 5).

Perturbations are functional: ``target.add(params, ±εz)`` builds a tree that
shares every untouched leaf, replacing the reference's in-place
perturb→forward→restore seed-replay dance (zo_perturb_parameters, :473-486)
with jax PRNG keys — no restore step, no RNG state to corrupt.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

import functools
import os

import numpy as np

from ecoflap_tpu.core.pytree import get_leaf, set_leaf_mutate
from ecoflap_tpu.pruning.targets import WeightTarget

PyTree = Any
LossFn = Callable[[PyTree, Any], jax.Array]  # -> (B,) per-sample losses


@functools.partial(jax.jit, donate_argnums=(0,))
def _nudge_at(leaf, idx, key, scale):
    """leaf[idx] += scale·z, z ~ N(0,1) generated INSIDE the program (no
    noise buffer ever leaves the jit), leaf buffer donated (in-place)."""
    z = (jax.random.normal(key, leaf.shape[1:], jnp.float32) * scale).astype(
        leaf.dtype
    )
    return leaf.at[idx].add(z)


@functools.partial(jax.jit, donate_argnums=(0,))
def _nudge_full(leaf, key, scale):
    z = (jax.random.normal(key, leaf.shape, jnp.float32) * scale).astype(leaf.dtype)
    return leaf + z


def _pallas_perturb_enabled() -> bool:
    """Fused on-chip-noise perturb kernel (ops/perturb.py): TPU only (the
    Pallas PRNG is stubbed in CPU interpret mode); kill-switch env."""
    import os

    if os.environ.get("ECOFLAP_PALLAS_PERTURB", "1") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _perturb_in_place(params: PyTree, t, key: jax.Array, scale) -> None:
    """Donated in-place perturbation of one (possibly stacked) leaf.

    The TPU-native version of the reference's perturb/restore seed-replay
    (zo_perturb_parameters, layer_single_base_pruner.py:473-486): the noise
    regenerates from ``key`` inside a jit whose leaf buffer is DONATED (XLA
    updates it in place), and the params dict is mutated so every live
    reference tracks the replacement array. The antithetic cycle
    ``scale = +ε, −2ε, +ε`` with the same key restores the weights up to one
    rounding ulp, exactly like the reference's in-place arithmetic. Per-target
    device allocation is ~zero — the full-copy path churned ~1 GB/target at
    BLIP-2 scale and exhausted the device allocator mid-scoring.

    On TPU, stacked leaves with exact tilings route through the Pallas
    ``perturb_block_inplace`` kernel: noise is generated ON-CHIP from the
    Pallas PRNG and fused into the add (one read + one write of the slice,
    zero noise HBM traffic; z differs bitwise from jax.random.normal — the
    estimator only needs i.i.d. N(0,1)). Elsewhere, one traced XLA program
    per leaf SHAPE (block index is a traced scalar).
    """
    from ecoflap_tpu.ops.perturb import perturb_block_inplace, supports_block_inplace

    leaf = get_leaf(params, t.tree_path)
    scale = jnp.asarray(scale, jnp.float32)
    if (
        t.block_index is not None
        and _pallas_perturb_enabled()
        and supports_block_inplace(leaf.shape)
    ):
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        new = perturb_block_inplace(
            leaf, jnp.asarray(t.block_index, jnp.int32), seed, scale)
    elif t.block_index is None:
        new = _nudge_full(leaf, key, scale)
    else:
        new = _nudge_at(leaf, jnp.asarray(t.block_index, jnp.int32), key, scale)
    set_leaf_mutate(params, t.tree_path, new)


def _has_fast_path(t) -> bool:
    from ecoflap_tpu.pruning.adapter import StackWeightTarget as SWT

    return bool(getattr(t, "tree_path", "")) and not isinstance(t, SWT)


def _group_means(losses: jax.Array, num_groups: int) -> jax.Array:
    """(N,) per-sample losses -> (num_groups,) per-microbatch mean losses."""
    return losses.reshape(num_groups, -1).mean(axis=1)


def _split_static(data, static_keys):
    if static_keys and isinstance(data, dict):
        static = {k: data[k] for k in static_keys if k in data}
        return static, {k: v for k, v in data.items() if k not in static}
    return {}, data


def _is_batch_leaf(x, batch_dim) -> bool:
    """batch_dim None = legacy behavior (every leaf is batch data)."""
    if batch_dim is None:
        return True
    return hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch_dim


def make_chunked_loss(
    loss_fn: LossFn,
    num_chunks: int,
    static_keys: Sequence[str] = (),
    batch_dim: Optional[int] = None,
) -> LossFn:
    """Evaluate the per-sample loss in ``num_chunks`` sequential chunks via
    ``lax.map`` — same values, 1/num_chunks the activation memory. On a 16 GB
    chip this is what lets a 4B-param BLIP-2 score 128 calibration samples:
    the full-batch ViT attention alone needs ~5 GB of live activations.

    ``static_keys`` names top-level dict entries passed whole to every chunk
    (non-batch data, e.g. a SuffixPlan's start index). ``batch_dim``, when
    given, marks leaves whose leading dim differs from it as shared (not
    chunked) — e.g. a (1, 1, S, S) causal bias in a suffix plan's cache."""
    if num_chunks <= 1:
        return loss_fn

    def chunked(params, data):
        static, dyn = _split_static(data, static_keys)
        leaves, treedef = jax.tree_util.tree_flatten(dyn)
        idx = [i for i, l in enumerate(leaves) if _is_batch_leaf(l, batch_dim)]
        stacked = [
            leaves[i].reshape(num_chunks, -1, *leaves[i].shape[1:]) for i in idx
        ]

        def body(mb_leaves):
            merged = list(leaves)
            for i, v in zip(idx, mb_leaves):
                merged[i] = v
            mb = jax.tree_util.tree_unflatten(treedef, merged)
            if static:
                mb = {**mb, **static}
            return loss_fn(params, mb)

        losses = jax.lax.map(body, stacked)
        return losses.reshape(-1)

    return chunked


def slice_microbatch(
    data, b: int, num: int,
    static_keys: Sequence[str] = (),
    batch_dim: Optional[int] = None,
):
    """Microbatch ``b`` of ``num`` from a data tree, leaving static keys and
    non-batch leaves whole (per_batch noise mode; same leaf rules as
    make_chunked_loss)."""
    static, dyn = _split_static(data, static_keys)

    def sel(x):
        if not _is_batch_leaf(x, batch_dim):
            return x
        return x.reshape(num, -1, *x.shape[1:])[b]

    out = jax.tree_util.tree_map(sel, dyn)
    if static:
        out = {**out, **static}
    return out


def mezo_leaf_scores(
    loss_fn: LossFn,
    params: PyTree,
    data: Any,
    num_microbatches: int,
    targets: List[WeightTarget],
    eps: float = 1e-3,
    num_noise: int = 1,
    key: Optional[jax.Array] = None,
    noise_mode: str = "per_batch",
    loss_plans: Optional[Sequence[Any]] = None,
    eval_chunks: Optional[int] = None,
    progress: Optional[Callable[[int, str], None]] = None,
) -> Dict[str, jax.Array]:
    """Scalar |projected-gradient| score per target.

    Args:
      loss_fn: jittable (params, batch)->(B,) per-sample losses.
      data: one stacked batch pytree with leading dim N = microbatches·bs.
      num_microbatches: reproduce the reference's per-batch loss averaging.
      targets: prunable weights to score.
      eps: perturbation scale (noise_eps, default 1e-3).
      num_noise: draws per (tensor, batch) (num_noise, default 1).
      noise_mode: "shared" (fast) or "per_batch" (reference sampling parity).
      loss_plans: optional LossPlan list (adapter fast paths); the first plan
        whose ``match(target.name)`` hits supplies (loss_fn, data) for that
        target, skipping recomputation of unperturbed prefixes.

    Returns {target.name: scalar f32 score}.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if noise_mode not in ("shared", "per_batch"):
        raise ValueError(f"unknown noise_mode {noise_mode!r}")

    # shared mode streams all microbatches through one call; chunk the
    # evaluation so activation memory stays bounded. ``eval_chunks`` decouples
    # the MEMORY granularity from the reference's per-microbatch loss
    # averaging (which group_means reproduces regardless): fewer, larger
    # chunks = fewer sequential scan steps = better MXU utilization.
    chunks = (eval_chunks or num_microbatches) if noise_mode == "shared" else 1
    default_pair = (jax.jit(make_chunked_loss(loss_fn, chunks)), data)
    plan_pairs = [
        (p, jax.jit(make_chunked_loss(
            p.loss_fn, chunks,
            getattr(p, "static_keys", ()),
            getattr(p, "batch_size", None))), p.data)
        for p in (loss_plans or [])
    ]

    # Overlap the later stacks' loss-program compiles with the first stack's
    # scoring: each plan's chunked loss is a distinct multi-minute remote
    # compile through the axon tunnel, but scoring only needs plan k's
    # program once it reaches stack k — a throwaway evaluation in a daemon
    # thread populates the SAME jitted callable's cache in the meantime
    # (the first-order scorer's partition warm, first_order.py, proved the
    # tunnel handles concurrent compiles). Plan 0 is skipped (its compile is
    # on the critical path immediately). The warm result is discarded; a
    # race with an in-place perturbation of a donated leaf can only fail the
    # warm eval itself, which is why the thread swallows errors. That
    # fail-only-the-warm property leans on PJRT usage-hold semantics that
    # were only validated on the axon TPU backend, so the warm defaults ON
    # for tpu and OFF elsewhere (ECOFLAP_WARM_PLANS=0/1 overrides either way).
    warm_env = os.environ.get("ECOFLAP_WARM_PLANS")
    warm_on = (warm_env == "1" if warm_env is not None
               else jax.default_backend() == "tpu")
    ensemble_on = os.environ.get("ECOFLAP_MEZO_ENSEMBLE", "1") == "1"
    if len(plan_pairs) > 1 and warm_on and not ensemble_on:
        import threading

        def _warm(fn, pdata):
            try:
                jax.block_until_ready(fn(params, pdata))
            except Exception:
                pass

        for _, fn, d in plan_pairs[1:]:
            threading.Thread(target=_warm, args=(fn, d), daemon=True).start()

    def pair_for(name: str):
        """(plan, jitted_loss, data) for this target. Plans with a ``prepare``
        hook (SuffixPlan) update their rolling state here — called BEFORE the
        target's perturbations, so params are unperturbed."""
        for p, fn, d in plan_pairs:
            if p.match(name):
                prep = getattr(p, "prepare", None)
                if prep is not None:
                    d = prep(params, name)
                return p, fn, d
        return (None,) + default_pair

    def sample_z(k, shape, dtype):
        return (jax.random.normal(k, shape, jnp.float32) * eps).astype(dtype)

    scores: Dict[str, jax.Array] = {}
    # Batched score readbacks: a per-target float(score) costs one ~30 ms
    # tunnel round trip (≈18 s across a BLIP-2 XL coarse stage's 588
    # targets). Instead accumulate K device scalars and read them back as
    # ONE stacked vector — still a periodic sync, so async dispatch depth
    # stays bounded at K targets' worth of queued work.
    readback_every = max(1, int(os.environ.get("ECOFLAP_SCORE_READBACK", "16")))
    pending: List[jax.Array] = []
    pending_names: List[str] = []

    def flush_pending():
        if pending:
            vals = np.asarray(jnp.stack(pending))
            for nm, v in zip(pending_names, vals):
                scores[nm] = float(v)
            pending.clear()
            pending_names.clear()

    # ---- lane-ensemble grouping (SuffixPlan.make_lane_scorer) -------------
    # All targets of one block score in ONE vmapped program per (microbatch,
    # noise, side-pair): K-lane perturbed first block + shared suffix +
    # lane-batched finish. Same per-(target, batch, noise) PRNG keys as the
    # serial path, so the estimator is unchanged (vmap reduction order
    # aside). ECOFLAP_MEZO_ENSEMBLE=0 restores serial scoring.
    def _plan_entry(name: str):
        for ent in plan_pairs:
            if ent[0].match(name):
                return ent
        return None

    def _lane_ok(plan, t) -> bool:
        return (
            plan is not None
            and hasattr(plan, "make_lane_scorer")
            and getattr(getattr(plan, "stack", None), "blocks_path", None)
            is not None
            and _has_fast_path(t)
            and t.block_index is not None
            and t.tree_path.startswith(plan.stack.blocks_path + ".")
        )

    lane_scorers: Dict[Any, Any] = {}
    eps_arr = jnp.asarray(eps, jnp.float32)

    def _lane_scorer(plan, paths):
        skey = (id(plan), paths, noise_mode)
        scorer = lane_scorers.get(skey)
        if scorer is None:
            if noise_mode == "shared":
                # keep the per-program activation envelope equal to the
                # serial chunked loss: K lanes of n/c samples ≈ one serial
                # chunk, so lane chunks grow with the lane count
                n_total = plan.batch_size
                want = min(n_total, max(1, chunks * len(paths)))
                lane_chunks = next(c for c in range(want, n_total + 1)
                                   if n_total % c == 0)
                scorer = plan.make_lane_scorer(
                    paths, "shared", chunks=lane_chunks,
                    num_microbatches=num_microbatches)
            else:
                scorer = plan.make_lane_scorer(paths, "per_batch")
            lane_scorers[skey] = scorer
        return scorer

    def _score_group(i0: int, group: List[Any], plan) -> None:
        data_g = plan.prepare(params, group[0].name)
        scorer = _lane_scorer(plan, plan.lane_paths(group))
        k_lanes = len(group)

        def lane_keys(*folds):
            out = []
            for g in range(k_lanes):
                kk = jax.random.fold_in(key, i0 + g)
                for f in folds:
                    kk = jax.random.fold_in(kk, f)
                out.append(kk)
            return tuple(out)

        if noise_mode == "shared":
            score_vec = jnp.zeros((k_lanes,), jnp.float32)
            for n in range(num_noise):
                score_vec = score_vec + scorer(
                    params, data_g, lane_keys(n), eps_arr)
        else:
            # ONE program call per block: the scorer folds the microbatch
            # and noise loops (and the reference's Σ_b |per_batch|
            # accumulation) inside — keys[b, n, k] = the serial path's
            # fold_in(fold_in(fold_in(key, target), b), n)
            karr = jnp.stack([
                jnp.stack([jnp.stack(lane_keys(b, n))
                           for n in range(num_noise)])
                for b in range(num_microbatches)])
            score_vec = scorer(params, data_g, karr, eps_arr)
        vals = np.asarray(score_vec)
        for g, tg in enumerate(group):
            scores[tg.name] = float(vals[g])

    def _score_serial(ti: int, t) -> None:
        plan, loss_jit, tdata = pair_for(t.name)
        tkey = jax.random.fold_in(key, ti)
        shape = t.shape(params)
        dtype = t.dtype(params)
        score = jnp.zeros((), jnp.float32)

        if noise_mode == "shared":
            for n in range(num_noise):
                nkey = jax.random.fold_in(tkey, n)
                if _has_fast_path(t):
                    _perturb_in_place(params, t, nkey, eps)
                    l_plus = loss_jit(params, tdata)
                    _perturb_in_place(params, t, nkey, -2.0 * eps)
                    l_minus = loss_jit(params, tdata)
                    _perturb_in_place(params, t, nkey, eps)  # restore
                else:
                    z = sample_z(nkey, shape, dtype)
                    l_plus = loss_jit(t.add(params, z), tdata)
                    l_minus = loss_jit(t.add(params, -z), tdata)
                g_plus = _group_means(l_plus, num_microbatches)
                g_minus = _group_means(l_minus, num_microbatches)
                proj = jnp.abs(g_plus - g_minus) / (2.0 * eps)
                score = score + jnp.sum(proj)
        elif noise_mode == "per_batch":
            for b in range(num_microbatches):
                mb = slice_microbatch(
                    tdata, b, num_microbatches,
                    getattr(plan, "static_keys", ()),
                    getattr(plan, "batch_size", None),
                )
                per_batch = jnp.zeros((), jnp.float32)
                for n in range(num_noise):
                    bkey = jax.random.fold_in(jax.random.fold_in(tkey, b), n)
                    if _has_fast_path(t):
                        # donated in-place antithetic cycle, fresh z per
                        # microbatch — reference-exact sampling without the
                        # full-copy churn that exhausted the device budget
                        _perturb_in_place(params, t, bkey, eps)
                        l_plus = jnp.mean(loss_jit(params, mb))
                        _perturb_in_place(params, t, bkey, -2.0 * eps)
                        l_minus = jnp.mean(loss_jit(params, mb))
                        _perturb_in_place(params, t, bkey, eps)  # restore
                    else:
                        z = sample_z(bkey, shape, dtype)
                        l_plus = jnp.mean(loss_jit(t.add(params, z), mb))
                        l_minus = jnp.mean(loss_jit(t.add(params, -z), mb))
                    per_batch = per_batch + jnp.abs(l_plus - l_minus) / (2.0 * eps)
                # reference: gradients_dict[name] += |per_batch|  (:549)
                score = score + jnp.abs(per_batch)
        else:
            raise ValueError(f"unknown noise_mode {noise_mode!r}")

        # Queue the device scalar; sync every ``readback_every`` targets.
        # The periodic flush (a) bounds async dispatch depth — otherwise the
        # host enqueues every target's perturbed-param work faster than the
        # device drains it and the allocator OOMs — and (b) leaves only K
        # scalars on device between flushes.
        pending.append(score)
        pending_names.append(t.name)
        if len(pending) >= readback_every:
            flush_pending()

    # Precompute the scoring units: maximal runs of same-(plan, block)
    # lane-groupable targets, single targets otherwise.
    units: List[Any] = []  # ("group", i0, [targets], plan) | ("single", ti, t)
    idx = 0
    while idx < len(targets):
        t = targets[idx]
        ent = _plan_entry(t.name)
        plan0 = ent[0] if ent is not None else None
        if ensemble_on and _lane_ok(plan0, t):
            group = [t]
            j = idx + 1
            while j < len(targets):
                tj = targets[j]
                entj = _plan_entry(tj.name)
                if (entj is not None and entj[0] is plan0
                        and tj.block_index == t.block_index
                        and _lane_ok(plan0, tj)):
                    group.append(tj)
                    j += 1
                else:
                    break
            units.append(("group", idx, group, plan0))
            idx += len(group)
        else:
            units.append(("single", idx, t, None))
            idx += 1

    # Overlap LATER plans' lane-scorer compiles with the first plan's scoring
    # (same rationale as the serial plan warm above — each lane program is a
    # multi-minute remote compile through the axon tunnel). The warm calls
    # the SAME cached jitted callable with the plan's block-0 data; the
    # ensemble path never perturbs params in place, so there is no donation
    # race to worry about — a failed warm only wastes its own thread.
    if warm_on and ensemble_on:
        import threading

        seen_plans: List[Any] = []
        for kind, i0, grp, plan in units:
            if kind != "group" or any(p is plan for p in seen_plans):
                continue
            seen_plans.append(plan)
            if len(seen_plans) == 1:
                continue  # first plan's compile is on the critical path

            def _warm_lane(plan=plan, grp=grp, i0=i0):
                try:
                    scorer = _lane_scorer(plan, plan.lane_paths(grp))
                    d = plan.data  # block 0: no advance needed
                    keys = tuple(jax.random.fold_in(key, i0 + g)
                                 for g in range(len(grp)))
                    if noise_mode == "per_batch":
                        row = jnp.stack(keys)
                        keys = jnp.stack(
                            [jnp.stack([row] * num_noise)]
                            * num_microbatches)  # (MB, N, K), values moot
                    jax.block_until_ready(scorer(params, d, keys, eps_arr))
                except Exception:
                    pass

            threading.Thread(target=_warm_lane, daemon=True).start()

    for kind, i0, payload, plan in units:
        if progress is not None:
            name = payload[0].name if kind == "group" else payload.name
            progress(i0, name)
        if kind == "group":
            flush_pending()  # keep serial/ensemble result ordering sane
            _score_group(i0, payload, plan)
        else:
            _score_serial(i0, payload)
    flush_pending()
    return scores


def mezo_group_sums(
    params: PyTree,
    targets: List[WeightTarget],
    leaf_scores: Dict[str, jax.Array],
    score_compute: str = "MEZO-GradOnly",
) -> Dict[str, float]:
    """Per-target importance *sums* as HOST floats (what group aggregation
    consumes).

    The reference materializes per-element importance tensors and then calls
    ``.sum()`` per layer (return_sparsity, :370). Since the MeZO score is a
    scalar s per tensor, the sums factor analytically — Σ(|W|·s) = s·Σ|W| —
    so we never materialize the per-element tensors.
    """
    import numpy as np

    if score_compute == "MEZO-GradOnly":
        # importance tensor is the scalar itself (shape [1] in reference);
        # scores are already host floats — no device round-trip
        return {t.name: abs(float(leaf_scores[t.name])) for t in targets}
    if score_compute not in ("MEZO-GradMagAbs", "MEZO-GradMagSquare"):
        raise ValueError(f"unknown MeZO score method {score_compute!r}")
    square = score_compute == "MEZO-GradMagSquare"

    # ONE stacked program + ONE readback for all targets' weight reductions:
    # per-target float(jnp.sum(|W|)) costs a ~30 ms tunnel round trip each
    # (~18 s across a BLIP-2 XL coarse stage's 588 targets)
    @jax.jit
    def _weight_sums(p):
        vals = []
        for t in targets:
            w = t.get(p).astype(jnp.float32)
            vals.append(jnp.sum(w * w) if square else jnp.sum(jnp.abs(w)))
        return jnp.stack(vals)

    wsums = np.asarray(_weight_sums(params))
    out: Dict[str, Any] = {}
    for t, ws in zip(targets, wsums):
        s = float(leaf_scores[t.name])
        out[t.name] = (s * s) * float(ws) if square else abs(s) * float(ws)
    return out
