"""First-order importance scoring (ECoFLaP coarse stage, gradient variant).

Mirrors ``LayerSparsity.compute_importance_scores``
(LAVIS/lavis/compression/pruners/layer_single_base_pruner.py:416-471):
per calibration batch, take gradients of the batch-mean loss w.r.t. the
target weights and accumulate ``|g|`` (or ``g²`` for GradMagSquare);
normalize by the number of batches; importance variants:

  GradMagSquare:  W² · Σg²/nb
  GradMagAbs:     |W| · Σ|g|/nb
  GradOnly:       Σ|g|/nb

TPU mapping: gradients are computed by one jitted ``value_and_grad`` over
*only* the pytree leaves containing targets (the rest of the params enter as
non-differentiated constants), so embeddings/norms never materialize f32
gradients. Accumulation stays on device in f32 — no CPU round-trips like the
reference's ``v.cpu()`` (layer_single_base_pruner.py:453-455).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp

from ecoflap_tpu.pruning.targets import WeightTarget

PyTree = Any
# loss_fn(params, batch) -> (B,) per-sample losses
LossFn = Callable[[PyTree, Any], jax.Array]


def accumulate_gradients(
    loss_fn: LossFn,
    params: PyTree,
    batches: Sequence[Any],
    targets: List[WeightTarget],
    square: bool = False,
) -> Dict[str, jax.Array]:
    """Return per-target accumulated gradient statistics (torch layout).

    ``batches`` is a sequence of batch pytrees; the loss per batch is the mean
    of the per-sample losses (matching the reference's model-returned mean
    loss). Accumulates Σ|g| (or Σg²) / num_batches.

    Gradients share the params' pytree structure, so each target's view is
    extracted with the target's own accessor (``t.get(grads)``) — works for
    both path-addressed and stack-routed targets.
    """

    def batch_loss(p, batch):
        return jnp.mean(loss_fn(p, batch))

    @jax.jit
    def grad_stats(p, batch):
        g = jax.grad(batch_loss)(p, batch)
        return {
            t.name: (
                (t.get(g).astype(jnp.float32)) ** 2
                if square
                else jnp.abs(t.get(g).astype(jnp.float32))
            )
            for t in targets
        }

    acc: Dict[str, jax.Array] = {}
    nb = 0
    for batch in batches:
        stats = grad_stats(params, batch)
        for k, v in stats.items():
            acc[k] = acc.get(k, 0.0) + v
        nb += 1
    if nb == 0:
        raise ValueError("no calibration batches provided")
    return {k: v / nb for k, v in acc.items()}


def first_order_group_sums(
    loss_fn: LossFn,
    params: PyTree,
    batches: Sequence[Any],
    targets: List[WeightTarget],
    score_compute: str = "GradMagAbs",
) -> Dict[str, jax.Array]:
    """Per-target importance SUMS — all the coarse-stage allocator needs.

    Memory: reduces each microbatch's gradient to one scalar per target
    INSIDE the jit, so only the (transient) gradient tree and 588 scalars
    ever exist — never a second params-sized importance accumulation. This is
    what lets first-order scoring of a 4B BLIP-2 fit a 16 GB chip (the
    reference holds full CPU-side grad accumulators and peaks at 22.4 GB,
    BASELINE.md first-order row).

    Matches ``Σ per-element importance`` of ``first_order_importance`` exactly:
      GradMagAbs:    Σ |W| · (Σ_b |g_b| / nb)   — |g| sums are per-batch, so
                     the scalar per batch is Σ|W|·|g_b| and the outer mean
                     over batches commutes with the elementwise sum.
    """
    square = score_compute == "GradMagSquare"

    def batch_loss(p, batch):
        return jnp.mean(loss_fn(p, batch))

    @jax.jit
    def grad_scalar_stats(p, batch):
        g = jax.grad(batch_loss)(p, batch)
        out = {}
        for t in targets:
            gt = t.get(g).astype(jnp.float32)
            gt = gt * gt if square else jnp.abs(gt)
            if score_compute == "GradOnly":
                out[t.name] = jnp.sum(gt)
            else:
                w = t.get(p).astype(jnp.float32)
                w = w * w if square else jnp.abs(w)
                out[t.name] = jnp.sum(w * gt)
        return out

    acc: Dict[str, float] = {}
    nb = 0
    for batch in batches:
        stats = grad_scalar_stats(params, batch)
        for k, v in stats.items():
            acc[k] = acc.get(k, 0.0) + float(v)  # host floats; bounds dispatch
        nb += 1
    if nb == 0:
        raise ValueError("no calibration batches provided")
    return {k: v / nb for k, v in acc.items()}


def first_order_importance(
    loss_fn: LossFn,
    params: PyTree,
    batches: Sequence[Any],
    targets: List[WeightTarget],
    score_compute: str = "GradMagAbs",
) -> Dict[str, jax.Array]:
    """Per-target importance tensors for Grad* score methods
    (layer_single_base_pruner.py:452-469)."""
    square = score_compute == "GradMagSquare"
    grads = accumulate_gradients(loss_fn, params, batches, targets, square=square)

    out: Dict[str, jax.Array] = {}
    for t in targets:
        g = grads[t.name]
        if score_compute == "GradMagSquare":
            w = t.get(params).astype(jnp.float32)
            out[t.name] = (w * w) * g
        elif score_compute == "GradMagAbs":
            w = t.get(params).astype(jnp.float32)
            out[t.name] = jnp.abs(w) * jnp.abs(g)
        elif score_compute == "GradOnly":
            out[t.name] = jnp.abs(g)
        else:
            raise ValueError(f"unknown first-order score method {score_compute!r}")
    return out
