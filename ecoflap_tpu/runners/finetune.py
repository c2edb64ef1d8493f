"""Masked fine-tuning — the reference's "ECoFLaP w/ FT" rows.

UPop-style sparsity-preserving training (UPop/ecoflap_compress_caption.py:
82-156,294-311): freeze the pruned-weight masks ``(p != 0)`` once after
pruning, then train normally but multiply every gradient by its mask before
the optimizer step so pruned weights stay exactly zero through AdamW.

TPU-native: one jitted ``train_step`` (loss -> grad -> mask -> optax update)
that pjit-shards over the (dp, tp) mesh — gradients all-reduce over dp via
XLA's psum, masks shard like their weights so masking is local.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

PyTree = Any
LossFn = Callable[[PyTree, Any], jax.Array]  # -> (B,) per-sample losses


def make_sparsity_masks(params: PyTree) -> PyTree:
    """Frozen masks (p != 0) per leaf (ecoflap_compress_caption.py:295-298)."""
    return jax.tree_util.tree_map(lambda p: (p != 0), params)


def apply_masks(tree: PyTree, masks: PyTree) -> PyTree:
    return jax.tree_util.tree_map(
        lambda g, m: g * m.astype(g.dtype), tree, masks
    )


def make_train_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
):
    """Jitted masked train step: (params, opt_state, masks, batch) ->
    (params, opt_state, loss). Gradient masking BEFORE the optimizer update
    reproduces the reference's ``grad *= mask`` (:114-118,133-139); a second
    parameter masking after the update guards against optimizer terms (weight
    decay) resurrecting pruned weights."""

    def step(params, opt_state, masks, batch):
        def scalar_loss(p):
            return jnp.mean(loss_fn(p, batch))

        loss, grads = jax.value_and_grad(scalar_loss)(params)
        grads = apply_masks(grads, masks)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = apply_masks(params, masks)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def finetune(
    loss_fn: LossFn,
    params: PyTree,
    batches,
    learning_rate: float = 1e-5,
    weight_decay: float = 0.05,
    optimizer: Optional[optax.GradientTransformation] = None,
    verbose: bool = False,
) -> Tuple[PyTree, list]:
    """Run masked fine-tuning over an iterable of batches. Returns
    (params, losses). AdamW defaults mirror the reference runs
    (UPop init_lr 1e-5 / weight_decay 0.05)."""
    if optimizer is None:
        optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
    masks = make_sparsity_masks(params)
    opt_state = optimizer.init(params)
    step = make_train_step(loss_fn, optimizer)
    losses = []
    for i, batch in enumerate(batches):
        params, opt_state, loss = step(params, opt_state, masks, batch)
        losses.append(float(loss))
        if verbose:
            print(f"step {i}: loss {losses[-1]:.4f}")
    return params, losses
