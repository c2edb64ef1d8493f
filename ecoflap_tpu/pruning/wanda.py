"""Wanda local pruning math — |W|·‖X‖₂ metric and masking, jittable.

Reference semantics reproduced exactly
(LAVIS/lavis/compression/pruners/wanda_pruner.py):

* activation statistic ``scaler_row`` — running per-column mean of squared
  activation L2 norms, normalized by the number of *sequences* (not tokens):
  ``WrappedGPT.add_batch`` (wanda_pruner.py:71-84).
* metric ``|W| * sqrt(scaler_row)`` broadcast over rows (wanda_pruner.py:260).
* T5-style masking is **per-row**: stable sort of each row, prune the lowest
  ``int(cols * ratio)`` entries (wanda_pruner.py:272-277).
* ViT-style masking is **per-tensor**: threshold at the
  ``int(numel * ratio)``-th smallest value, prune ``metric <= thres``
  (wanda_pruner.py:553-556). NB ties make this prune *at least* the requested
  fraction, exactly like the reference.
* n:m structured: within every group of ``m`` consecutive input columns,
  prune the ``n`` smallest per row (wanda_pruner.py:265-270).

All mask functions return boolean arrays where True == "prune this weight",
matching the reference's ``W_mask`` convention, and accept dynamic (traced)
ratios so they can be vmapped/scanned over layers with per-layer ratios.

Weight layout convention: ``W`` has shape ``(out_features, in_features)`` —
identical to ``nn.Linear.weight`` — so sparsity-dict semantics carry over.
Model code stores kernels as ``(in, out)``; adapters transpose at the
boundary.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def update_scaler_row(
    scaler_row: jax.Array, nsamples: jax.Array, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Fold one calibration batch into the running column-norm statistic.

    Args:
      scaler_row: (in_features,) float32 running statistic.
      nsamples: scalar int — sequences folded in so far.
      x: (batch, ..., in_features) activations entering the linear layer.

    Returns (new_scaler_row, new_nsamples). Matches WrappedGPT.add_batch:
    ``scaler_row = (scaler_row * n_old + sum(x**2 over tokens)) / n_new`` with
    n counted in leading-batch units.
    """
    tmp = x.shape[0]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    new_n = nsamples + tmp
    scaled_old = scaler_row * (nsamples / new_n)
    return scaled_old + jnp.sum(x2 * x2, axis=0) / new_n, new_n


def wanda_metric(w: jax.Array, scaler_row: jax.Array) -> jax.Array:
    """``|W| * sqrt(scaler_row)`` (wanda_pruner.py:260). w: (out, in)."""
    return jnp.abs(w.astype(jnp.float32)) * jnp.sqrt(scaler_row)[None, :]


def _stable_rank(metric: jax.Array, axis: int = -1) -> jax.Array:
    """Rank of each element under a stable ascending sort along ``axis``."""
    order = jnp.argsort(metric, axis=axis, stable=True)
    rank = jnp.argsort(order, axis=axis, stable=True)
    return rank


def mask_per_row(metric: jax.Array, ratio: jax.Array) -> jax.Array:
    """Per-row mask: prune the ``int(cols * ratio)`` smallest per row.

    Ties broken by position (stable), identical to the reference's
    ``torch.sort(..., stable=True)`` index-scatter (wanda_pruner.py:272-277)
    — computed sort-free (pruning/select.py; TPU sorts are the bottleneck).
    """
    from ecoflap_tpu.pruning.select import smallest_k_mask_per_row

    cols = metric.shape[-1]
    k = jnp.floor(cols * ratio).astype(jnp.int32)
    return smallest_k_mask_per_row(metric, k)


def mask_per_tensor(metric: jax.Array, ratio: jax.Array) -> jax.Array:
    """Per-tensor mask: ``metric <= kth_value`` (wanda_pruner.py:553-556),
    sort-free (pruning/select.py)."""
    from ecoflap_tpu.pruning.select import threshold_mask_per_tensor

    n = metric.size
    idx = jnp.clip(jnp.floor(n * ratio).astype(jnp.int32), 0, n - 1)
    return threshold_mask_per_tensor(metric, idx)


def mask_n_m(metric: jax.Array, prune_n: int, prune_m: int) -> jax.Array:
    """Structured n:m mask: per row, per consecutive group of ``m`` input
    columns, prune the ``n`` smallest (wanda_pruner.py:265-270)."""
    rows, cols = metric.shape
    if cols % prune_m != 0:
        raise ValueError(f"cols {cols} not divisible by m={prune_m}")
    grouped = metric.reshape(rows, cols // prune_m, prune_m)
    rank = _stable_rank(grouped, axis=-1)
    return (rank < prune_n).reshape(rows, cols)


def apply_mask(w: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero out weights where mask is True (W_mask convention)."""
    return jnp.where(mask, jnp.zeros((), dtype=w.dtype), w)


def wanda_prune_weight(
    w: jax.Array,
    scaler_row: jax.Array,
    ratio: jax.Array,
    per_row: bool = True,
    prune_n: int = 0,
    prune_m: int = 0,
) -> jax.Array:
    """One-shot Wanda prune of a single (out, in) weight. Jittable."""
    metric = wanda_metric(w, scaler_row)
    if prune_n != 0:
        mask = mask_n_m(metric, prune_n, prune_m)
    elif per_row:
        mask = mask_per_row(metric, ratio)
    else:
        mask = mask_per_tensor(metric, ratio)
    return apply_mask(w, mask)
