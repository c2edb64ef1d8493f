"""Functional NN building blocks shared by the model zoo.

Calibration-statistics collection happens *inline*: every prunable linear
goes through ``dense(..., stats=..., name=..., collect=...)``, which folds the
per-column squared activation sums (Wanda) or the Gram matrix XᵀX (SparseGPT)
into a stats dict while computing the matmul. This replaces the reference's
forward hooks (wanda_pruner.py:241-248) — XLA fuses the statistic reduction
into the surrounding computation, so collection is nearly free.

Kernels are stored jax-convention ``(in, out)``; biases ``(out,)``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

PyTree = Any
Stats = Optional[Dict[str, jax.Array]]


def collect_stats(
    stats: Stats, name: str, x: jax.Array, collect: Optional[str]
) -> None:
    """Fold activation statistics for the linear named ``name`` whose input is
    ``x`` (..., in_features). Raw sums; engine normalizes by sequence count."""
    if stats is None or collect is None:
        return
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    if collect == "wanda":
        contrib = jnp.sum(flat * flat, axis=0)
    elif collect == "hessian":
        contrib = jnp.dot(flat.T, flat, preferred_element_type=jnp.float32)
    else:
        raise ValueError(f"unknown collect mode {collect!r}")
    stats[name] = stats.get(name, 0.0) + contrib


def dense(
    p: PyTree,
    x: jax.Array,
    *,
    name: str = "",
    stats: Stats = None,
    collect: Optional[str] = None,
) -> jax.Array:
    """y = x @ kernel + bias, with optional inline stat collection."""
    collect_stats(stats, name, x, collect)
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def layer_norm(p: PyTree, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def rms_norm(p: PyTree, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """T5/LLaMA-style RMSNorm (no mean subtraction, no bias)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p["scale"]).astype(x.dtype)


def gelu(x: jax.Array, approximate: bool = True) -> jax.Array:
    return jax.nn.gelu(x, approximate=approximate)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's x·sigmoid(1.702x) (CoOp/clip/model.py QuickGELU)."""
    return x * jax.nn.sigmoid(1.702 * x)
