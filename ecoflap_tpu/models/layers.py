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


def activation(name: str):
    return {"gelu": gelu, "quick_gelu": quick_gelu, "relu": jax.nn.relu}[name]


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head scaled-dot-product attention, bias-additive.

    Args:
      q: (B, Sq, H·Dh) projected queries.
      k/v: (B, Sk, H·Dh) projected keys/values.
      num_heads: H.
      scale: score scale; default Dh^-0.5; pass 1.0 for T5 (unscaled).
      bias: additive score bias broadcastable to (B, H, Sq, Sk) — attention
        masks (0 / -inf style) and/or relative position biases.

    Softmax runs in float32 (TPU-safe for bf16 activations); output returns in
    the query dtype.
    """
    b, sq, _ = q.shape
    sk = k.shape[1]
    dh = q.shape[-1] // num_heads
    if scale is None:
        scale = dh**-0.5
    qh = q.reshape(b, sq, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, num_heads, dh).transpose(0, 2, 1, 3)
    # Routed through ops/attention.py: short sequences keep the exact naive
    # score-tensor math (bit-compatible CPU parity tests), long ones go
    # memory-efficient (chunked online softmax / Pallas flash on TPU).
    from ecoflap_tpu.ops.attention import mha

    out = mha(qh, kh, vh, sm_scale=scale, bias=bias)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, num_heads * dh).astype(q.dtype)


def extract_patches(x: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, C) NHWC image -> (B, N, patch·patch·C) patch sequence.

    TPU-native replacement for the reference's Conv2d patch embed
    (eva_vit.py:199-210): a reshape/transpose feeding one big matmul keeps the
    FLOPs on the MXU instead of a convolution with stride == kernel size.
    Patch pixel ordering matches Conv2d weight layout flattened as
    (C, ph, pw) -> the checkpoint converter reshapes conv kernels accordingly.
    """
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, gh, gw, C, ph, pw)
    return x.reshape(b, gh * gw, c * patch * patch)


def causal_bias(seq: int, dtype=jnp.float32) -> jax.Array:
    """(1, 1, S, S) additive causal mask (-inf above the diagonal)."""
    mask = jnp.tril(jnp.ones((seq, seq), jnp.bool_))
    return jnp.where(mask, 0.0, -jnp.inf).astype(dtype)[None, None]


def mask_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, Sk) 0/1 attention mask -> (B, 1, 1, Sk) additive bias.

    Uses a large-negative instead of -inf so fully-masked rows (all-pad
    sequences in a batched calibration set) softmax to uniform, not NaN.
    """
    return jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(dtype)


# -- tower scan with opt-in gradient rematerialization ------------------------

_SCAN_STATE = __import__("threading").local()


def scan_remat_active() -> bool:
    return getattr(_SCAN_STATE, "remat", False)


class remat_scans:
    """Trace-time switch: tower scans traced inside this context wrap their
    bodies in ``jax.checkpoint``, so a backward pass recomputes each block's
    internals instead of saving them. Without it, differentiating a scanned
    tower stacks EVERY intermediate across layers as residuals — at BLIP-2 XL
    the EVA-ViT scan alone saves f32[39,8,16,257,257] attention scores
    (1.9 GB) plus ~10 GB of friends, which is what OOM'd the first-order
    scorer on a 16 GB chip. Forward-only paths are unaffected (the flag is
    read when the scan is TRACED; already-compiled programs keep their
    behavior)."""

    def __enter__(self):
        self._prev = scan_remat_active()
        _SCAN_STATE.remat = True
        return self

    def __exit__(self, *exc):
        _SCAN_STATE.remat = self._prev
        return False


def tower_scan(body, init, xs, remat=None):
    """``jax.lax.scan`` for stacked-block towers.

    ``remat`` explicitly requests checkpointed bodies; when None it falls
    back to the ``remat_scans`` context flag. The flag is TRACE-time state
    (now thread-local): a jit compiled for the same shapes OUTSIDE the
    context is silently reused without remat, so grad programs that need the
    memory relief must build fresh jits inside the context (first_order.py
    does) or pass ``remat=True`` explicitly and key their jit cache on it.

    ``prevent_cse=False``: inside scan the extra CSE-blocking machinery is
    unnecessary (the loop boundary already prevents the problematic CSE) and
    it bloats the lowered backward enormously — the axon remote compile of
    the checkpointed 39-block EVA-ViT backward took 477 s with the default
    and is the dominant cost of first-order scoring at XL."""
    if remat if remat is not None else scan_remat_active():
        body = jax.checkpoint(body, prevent_cse=False)
    return jax.lax.scan(body, init, xs)
