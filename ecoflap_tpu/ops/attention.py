"""Memory-efficient attention for long-sequence model paths.

The model zoo's default attention (models/layers.py:attention) materializes
the full (B, H, Sq, Sk) score tensor — fine at BLIP-2's 257 visual tokens,
but at a LLaMA calibration window (S=2048) the scores alone are
``B·32·2048²`` elements: 8.6 GB bf16 for a 32-sample chunk. The reference
never hits this because torch SDPA dispatches to fused kernels
(LLaMA/main.py uses the stock HF model); the TPU-native answer is the same
idea with TPU machinery:

* ``flash``  — the Pallas TPU flash-attention kernel
  (jax.experimental.pallas.ops.tpu.flash_attention): tiled online-softmax
  entirely in VMEM, causal tiles skipped at grid level. The speed-of-light
  path on real hardware.
* ``chunked`` — a pure-XLA online-softmax fallback (lax.scan over KV
  chunks, f32 running max/denominator/accumulator). Works on every backend
  (CPU tests, interpret mode), O(S·chunk) score memory instead of O(S²),
  numerically the standard flash recurrence.
* ``naive``  — the exact score-tensor math of models/layers.py:attention,
  kept bit-identical for parity tests.

Mode resolution (``ECOFLAP_ATTN`` env: auto|naive|chunked|flash, default
auto): flash on TPU when the layout fits the kernel's tiling, chunked for
long sequences elsewhere, naive for short ones (where the score tensor is
cheaper than the scan).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_CHUNK_MIN_SEQ = 1024  # below this the naive score tensor is cheap
_KV_CHUNK = 512


def _env_mode() -> str:
    return os.environ.get("ECOFLAP_ATTN", "auto")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _flash_eligible(qh, kh, causal: bool, bias) -> bool:
    """The Pallas kernel wants no ad-hoc bias (causality is handled by tile
    skipping), block-divisible sequence lengths, and a lane-aligned head
    dim."""
    b, h, sq, dh = qh.shape
    sk = kh.shape[2]
    return (
        bias is None
        and causal
        and sq == sk
        and sq % 512 == 0
        and dh % 128 == 0
    )


def resolve_mode(qh, kh, causal: bool, bias) -> str:
    mode = _env_mode()
    if mode != "auto":
        if mode == "flash" and not _flash_eligible(qh, kh, causal, bias):
            raise ValueError(
                "ECOFLAP_ATTN=flash but shapes/bias are not flash-eligible "
                f"(q {qh.shape}, k {kh.shape}, causal={causal}, "
                f"bias={'None' if bias is None else 'present'})"
            )
        return mode
    if _on_tpu() and _flash_eligible(qh, kh, causal, bias):
        return "flash"
    if qh.shape[2] >= _CHUNK_MIN_SEQ and kh.shape[2] >= _CHUNK_MIN_SEQ:
        return "chunked"
    return "naive"


def _causal_bias(sq: int, sk: int, dtype) -> jax.Array:
    """The models' standard causal bias (0 / -1e9 tril), built on demand so
    pure-causal callers can pass bias=None (flash eligibility)."""
    return jnp.where(
        jnp.tril(jnp.ones((sq, sk), jnp.bool_)), 0.0, -1e9
    )[None, None].astype(dtype)


def _naive(qh, kh, vh, sm_scale, bias, causal):
    """Bit-identical to models/layers.py:attention on the same inputs."""
    # scores accumulate in the query dtype (the expression is what
    # models/layers.py:attention does — kept bit-identical)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh * sm_scale, kh,
        preferred_element_type=qh.dtype,
    )
    if causal:
        scores = scores + _causal_bias(
            qh.shape[2], kh.shape[2], scores.dtype)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vh.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32
    ).astype(qh.dtype)


def _chunked(qh, kh, vh, sm_scale, bias, causal, kv_chunk):
    """Online-softmax over KV chunks: running max m, denominator l and
    weighted accumulator acc, all f32 — the flash recurrence in plain lax.
    Peak score memory is (B, H, Sq, kv_chunk) instead of (B, H, Sq, Sk)."""
    b, h, sq, dh = qh.shape
    sk = kh.shape[2]
    kv_chunk = min(kv_chunk, sk)
    if sk % kv_chunk:  # ragged tail: fall back rather than pad+mask
        return _naive(qh, kh, vh, sm_scale, bias, causal)
    n = sk // kv_chunk

    qf = (qh * sm_scale).astype(jnp.float32)
    kc = kh.reshape(b, h, n, kv_chunk, dh).transpose(2, 0, 1, 3, 4)
    vc = vh.reshape(b, h, n, kv_chunk, dh).transpose(2, 0, 1, 3, 4)
    bc = None
    if bias is not None:
        bias = jnp.broadcast_to(
            bias.astype(jnp.float32), (bias.shape[0], bias.shape[1], sq, sk))
        bc = bias.reshape(*bias.shape[:2], sq, n, kv_chunk).transpose(3, 0, 1, 2, 4)
    q_pos = jnp.arange(sq)[:, None]

    def step(carry, xs):
        m, l, acc = carry
        j, kj, vj, bj = xs
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kj.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if bj is not None:
            s = s + bj
        if causal:
            k_pos = j * kv_chunk + jnp.arange(kv_chunk)[None, :]
            s = s + jnp.where(q_pos >= k_pos, 0.0, -1e9)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vj.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, h, sq), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, sq), jnp.float32),
        jnp.zeros((b, h, sq, dh), jnp.float32),
    )
    xs = (jnp.arange(n), kc, vc, bc)
    (m, l, acc), _ = jax.lax.scan(step, init, xs)
    return (acc / l[..., None]).astype(qh.dtype)


def flash_block_sizes(sq: int, sk: int):
    """Tuned on TPU v5e at (4, 32, 2048, 128): 1024-wide q/k blocks run the
    kernel in 2.9 ms vs 12.7 ms with the library's 128-default blocks and
    7.2 ms for the XLA naive path (the MXU wants ≥512-row tiles; 2048
    blocks exceed VMEM and fail compile). block_b stays 1 — batch blocking
    gained <5% and breaks at small batches. Blocks must DIVIDE the
    sequence (the kernel's ``_verify_block`` asserts it), so pick the
    largest tuned size that does — eligibility guarantees ``s % 512 == 0``,
    hence 512 always divides (e.g. seqlen 1536/2560 get 512-wide blocks,
    2048/4096 get 1024)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    def _block(s, cap):
        return max(b for b in (1024, 512, 256, 128) if b <= cap and s % b == 0)

    blk = lambda s: _block(s, 1024)
    bwd = lambda s: _block(s, 512)  # backward holds dQ/dK/dV + residuals
    return BlockSizes(
        block_q=blk(sq), block_k_major=blk(sk), block_k=blk(sk), block_b=1,
        block_q_major_dkv=bwd(sq), block_k_major_dkv=bwd(sk),
        block_k_dkv=bwd(sk), block_q_dkv=bwd(sq),
        block_k_major_dq=bwd(sk), block_k_dq=bwd(sk), block_q_dq=bwd(sq),
    )


def _flash(qh, kh, vh, sm_scale, causal):
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    return flash_attention(
        qh, kh, vh, causal=causal, sm_scale=float(sm_scale),
        block_sizes=flash_block_sizes(qh.shape[2], kh.shape[2]),
    ).astype(qh.dtype)


def mha(
    qh: jax.Array,
    kh: jax.Array,
    vh: jax.Array,
    *,
    sm_scale: float = 1.0,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    mode: Optional[str] = None,
    kv_chunk: int = _KV_CHUNK,
) -> jax.Array:
    """Multi-head attention over head-split tensors.

    Args:
      qh/kh/vh: (B, H, S, Dh). GQA callers broadcast KV heads beforehand.
      sm_scale: score scale (Dh^-0.5 for standard attention, 1.0 for T5).
      bias: additive score bias broadcastable to (B, H, Sq, Sk); pure-causal
        callers should pass bias=None + causal=True so the flash kernel
        stays eligible.
      causal: apply causal masking (in addition to ``bias`` if both given).
      mode: force a path; None resolves via ECOFLAP_ATTN/auto.
    """
    if mode is None:
        mode = resolve_mode(qh, kh, causal, bias)
    if mode == "flash":
        if not _flash_eligible(qh, kh, causal, bias):
            raise ValueError(
                "flash attention requires causal, bias-free, block-divisible "
                f"shapes (q {qh.shape}, k {kh.shape}, causal={causal})"
            )
        return _flash(qh, kh, vh, sm_scale, causal)
    if mode == "chunked":
        return _chunked(qh, kh, vh, sm_scale, bias, causal, kv_chunk)
    if mode == "naive":
        return _naive(qh, kh, vh, sm_scale, bias, causal)
    raise ValueError(f"unknown attention mode {mode!r}")
