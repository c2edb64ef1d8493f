"""ops/attention.py: chunked online-softmax vs naive parity, mode
resolution, and the llama pure-causal cache path.

The flash (Pallas) path is TPU-only and exercised by the device drive
(tools/verify_drive.py) — here we lock the XLA-portable paths that every
backend shares."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import llama
from ecoflap_tpu.ops.attention import _flash_eligible, mha, resolve_mode


def _qkv(key, b, h, sq, sk, dh, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, sq, dh), dtype)
    k = jax.random.normal(ks[1], (b, h, sk, dh), dtype)
    v = jax.random.normal(ks[2], (b, h, sk, dh), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
def test_chunked_matches_naive(causal, with_bias):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 3, 64, 64, 16)
    bias = None
    if with_bias:
        bias = jax.random.normal(jax.random.PRNGKey(9), (1, 1, 64, 64))
    ref = mha(q, k, v, sm_scale=0.25, bias=bias, causal=causal, mode="naive")
    out = mha(q, k, v, sm_scale=0.25, bias=bias, causal=causal,
              mode="chunked", kv_chunk=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_chunked_cross_attention_batched_bias():
    # Sq != Sk and a per-batch-per-head bias (T5-style rel-pos + mask)
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 4, 48, 96, 8)
    bias = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 48, 96))
    ref = mha(q, k, v, sm_scale=1.0, bias=bias, mode="naive")
    out = mha(q, k, v, sm_scale=1.0, bias=bias, mode="chunked", kv_chunk=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_chunked_ragged_tail_falls_back():
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, 33, 33, 8)
    ref = mha(q, k, v, sm_scale=1.0, causal=True, mode="naive")
    out = mha(q, k, v, sm_scale=1.0, causal=True, mode="chunked", kv_chunk=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_chunked_bf16_close_to_naive_f32():
    q, k, v = _qkv(jax.random.PRNGKey(4), 1, 2, 64, 64, 16)
    ref = mha(q, k, v, sm_scale=0.25, causal=True, mode="naive")
    out = mha(*(t.astype(jnp.bfloat16) for t in (q, k, v)),
              sm_scale=0.25, causal=True, mode="chunked", kv_chunk=16)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_resolve_mode_auto():
    q, k, v = _qkv(jax.random.PRNGKey(5), 1, 1, 64, 64, 8)
    assert resolve_mode(q, k, True, None) == "naive"  # short seq
    ql, kl, _ = _qkv(jax.random.PRNGKey(6), 1, 1, 1024, 1024, 8)
    assert resolve_mode(ql, kl, True, None) == "chunked"  # long, CPU
    # decode step (Sq=1) stays naive even with a long KV
    qd = q[:, :, :1]
    assert resolve_mode(qd, kl, False, None) == "naive"


def test_flash_eligibility_rules():
    q, k, _ = _qkv(jax.random.PRNGKey(7), 1, 2, 2048, 2048, 128)
    assert _flash_eligible(q, k, True, None)
    assert not _flash_eligible(q, k, False, None)       # not causal
    assert not _flash_eligible(q, k, True, jnp.zeros(1))  # ad-hoc bias
    q96, k96, _ = _qkv(jax.random.PRNGKey(8), 1, 2, 2048, 2048, 96)
    assert not _flash_eligible(q96, k96, True, None)    # head dim not 128k
    with pytest.raises(ValueError):
        mha(q, k, _, causal=False, mode="flash")


def test_llama_causal_cache_matches_explicit_mask():
    """bias=None pure-causal cache == all-ones padding mask (which builds
    the explicit causal+mask bias): the flash-eligible path is numerically
    the same model."""
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 2, cfg.vocab_size)
    logits_causal = llama.forward(cfg, params, ids)
    logits_masked = llama.forward(cfg, params, ids, jnp.ones_like(ids))
    np.testing.assert_allclose(np.asarray(logits_causal),
                               np.asarray(logits_masked), atol=1e-5)


@pytest.mark.skipif(os.environ.get("ECOFLAP_TPU_TESTS") != "1",
                    reason="Pallas flash kernel needs a real TPU")
def test_flash_matches_naive_tpu():
    """Flash (tuned BlockSizes, fwd + bwd) vs naive at the LLaMA
    calibration shape; bf16-level agreement."""
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 8, 2048, 2048, 128, jnp.bfloat16)
    ref = mha(q, k, v, sm_scale=128**-0.5, causal=True, mode="naive")
    out = mha(q, k, v, sm_scale=128**-0.5, causal=True, mode="flash")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.05, rtol=0.05)
    gf = jax.grad(lambda q: jnp.sum(
        mha(q, k, v, sm_scale=128**-0.5, causal=True, mode="flash")
        .astype(jnp.float32)))(q)
    gn = jax.grad(lambda q: jnp.sum(
        mha(q, k, v, sm_scale=128**-0.5, causal=True, mode="naive")
        .astype(jnp.float32)))(q)
    np.testing.assert_allclose(np.asarray(gf, np.float32),
                               np.asarray(gn, np.float32), atol=0.1, rtol=0.1)


def test_flash_block_sizes_divide_sequence():
    """Every flash-eligible seqlen (multiples of 512) must get block sizes
    that divide it — the Pallas kernel's _verify_block rejects non-divisors
    (1536 with a 1024 block crashed before this was derived per-shape)."""
    from ecoflap_tpu.ops.attention import flash_block_sizes

    for s in (512, 1024, 1536, 2048, 2560, 3584, 4096):
        bs = flash_block_sizes(s, s)
        for name in ("block_q", "block_k_major", "block_k",
                     "block_q_major_dkv", "block_k_major_dkv", "block_k_dkv",
                     "block_q_dkv", "block_k_major_dq", "block_k_dq",
                     "block_q_dq"):
            b = getattr(bs, name)
            assert s % b == 0, (s, name, b)
            assert b >= 128
    assert flash_block_sizes(2048, 2048).block_q == 1024  # tuned fast path
    assert flash_block_sizes(1536, 1536).block_q == 512


def test_llama_forward_chunked_env(monkeypatch):
    monkeypatch.setenv("ECOFLAP_ATTN", "chunked")
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 2, cfg.vocab_size)
    chunked = llama.forward(cfg, params, ids)
    monkeypatch.setenv("ECOFLAP_ATTN", "naive")
    naive = llama.forward(cfg, params, ids)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(naive),
                               atol=1e-4, rtol=1e-4)
