"""Suffix-cached MeZO loss plans must be score-identical to the full path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import blip2
from ecoflap_tpu.pruning.pruners import WandaPruner


def _batch(cfg, n=8, src=6, tgt=5, seed=0):
    rng = np.random.default_rng(seed)
    img = cfg.vit.img_size
    labels = rng.integers(2, cfg.t5.vocab_size, size=(n, tgt))
    return {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_input_ids": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, src)), jnp.int32),
        "text_input_mask": jnp.ones((n, src), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }


def test_plan_loss_matches_full_loss():
    """Every stack's suffix plan at start=0 is the same function of the same
    params as the full loss."""
    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    ad = blip2.make_adapter(cfg, params)
    plans = ad.build_mezo_plans(params, batch)
    assert plans[0].match("visual_encoder.blocks.0.attn.qkv.weight")
    assert plans[1].match("t5_model.encoder.block.0.layer.0.SelfAttention.q.weight")
    assert plans[2].match("t5_model.decoder.block.0.layer.2.DenseReluDense.wo.weight")
    assert not plans[0].match("t5_model.encoder.block.0.layer.0.SelfAttention.q.weight")
    full = np.asarray(ad.loss_fn(params, batch))
    for plan in plans:
        fast = np.asarray(plan.loss_fn(params, plan.data))
        np.testing.assert_allclose(fast, full, rtol=1e-5, atol=1e-5)


def test_plan_loss_matches_at_advanced_block():
    """Rolling the cache to block i and running the masked suffix scan must
    reproduce the full loss (prefix cached, suffix live)."""
    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    ad = blip2.make_adapter(cfg, params)
    full = np.asarray(ad.loss_fn(params, batch))
    for plan, name in zip(ad.build_mezo_plans(params, batch), [
        f"visual_encoder.blocks.{cfg.vit.depth - 1}.mlp.fc2.weight",
        "t5_model.encoder.block.1.layer.1.DenseReluDense.wi_0.weight",
        "t5_model.decoder.block.1.layer.0.SelfAttention.v.weight",
    ]):
        data = plan.prepare(params, name)
        fast = np.asarray(plan.loss_fn(params, data))
        np.testing.assert_allclose(fast, full, rtol=2e-5, atol=2e-5)

    # out-of-order targets are rejected (the cache cannot roll back)
    with pytest.raises(ValueError):
        plan.prepare(params, "t5_model.decoder.block.0.layer.0.SelfAttention.q.weight")


def test_plan_scores_match_full_path():
    """MeZO scores via the suffix plans track the full path across all three
    stacks and multiple blocks (same z per target; differences only from f32
    summation order)."""
    from ecoflap_tpu.pruning.mezo import mezo_leaf_scores

    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    ad = blip2.make_adapter(cfg, params)
    all_targets = ad.targets()
    # a spread: vit blocks 0/2, enc 0/1, dec 0/1 — exercises cache rolling
    picks = [t for t in all_targets if t.name in {
        "visual_encoder.blocks.0.attn.qkv.weight",
        "visual_encoder.blocks.2.mlp.fc1.weight",
        "t5_model.encoder.block.0.layer.0.SelfAttention.q.weight",
        "t5_model.encoder.block.1.layer.1.DenseReluDense.wi_0.weight",
        "t5_model.decoder.block.0.layer.1.EncDecAttention.v.weight",
        "t5_model.decoder.block.1.layer.2.DenseReluDense.wo.weight",
    }]
    assert len(picks) == 6

    plans = ad.build_mezo_plans(params, batch)
    key = jax.random.PRNGKey(7)
    # larger eps than production: the projected gradient is a divided
    # difference, so its float-order noise scales as loss_rounding/eps —
    # at eps=1e-3 and tiny-model scores ~1e-3 the noise would swamp the
    # comparison even between two orderings of the SAME path
    fast = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks,
                            key=key, loss_plans=plans, eps=0.02)
    slow = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks,
                            key=key, loss_plans=None, eps=0.02)
    for k in fast:
        f, s = float(fast[k]), float(slow[k])
        assert abs(f - s) <= 0.05 * max(abs(s), 1e-3) + 1e-4, (k, f, s)


def test_warm_plans_leave_scores_unchanged(monkeypatch):
    """ECOFLAP_WARM_PLANS overlaps later stacks' program compiles in daemon
    threads (mezo.py); the throwaway warm evals must not perturb the scores
    the main thread computes."""
    from ecoflap_tpu.pruning.mezo import mezo_leaf_scores

    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    ad = blip2.make_adapter(cfg, params)
    picks = [t for t in ad.targets() if t.name in {
        "visual_encoder.blocks.0.attn.qkv.weight",
        "t5_model.encoder.block.0.layer.0.SelfAttention.q.weight",
        "t5_model.decoder.block.1.layer.2.DenseReluDense.wo.weight",
    }]
    key = jax.random.PRNGKey(7)

    monkeypatch.setenv("ECOFLAP_WARM_PLANS", "0")
    cold = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks, key=key,
                            loss_plans=ad.build_mezo_plans(params, batch),
                            eps=0.02)
    monkeypatch.setenv("ECOFLAP_WARM_PLANS", "1")
    warm = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks, key=key,
                            loss_plans=ad.build_mezo_plans(params, batch),
                            eps=0.02)
    for k in cold:
        c, w = float(cold[k]), float(warm[k])
        # only the perturb/restore ulp drift between the two invocations
        assert abs(c - w) <= 0.02 * max(abs(c), 1e-3) + 1e-5, (k, c, w)


def test_plan_scores_match_per_batch_mode():
    """Suffix plans under the reference-parity per_batch sampling."""
    from ecoflap_tpu.pruning.mezo import mezo_leaf_scores

    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    ad = blip2.make_adapter(cfg, params)
    picks = [t for t in ad.targets() if t.name in {
        "visual_encoder.blocks.1.attn.proj.weight",
        "t5_model.decoder.block.1.layer.0.SelfAttention.q.weight",
    }]
    plans = ad.build_mezo_plans(params, batch)
    key = jax.random.PRNGKey(3)
    fast = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks, key=key,
                            loss_plans=plans, noise_mode="per_batch", eps=0.02)
    slow = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks, key=key,
                            loss_plans=None, noise_mode="per_batch", eps=0.02)
    for k in fast:
        f, s = float(fast[k]), float(slow[k])
        assert abs(f - s) <= 0.05 * max(abs(s), 1e-3) + 1e-4, (k, f, s)


def test_llama_suffix_plan_scores_match():
    """Single-stack decoder-only suffix plan: shared (1,1,S,S) causal-bias
    cache leaves must ride whole through chunking and microbatch slicing."""
    from ecoflap_tpu.models import llama
    from ecoflap_tpu.pruning.mezo import mezo_leaf_scores

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {"input_ids": jnp.asarray(
        rng.integers(2, cfg.vocab_size, size=(8, 12)), jnp.int32)}
    ad = llama.make_adapter(cfg, params)
    picks = [t for t in ad.targets() if t.name in {
        "model.layers.0.self_attn.q_proj.weight",
        "model.layers.1.mlp.down_proj.weight",
    }]
    plans = ad.build_mezo_plans(params, batch, num_chunks=2)
    key = jax.random.PRNGKey(11)
    for mode in ("shared", "per_batch"):
        fast = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks, key=key,
                                loss_plans=plans, noise_mode=mode, eps=0.02,
                                eval_chunks=2 if mode == "shared" else None)
        plans = ad.build_mezo_plans(params, batch, num_chunks=2)  # fresh cache
        slow = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks, key=key,
                                loss_plans=None, noise_mode=mode, eps=0.02,
                                eval_chunks=2 if mode == "shared" else None)
        for k in fast:
            f, s = float(fast[k]), float(slow[k])
            assert abs(f - s) <= 0.05 * max(abs(s), 1e-3) + 1e-4, (mode, k, f, s)
