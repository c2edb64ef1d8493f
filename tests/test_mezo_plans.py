"""Cached-prefix MeZO loss plans must be score-identical to the full path."""

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
    """The cached-prefix loss is the same function of the same params."""
    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    ad = blip2.make_adapter(cfg, params)
    plan = ad.build_mezo_plans(params, batch)[0]
    assert plan.match("t5_model.encoder.block.0.layer.0.SelfAttention.q.weight")
    assert not plan.match("visual_encoder.blocks.0.attn.qkv.weight")
    full = np.asarray(ad.loss_fn(params, batch))
    fast = np.asarray(plan.loss_fn(params, plan.data))
    np.testing.assert_allclose(fast, full, rtol=1e-5, atol=1e-5)


def test_plan_scores_match_full_path():
    """MeZO scores via the cached-prefix plan track the full path (same z per
    target; differences only from f32 summation order)."""
    from ecoflap_tpu.pruning.mezo import mezo_leaf_scores

    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    ad = blip2.make_adapter(cfg, params)
    targets = [t for t in ad.targets()
               if t.name.startswith("t5_model.")][:4]

    plans = ad.build_mezo_plans(params, batch)
    key = jax.random.PRNGKey(7)
    fast = mezo_leaf_scores(ad.loss_fn, params, batch, 2, targets,
                            key=key, loss_plans=plans)
    slow = mezo_leaf_scores(ad.loss_fn, params, batch, 2, targets,
                            key=key, loss_plans=None)
    for k in fast:
        f, s = float(fast[k]), float(slow[k])
        assert abs(f - s) <= 0.05 * max(abs(s), 1e-3) + 1e-4, (k, f, s)
