"""BLIP-2: composition forward, loss, generate, 3-stack ECoFLaP prune."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import blip2
from ecoflap_tpu.models.generation import GenerateConfig
from ecoflap_tpu.pruning.pruners import WandaPruner


@pytest.fixture(scope="module")
def model():
    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def batch(cfg, n=4, src=6, tgt=5, seed=0):
    rng = np.random.default_rng(seed)
    img = cfg.vit.img_size
    labels = rng.integers(2, cfg.t5.vocab_size, size=(n, tgt))
    labels[:, -1] = -100
    return {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_input_ids": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, src)), jnp.int32),
        "text_input_mask": jnp.ones((n, src), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }


def test_encode_image_shape(model):
    cfg, params = model
    b = batch(cfg)
    q = blip2.encode_image(cfg, params, b["image"])
    assert q.shape == (4, cfg.num_query_tokens, cfg.t5.d_model)


def test_loss_finite(model):
    cfg, params = model
    losses = blip2.per_sample_loss(cfg, params, batch(cfg))
    assert losses.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_generate_shapes(model):
    cfg, params = model
    b = batch(cfg)
    gen = GenerateConfig(max_new_tokens=5, num_beams=2)
    out = blip2.generate(cfg, params, b["image"], b["text_input_ids"],
                         b["text_input_mask"], gen)
    assert out.shape == (4, 5)
    assert out.dtype == jnp.int32


def test_ecoflap_zeroth_prune(model):
    """The north-star path: MeZO coarse stage over ViT+T5 union, Wanda fine
    stage per stack (scripts/blip2/ecoflap_zeroth.py flags)."""
    cfg, params = model
    adapter = blip2.make_adapter(cfg, params)
    b = batch(cfg, n=8)
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        stack_specs={
            "visual_encoder.blocks": f"{cfg.vit.depth}-0.5-1.0-1.0",
            "t5_model.encoder.block": f"{cfg.t5.num_layers}-0.5-1.0-1.0",
            "t5_model.decoder.block": f"{cfg.t5.num_decoder_layers}-0.5-1.0-1.0",
        },
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=0.6,
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert "visual_encoder.blocks.0.attn.qkv.weight" in sd
    assert "t5_model.encoder.block.0.layer.0.SelfAttention.q.weight" in sd
    assert "t5_model.decoder.block.1.layer.2.DenseReluDense.wo.weight" in sd
    assert max(sd.values()) <= 0.6 + 1e-6
    s = pruner.check_sparsity()
    assert 0.35 <= s <= 0.65
    # pruned model still runs
    losses = blip2.per_sample_loss(cfg, adapter.params, b)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_prune_per_model_budget_split(model):
    cfg, params = model
    adapter = blip2.make_adapter(cfg, params)
    b = batch(cfg, n=8)
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        prune_spec="0-0.5-1.0-1.0",
        sparsity_ratio_granularity="model",
        max_sparsity_per_layer=0.8,
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=4,
        prune_per_model=True,
        verbose=False,
    )
    _, sd = pruner.prune()
    # per-model split: every vit layer shares one ratio, every t5 another
    vit_ratios = {v for k, v in sd.items() if k.startswith("visual_encoder")}
    t5_ratios = {v for k, v in sd.items() if k.startswith("t5_model")}
    assert len(vit_ratios) == 1 and len(t5_ratios) == 1
    # with per-model budget both ratios equal the target
    assert abs(next(iter(vit_ratios)) - 0.5) < 0.05
    assert abs(next(iter(t5_ratios)) - 0.5) < 0.05
