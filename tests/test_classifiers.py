"""Image classifiers: ViT/DeiT head path + ConvNeXt forward & pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import classifiers, eva_vit
from ecoflap_tpu.pruning.pruners import WandaPruner


def test_vit_classifier_adapter():
    cfg = eva_vit.tiny_config(final_norm=True, head_dim=10,
                              qkv_bias_mode="full")
    params = eva_vit.init_params(cfg, jax.random.PRNGKey(0))
    adapter = classifiers.make_vit_classifier_adapter(cfg, params)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 10, size=(8,)), jnp.int32),
    }
    losses = adapter.loss_fn(params, batch)
    assert losses.shape == (8,)
    pruner = WandaPruner(adapter, batch, num_microbatches=2,
                         prune_spec=f"{cfg.depth}-0.5-1.0-1.0", verbose=False)
    pruner.prune()
    assert 0.4 <= pruner.check_sparsity() <= 0.6


@pytest.fixture(scope="module")
def convnext():
    cfg = classifiers.tiny_config()
    params = classifiers.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def cbatch(cfg, n=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(
            rng.normal(size=(n, cfg.img_size, cfg.img_size, 3)), jnp.float32),
        "label": jnp.asarray(
            rng.integers(0, cfg.num_classes, size=(n,)), jnp.int32),
    }


def test_convnext_forward(convnext):
    cfg, params = convnext
    logits = classifiers.forward(cfg, params, cbatch(cfg)["image"])
    assert logits.shape == (8, cfg.num_classes)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_convnext_prune(convnext):
    cfg, params = convnext
    adapter = classifiers.make_convnext_adapter(cfg, params)
    b = cbatch(cfg)
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        prune_spec="0-0.5-1.0-1.0",
        sparsity_ratio_granularity="layer",
        max_sparsity_per_layer=0.8,
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert "stages.0.blocks.0.pwconv1.weight" in sd
    assert "stages.1.blocks.1.pwconv2.weight" in sd
    assert 0.35 <= pruner.check_sparsity() <= 0.65
    # pruned model still runs
    logits = classifiers.forward(cfg, adapter.params, b["image"])
    assert bool(jnp.all(jnp.isfinite(logits)))
