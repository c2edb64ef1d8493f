"""EVA-ViT tower: shapes, scan/loop equivalence, end-to-end pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import eva_vit
from ecoflap_tpu.pruning.adapter import ModelAdapter
from ecoflap_tpu.pruning.pruners import WandaPruner


@pytest.fixture(scope="module")
def tiny():
    cfg = eva_vit.tiny_config()
    params = eva_vit.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def images(n=4, size=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, size, size, 3)), jnp.float32)


def test_forward_shapes(tiny):
    cfg, params = tiny
    out = eva_vit.forward(cfg, params, images())
    assert out.shape == (4, cfg.seq_len, cfg.embed_dim)


def test_clip_head_shapes():
    cfg = eva_vit.tiny_config(final_norm=True, head_dim=8)
    params = eva_vit.init_params(cfg, jax.random.PRNGKey(1))
    out = eva_vit.forward(cfg, params, images())
    assert out.shape == (4, 8)


def test_scan_matches_blockwise_loop(tiny):
    """The scanned tower must equal stepping blocks through the StackSpec."""
    cfg, params = tiny
    x_scan = eva_vit.forward_features(cfg, params, images())

    stack = eva_vit.make_stack(cfg)
    x, cache = stack.prepare_inputs(params, {"image": images()})
    for i in range(stack.num_blocks):
        bp = stack.get_block(params, i)
        x, _ = stack.block_forward(bp, x, cache)
    np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x), rtol=2e-5, atol=2e-5)


def test_stats_keys(tiny):
    cfg, params = tiny
    stack = eva_vit.make_stack(cfg)
    x, cache = stack.prepare_inputs(params, {"image": images()})
    bp = stack.get_block(params, 0)
    _, stats = stack.block_forward(bp, x, cache, collect="wanda")
    assert set(stats) == set(eva_vit.LINEAR_NAMES)
    d = cfg.embed_dim
    assert stats["attn.qkv"].shape == (d,)
    assert stats["mlp.fc2"].shape == (cfg.mlp_hidden,)


def test_block_roundtrip(tiny):
    cfg, params = tiny
    stack = eva_vit.make_stack(cfg)
    bp = stack.get_block(params, 1)
    w = stack.weight_get(bp, "mlp.fc1")
    assert w.shape == (cfg.mlp_hidden, cfg.embed_dim)  # torch layout
    bp2 = stack.weight_set(bp, "mlp.fc1", w * 0)
    p2 = stack.set_block(params, 1, bp2)
    assert float(jnp.sum(jnp.abs(p2["blocks"]["mlp"]["fc1"]["kernel"][1]))) == 0.0
    # untouched blocks unchanged
    np.testing.assert_array_equal(
        np.asarray(p2["blocks"]["mlp"]["fc1"]["kernel"][0]),
        np.asarray(params["blocks"]["mlp"]["fc1"]["kernel"][0]),
    )


def test_wanda_prune_end_to_end(tiny):
    """Uniform Wanda @0.5 through the TwoStagePruner — per-tensor masking."""
    cfg, params = tiny
    stack = eva_vit.make_stack(cfg)

    def loss_fn(p, batch):
        out = eva_vit.forward_features(cfg, p, batch["image"])
        return jnp.mean(out**2, axis=(1, 2))

    adapter = ModelAdapter(
        name="eva_vit", params=params, loss_fn=loss_fn, stacks=[stack],
        model_prefixes={"visual_encoder.blocks": "visual_encoder"},
    )
    batch = {"image": images(8)}
    pruner = WandaPruner(
        adapter, batch, num_microbatches=2,
        prune_spec=f"{cfg.depth}-0.5-1.0-1.0", verbose=False,
    )
    pruned, sd = pruner.prune()
    assert sd is None  # uniform path
    sparsity = pruner.check_sparsity()
    assert 0.45 <= sparsity <= 0.55


def test_zeroth_order_coarse_stage(tiny):
    """ECoFLaP zeroth-order with block granularity produces a sparsity dict
    keyed like the reference and a budget-respecting prune."""
    cfg, params = tiny
    stack = eva_vit.make_stack(cfg)

    def loss_fn(p, batch):
        out = eva_vit.forward_features(cfg, p, batch["image"])
        return jnp.mean(out**2, axis=(1, 2))

    adapter = ModelAdapter(
        name="eva_vit", params=params, loss_fn=loss_fn, stacks=[stack],
        model_prefixes={"visual_encoder.blocks": "visual_encoder"},
    )
    batch = {"image": images(8)}
    pruner = WandaPruner(
        adapter, batch, num_microbatches=2,
        prune_spec=f"{cfg.depth}-0.5-1.0-1.0",
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=0.8,
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert "visual_encoder.blocks.0.attn.qkv.weight" in sd
    s = pruner.check_sparsity()
    assert 0.4 <= s <= 0.6
