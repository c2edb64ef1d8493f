"""CLIP / EVA-CLIP: towers, losses, zero-shot classifier, pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import clip
from ecoflap_tpu.pruning.pruners import WandaPruner


@pytest.fixture(scope="module", params=["openai", "eva"])
def model(request):
    cfg = clip.tiny_config(eva=request.param == "eva")
    params = clip.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def batch(n=4, img=16, ctx=12, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, size=(n, ctx))
    # make the argmax (EOT) land at a fixed position like CLIP's real EOT
    ids[:, -1] = vocab - 1
    return {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_ids": jnp.asarray(ids, jnp.int32),
        "label": jnp.asarray(rng.integers(0, 3, size=(n,)), jnp.int32),
    }


def test_encode_shapes(model):
    cfg, params = model
    b = batch()
    img = clip.encode_image(cfg, params, b["image"])
    txt = clip.encode_text(cfg, params, b["text_ids"])
    assert img.shape == (4, cfg.embed_dim)
    assert txt.shape == (4, cfg.embed_dim)


def test_contrastive_loss_finite(model):
    cfg, params = model
    losses = clip.contrastive_loss(cfg, params, batch())
    assert losses.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_causal_mask_blocks_future(model):
    """Changing a future token must not change earlier positions' features.
    EOT pooling reads position argmax(ids); keep that fixed while varying a
    later... here: vary a token AFTER the pooled position has no effect only
    if pooled position < changed one — instead check full hidden states."""
    cfg, params = model
    tcfg, tp = cfg.text, params["text"]
    ids = batch()["text_ids"]
    x = clip.text_embed(tcfg, tp, ids)
    bias = clip.causal_bias(x.shape[1])
    h1 = clip.run_resblocks(tcfg, tp["blocks"], x, bias)

    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % tcfg.vocab_size)
    x2 = clip.text_embed(tcfg, tp, ids2)
    h2 = clip.run_resblocks(tcfg, tp["blocks"], x2, bias)
    np.testing.assert_allclose(
        np.asarray(h1[:, :-1]), np.asarray(h2[:, :-1]), rtol=1e-5, atol=1e-5
    )


def test_zero_shot_classifier(model):
    cfg, params = model
    num_classes, templates, ctx = 3, 2, 12
    rng = np.random.default_rng(1)
    prompts = jnp.asarray(
        rng.integers(1, cfg.text.vocab_size, size=(num_classes * templates, ctx)),
        jnp.int32,
    )
    w = clip.zero_shot_classifier(cfg, params, prompts, num_classes)
    assert w.shape == (cfg.embed_dim, num_classes)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(w), axis=0), np.ones(num_classes), rtol=1e-5
    )
    lg = clip.predict(cfg, params, batch()["image"], w)
    assert lg.shape == (4, num_classes)


def test_prune_contrastive(model):
    """CoOp-style joint visual+text Wanda prune @0.5 with MeZO coarse stage."""
    cfg, params = model
    adapter = clip.make_adapter(cfg, params)
    b = batch(8)
    nblocks = adapter.stacks[0].num_blocks
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        prune_spec=f"{nblocks}-0.5-1.0-1.0",
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=0.8,
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    s = pruner.check_sparsity()
    assert 0.35 <= s <= 0.65
    if cfg.eva_visual is not None:
        assert any(k.startswith("visual.blocks.") for k in sd)
    else:
        assert any(k.startswith("visual.transformer.resblocks.") for k in sd)
        assert any(k.startswith("transformer.resblocks.") for k in sd)


def test_prune_zero_shot_visual_only():
    """LAVIS eva_clip path: visual-only prune, zero-shot CE loss."""
    cfg = clip.tiny_config(eva=True)
    params = clip.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    classifier = jnp.asarray(rng.normal(size=(cfg.embed_dim, 3)), jnp.float32)
    classifier = classifier / np.linalg.norm(classifier, axis=0)
    adapter = clip.make_adapter(cfg, params, classifier=classifier)
    assert len(adapter.stacks) == 1
    pruner = WandaPruner(
        adapter, batch(8), num_microbatches=2,
        prune_spec=f"{cfg.eva_visual.depth}-0.5-1.0-1.0", verbose=False,
    )
    pruner.prune()
    assert 0.4 <= pruner.check_sparsity() <= 0.6
