"""BLIP-1 (UPop family): BERT tower, captioner loss, joint prune, masked FT."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ecoflap_tpu.models import bert as bert_mod
from ecoflap_tpu.models import blip1
from ecoflap_tpu.pruning.pruners import WandaPruner
from ecoflap_tpu.runners.finetune import finetune


@pytest.fixture(scope="module")
def model():
    cfg = blip1.tiny_config()
    params = blip1.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def batch(cfg, n=4, s=8, seed=0):
    rng = np.random.default_rng(seed)
    img = cfg.vit.img_size
    mask = np.ones((n, s), np.int32)
    mask[:, -2:] = 0
    return {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "caption_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, s)), jnp.int32),
        "caption_mask": jnp.asarray(mask),
    }


def test_bert_causal_mask():
    cfg = bert_mod.tiny_config(causal=True)
    params = bert_mod.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(2, 8)), jnp.int32)
    h1 = bert_mod.forward(cfg, params, ids)
    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % cfg.vocab_size)
    h2 = bert_mod.forward(cfg, params, ids2)
    np.testing.assert_allclose(
        np.asarray(h1[:, :-1]), np.asarray(h2[:, :-1]), rtol=1e-4, atol=1e-4
    )


def test_loss_and_generate_shapes(model):
    cfg, params = model
    losses = blip1.per_sample_loss(cfg, params, batch(cfg))
    assert losses.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_itc_features(model):
    cfg, params = model
    b = batch(cfg)
    iv, tv = blip1.itc_features(cfg, params, b["image"], b["caption_ids"],
                                b["caption_mask"])
    assert iv.shape == (4, cfg.embed_dim)
    assert tv.shape == (4, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(iv), axis=-1), 1.0,
                               rtol=1e-5)


def test_upop_style_prune(model):
    """UPop ECoFLaP flags: MEZO-GradOnly_sum, joint ViT+BERT coarse stage."""
    cfg, params = model
    adapter = blip1.make_adapter(cfg, params)
    b = batch(cfg, n=8)
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        stack_specs={
            "visual_encoder.blocks": f"{cfg.vit.depth}-0.5-1.0-1.0",
            "text_decoder.bert.encoder.layer": f"{cfg.text.num_layers}-0.5-1.0-1.0",
        },
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=0.6,
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert "visual_encoder.blocks.0.attn.qkv.weight" in sd
    assert ("text_decoder.bert.encoder.layer.0.attention.self.query.weight"
            in sd)
    assert ("text_decoder.bert.encoder.layer.1.crossattention.self.key.weight"
            in sd)
    assert 0.35 <= pruner.check_sparsity() <= 0.65

    # masked fine-tuning (the "+FT" rows) keeps zeros and reduces loss
    tuned, losses = finetune(
        adapter.loss_fn, adapter.params, [b] * 5,
        optimizer=optax.adam(1e-3),
    )
    assert losses[-1] < losses[0]
    adapter.params = tuned
    assert 0.35 <= pruner.check_sparsity() <= 0.65


def test_nlvr_forward_and_prune():
    cfg = blip1.tiny_config()
    params = blip1.init_nlvr_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n, s, img = 8, 8, cfg.vit.img_size
    b = {
        "image0": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "image1": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, s)), jnp.int32),
        "text_mask": jnp.ones((n, s), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 2, size=(n,)), jnp.int32),
    }
    logits = blip1.nlvr_forward(cfg, params, b)
    assert logits.shape == (n, 2)
    adapter = blip1.make_nlvr_adapter(cfg, params)
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        stack_specs={
            "visual_encoder.blocks": f"{cfg.vit.depth}-0.5-1.0-1.0",
            "text_encoder.encoder.layer":
                f"{cfg.text.num_layers}-0.5-1.0-1.0",
        },
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=0.6,
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert ("text_encoder.encoder.layer.0.crossattention.output.merge_layer"
            ".weight" in sd)
    assert "text_encoder.encoder.layer.1.crossattention.self1.query.weight" in sd
    assert 0.35 <= pruner.check_sparsity() <= 0.65
    out = blip1.nlvr_forward(cfg, adapter.params, b)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vqa_variant():
    cfg = blip1.tiny_config()
    params = blip1.init_vqa_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n, img = 8, cfg.vit.img_size
    b = {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "question_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, 6)), jnp.int32),
        "question_mask": jnp.ones((n, 6), jnp.int32),
        "answer_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, 4)), jnp.int32),
        "answer_mask": jnp.ones((n, 4), jnp.int32),
    }
    losses = blip1.vqa_loss(cfg, params, b)
    assert losses.shape == (n,)
    adapter = blip1.make_vqa_adapter(cfg, params)
    assert len(adapter.stacks) == 3
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        stack_specs={s.name: f"{s.num_blocks}-0.5-1.0-1.0"
                     for s in adapter.stacks},
        verbose=False,
    )
    pruner.prune()
    assert 0.4 <= pruner.check_sparsity() <= 0.6


def test_retrieval_itm():
    cfg = blip1.tiny_config()
    params = blip1.init_retrieval_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n, img, s = 4, cfg.vit.img_size, 8
    images = jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(2, cfg.text.vocab_size, size=(n, s)), jnp.int32)
    mask = jnp.ones((n, s), jnp.int32)
    sim = blip1.retrieval_sim_matrix(cfg, params, images, ids, mask)
    assert sim.shape == (n, n)
    lg = blip1.itm_logits(cfg, params, images, ids, mask)
    assert lg.shape == (n, 2)
    from ecoflap_tpu.tasks.retrieval import score_retrieval
    scores = score_retrieval(np.asarray(sim))
    assert "txt_r1" in scores and "agg_metrics" in scores
