"""OPT decoder: HF logit parity, causality, pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import opt
from ecoflap_tpu.pruning.pruners import WandaPruner

torch = pytest.importorskip("torch")


def test_opt_logits_match_hf():
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM

    hf_cfg = HFOPTConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=48, max_position_embeddings=64,
        do_layer_norm_before=True, dropout=0.0, activation_function="relu",
        word_embed_proj_dim=32, pad_token_id=1,
    )
    torch.manual_seed(0)
    hf = OPTForCausalLM(hf_cfg).eval()

    cfg = opt.tiny_config(d_ff=48)
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    from ecoflap_tpu.utils.checkpoint import convert_opt

    params = convert_opt(state, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 64, size=(2, 9))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(opt.forward(cfg, params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_opt_prune():
    cfg = opt.tiny_config()
    params = opt.init_params(cfg, jax.random.PRNGKey(0))
    adapter = opt.make_adapter(cfg, params)
    rng = np.random.default_rng(0)
    b = {"input_ids": jnp.asarray(rng.integers(3, cfg.vocab_size, size=(8, 10)),
                                  jnp.int32)}
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        prune_spec=f"{cfg.num_layers}-0.5-1.0-1.0",
        sparsity_ratio_granularity="block", max_sparsity_per_layer=0.7,
        score_method="MEZO-GradOnly_sum", num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert "model.decoder.layers.0.self_attn.q_proj.weight" in sd
    assert 0.35 <= pruner.check_sparsity() <= 0.65


def test_blip2_opt_loss_and_prune():
    from ecoflap_tpu.models import blip2_opt

    cfg = blip2_opt.tiny_config()
    params = blip2_opt.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n, s, img = 8, 8, cfg.vit.img_size
    mask = np.ones((n, s), np.int32)
    mask[:, -2:] = 0
    b = {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_ids": jnp.asarray(
            rng.integers(3, cfg.opt.vocab_size, size=(n, s)), jnp.int32),
        "text_mask": jnp.asarray(mask),
    }
    losses = blip2_opt.per_sample_loss(cfg, params, b)
    assert losses.shape == (n,)
    assert bool(jnp.all(jnp.isfinite(losses)))

    adapter = blip2_opt.make_adapter(cfg, params)
    # plan loss equals full loss
    plan = adapter.build_mezo_plans(params, b)[0]
    np.testing.assert_allclose(
        np.asarray(plan.loss_fn(params, plan.data)), np.asarray(losses),
        rtol=1e-5, atol=1e-5)

    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        stack_specs={
            "visual_encoder.blocks": f"{cfg.vit.depth}-0.5-1.0-1.0",
            "opt_model.model.decoder.layers": f"{cfg.opt.num_layers}-0.5-1.0-1.0",
        },
        sparsity_ratio_granularity="block", max_sparsity_per_layer=0.7,
        score_method="MEZO-GradOnly_sum", num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert "opt_model.model.decoder.layers.1.fc1.weight" in sd
    assert 0.35 <= pruner.check_sparsity() <= 0.65
