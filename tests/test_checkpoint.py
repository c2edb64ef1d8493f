"""Checkpoint conversion + numerical parity vs torch/HF implementations.

These are the tests the reference never had (SURVEY.md §4): convert a
randomly-initialized HF torch model's state_dict into our pytree and require
logit-level agreement. Catches layout, transpose, bucketing, activation and
norm mismatches all at once.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ecoflap_tpu.models import clip as clip_mod
from ecoflap_tpu.models import eva_vit, llama
from ecoflap_tpu.models import t5 as t5_mod
from ecoflap_tpu.utils import checkpoint as ckpt


def test_t5_logits_match_hf():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        is_gated_act=True, dense_act_fn="gelu", feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()

    cfg = t5_mod.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_decoder_layers=2, num_heads=4, rel_buckets=8, rel_max_distance=16,
    )
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = ckpt.convert_t5(state, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 64, size=(3, 9))
    mask = np.ones((3, 9), np.int64)
    mask[:, -2:] = 0
    labels = rng.integers(2, 64, size=(3, 5))

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            labels=torch.tensor(labels),
        )
    enc = t5_mod.encode(cfg, params, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask, jnp.int32))
    dec_in = t5_mod.shift_right(cfg, jnp.asarray(labels, jnp.int32))
    ours = t5_mod.decode(cfg, params, enc, jnp.asarray(mask, jnp.int32), dec_in)
    np.testing.assert_allclose(
        np.asarray(ours), hf_out.logits.numpy(), rtol=2e-4, atol=2e-4
    )
    # loss parity (fixed-length labels -> per-sample mean == token mean)
    our_loss = float(jnp.mean(t5_mod.per_sample_loss(
        cfg, params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(labels, jnp.int32))))
    assert abs(our_loss - float(hf_out.loss)) < 2e-4


def test_llama_logits_match_hf():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, rms_norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = llama.LlamaConfig(
        vocab_size=64, d_model=32, d_ff=48, num_layers=2, num_heads=4,
        num_kv_heads=2, max_seq_len=32,
    )
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = ckpt.convert_llama(state, cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(2, 64, size=(2, 11))
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(llama.forward(cfg, params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(ours, hf_logits, rtol=3e-4, atol=3e-4)


def test_patch_embed_matches_conv2d():
    """extract_patches + matmul == strided Conv2d."""
    rng = np.random.default_rng(0)
    d, c, p = 16, 3, 4
    conv_w = rng.normal(size=(d, c, p, p)).astype(np.float32)
    conv_b = rng.normal(size=(d,)).astype(np.float32)
    img = rng.normal(size=(2, 12, 12, c)).astype(np.float32)

    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(conv_w),
            torch.tensor(conv_b), stride=p,
        )
        ref = ref.flatten(2).transpose(1, 2).numpy()  # (B, N, D)

    from ecoflap_tpu.models.layers import extract_patches
    kernel = jnp.asarray(conv_w.reshape(d, -1).T)
    patches = extract_patches(jnp.asarray(img), p)
    ours = np.asarray(patches @ kernel + conv_b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_clip_resblock_matches_torch_mha():
    """Our fused in_proj attention == nn.MultiheadAttention — the equivalence
    the reference asserts by hand for hacky_attn
    (CoOp/trainers/pruners/wanda_pruner.py:311-319)."""
    d, h, s, b = 32, 4, 6, 2
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True).eval()
    x = torch.randn(b, s, d)
    with torch.no_grad():
        ref, _ = mha(x, x, x, need_weights=False)

    from ecoflap_tpu.models.layers import attention
    in_w = mha.in_proj_weight.detach().numpy()  # (3d, d)
    in_b = mha.in_proj_bias.detach().numpy()
    out_w = mha.out_proj.weight.detach().numpy()
    out_b = mha.out_proj.bias.detach().numpy()

    xj = jnp.asarray(x.numpy())
    qkv = xj @ jnp.asarray(in_w.T) + in_b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = attention(q, k, v, h)
    ours = np.asarray(o @ jnp.asarray(out_w.T) + out_b)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-4)


def test_eva_vit_roundtrip():
    cfg = eva_vit.tiny_config(final_norm=True, head_dim=8)
    params = eva_vit.init_params(cfg, jax.random.PRNGKey(0))
    state = ckpt.export_eva_vit(params, cfg, prefix="visual_encoder.")
    back = ckpt.convert_eva_vit(state, cfg, prefix="visual_encoder.")
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(ka))


def test_t5_roundtrip():
    cfg = t5_mod.tiny_config()
    params = t5_mod.init_params(cfg, jax.random.PRNGKey(0))
    state = ckpt.export_t5(params, cfg)
    back = ckpt.convert_t5(state, cfg)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_llama_roundtrip():
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    back = ckpt.convert_llama(ckpt.export_llama(params, cfg), cfg)
    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_bert_stack_converter_roundtrip_via_hf():
    """Convert a HF BertModel tower and check hidden-state parity on the
    no-cross path (the med.py text tower without cross-attention)."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_cfg = HFBertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()

    from ecoflap_tpu.models import bert as bert_mod
    from ecoflap_tpu.utils.checkpoint import convert_bert_stack

    cfg = bert_mod.BertConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=48, max_position=32,
    )
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_bert_stack(state, cfg, prefix="")

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 64, size=(2, 7))
    with torch.no_grad():
        # HF adds token_type embeddings; emulate type-0 by folding into word
        tt = hf.embeddings.token_type_embeddings.weight[0].numpy()
    params["embeddings"]["word"] = params["embeddings"]["word"] + tt

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    ours = np.asarray(
        bert_mod.forward(cfg, params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_blip2_roundtrip_and_reference_keys():
    """Full BLIP-2 export -> .pth naming -> re-import is exact, and the state
    dict uses the reference's exact key strings (evaluate_blip.py:345-390
    load path: visual_encoder.*, Qformer.bert.*, query_tokens, t5_proj.*,
    t5_model.*, ln_vision.*; fused qkv w/ separate q/v bias eva_vit.py:79-85;
    block-0 rel-bias hoist)."""
    from ecoflap_tpu.models import blip2

    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    state = ckpt.export_blip2(params, cfg)

    for key in [
        "visual_encoder.blocks.0.attn.qkv.weight",
        "visual_encoder.blocks.0.attn.q_bias",
        "visual_encoder.blocks.0.attn.v_bias",
        "visual_encoder.cls_token",
        "ln_vision.weight",
        "query_tokens",
        "Qformer.bert.encoder.layer.0.attention.self.query.weight",
        "Qformer.bert.encoder.layer.0.crossattention.self.key.weight",
        "t5_proj.weight",
        "t5_model.shared.weight",
        "t5_model.encoder.block.0.layer.0.SelfAttention.q.weight",
        "t5_model.encoder.block.0.layer.0.SelfAttention."
        "relative_attention_bias.weight",
        "t5_model.decoder.block.0.layer.1.EncDecAttention.o.weight",
        "t5_model.lm_head.weight",
    ]:
        assert key in state, key
    # no k_bias (EVA fused qkv has zero k bias, not stored), no rel bias
    # beyond block 0 (shared, hoisted)
    assert "visual_encoder.blocks.0.attn.k_bias" not in state
    assert ("t5_model.encoder.block.1.layer.0.SelfAttention."
            "relative_attention_bias.weight") not in state

    back = ckpt.convert_blip2(state, cfg)
    from ecoflap_tpu.core.pytree import flatten_named

    fa, fb = flatten_named(params), flatten_named(back)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=1e-6, err_msg=k)


def test_convert_clip_openai_naming_roundtrip():
    """convert_clip: OpenAI CLIP state_dict naming (vendored CoOp/clip
    model.py — visual.transformer.resblocks / transformer.resblocks,
    in_proj_weight fused qkv) -> our pytree, leaf-exact. The state dict is
    built by inverting the mapping from a random init, so every key the
    converter reads is exercised."""
    import numpy as np

    from ecoflap_tpu.models import clip as cm
    from ecoflap_tpu.utils import checkpoint as ck

    cfg = cm.tiny_config(eva=False)
    params = cm.init_params(cfg, jax.random.PRNGKey(3))

    def t(x):  # torch layout: (out, in)
        return np.asarray(x).T

    state = {
        "token_embedding.weight": np.asarray(params["text"]["token_embedding"]),
        "positional_embedding": np.asarray(params["text"]["positional_embedding"]),
        "ln_final.weight": np.asarray(params["text"]["ln_final"]["scale"]),
        "ln_final.bias": np.asarray(params["text"]["ln_final"]["bias"]),
        "text_projection": np.asarray(params["text"]["text_projection"]),
        "logit_scale": np.asarray(params["logit_scale"]),
        "visual.class_embedding": np.asarray(params["visual"]["class_embedding"]),
        "visual.positional_embedding": np.asarray(
            params["visual"]["positional_embedding"]),
        "visual.ln_pre.weight": np.asarray(params["visual"]["ln_pre"]["scale"]),
        "visual.ln_pre.bias": np.asarray(params["visual"]["ln_pre"]["bias"]),
        "visual.ln_post.weight": np.asarray(params["visual"]["ln_post"]["scale"]),
        "visual.ln_post.bias": np.asarray(params["visual"]["ln_post"]["bias"]),
        "visual.proj": np.asarray(params["visual"]["proj"]),
    }
    # conv1: the converter does conv.reshape(d, -1).T — invert exactly that
    d = cfg.visual.width
    state["visual.conv1.weight"] = np.asarray(
        params["visual"]["conv1"]["kernel"]).T.reshape(d, -1)

    for tower, prefix in (("text", "transformer"),
                          ("visual", "visual.transformer")):
        blocks = params[tower]["blocks"]
        L = blocks["ln_1"]["scale"].shape[0]
        for i in range(L):
            p = f"{prefix}.resblocks.{i}."
            state[p + "ln_1.weight"] = np.asarray(blocks["ln_1"]["scale"][i])
            state[p + "ln_1.bias"] = np.asarray(blocks["ln_1"]["bias"][i])
            state[p + "ln_2.weight"] = np.asarray(blocks["ln_2"]["scale"][i])
            state[p + "ln_2.bias"] = np.asarray(blocks["ln_2"]["bias"][i])
            state[p + "attn.in_proj_weight"] = t(
                blocks["attn"]["in_proj"]["kernel"][i])
            state[p + "attn.in_proj_bias"] = np.asarray(
                blocks["attn"]["in_proj"]["bias"][i])
            state[p + "attn.out_proj.weight"] = t(
                blocks["attn"]["out_proj"]["kernel"][i])
            state[p + "attn.out_proj.bias"] = np.asarray(
                blocks["attn"]["out_proj"]["bias"][i])
            state[p + "mlp.c_fc.weight"] = t(blocks["mlp"]["c_fc"]["kernel"][i])
            state[p + "mlp.c_fc.bias"] = np.asarray(
                blocks["mlp"]["c_fc"]["bias"][i])
            state[p + "mlp.c_proj.weight"] = t(
                blocks["mlp"]["c_proj"]["kernel"][i])
            state[p + "mlp.c_proj.bias"] = np.asarray(
                blocks["mlp"]["c_proj"]["bias"][i])

    back = ck.convert_clip(state, cfg)
    from ecoflap_tpu.core.pytree import flatten_named

    fa, fb = flatten_named(params), flatten_named(back)
    assert fa.keys() == fb.keys(), sorted(set(fa) ^ set(fb))[:8]
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=k)


def test_eva_vit_full_bias_roundtrip():
    """timm DeiT/ViT classifier layout (fused qkv.bias, no separate
    q_bias/v_bias): export -> convert must be leaf-exact in full-bias mode
    (image_classifiers checkpoints)."""
    import numpy as np

    from ecoflap_tpu.core.pytree import flatten_named
    from ecoflap_tpu.models import eva_vit
    from ecoflap_tpu.utils import checkpoint as ck

    cfg = eva_vit.tiny_config(final_norm=True, head_dim=10,
                              qkv_bias_mode="full")
    params = eva_vit.init_params(cfg, jax.random.PRNGKey(5))
    state = ck.export_eva_vit(params, cfg)
    assert "blocks.0.attn.qkv.bias" in state
    assert "blocks.0.attn.q_bias" not in state
    back = ck.convert_eva_vit(state, cfg)
    fa, fb = flatten_named(params), flatten_named(back)
    assert fa.keys() == fb.keys(), sorted(set(fa) ^ set(fb))[:8]
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=k)
