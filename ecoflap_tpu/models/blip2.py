"""BLIP-2 FlanT5 — frozen EVA-ViT ∘ Q-Former ∘ t5_proj ∘ frozen FlanT5.

Functional rebuild of ``Blip2T5``
(LAVIS/lavis/models/blip2_models/blip2_t5.py:41-172):

  image -> visual_encoder -> ln_vision -> Qformer(query_tokens, cross-attn)
        -> t5_proj -> [query embeds ; text embeds] -> t5 encoder -> t5 decoder
        -> LM loss / generate.

Tokenization lives in the data pipeline (outside jit); the model consumes
fixed-shape token arrays. The reference's autocast dance (ViT fp16, T5 bf16,
blip2_t5.py:118,135) maps to storing those towers' params in bfloat16 — TPU's
native half type.

Pruned stacks (BLIPT5LayerWandaPruner, wanda_pruner.py:660-876): the ViT
blocks (``visual_encoder.blocks``, per-tensor masks) and the T5
encoder+decoder blocks (``t5_model.{encoder,decoder}.block``, per-row masks).
The Q-Former/t5_proj stay dense, as in the reference.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models import eva_vit, qformer
from ecoflap_tpu.models import t5 as t5_mod
from ecoflap_tpu.models.generation import GenerateConfig, t5_generate
from ecoflap_tpu.models.layers import layer_norm
from ecoflap_tpu.pruning.adapter import ModelAdapter

PyTree = Any


@dataclass(frozen=True)
class Blip2Config:
    vit: eva_vit.EvaViTConfig
    t5: t5_mod.T5Config
    qformer: qformer.QFormerConfig

    @property
    def num_query_tokens(self) -> int:
        return self.qformer.num_query_tokens


def blip2_flant5xl(img_size: int = 224) -> Blip2Config:
    """pretrain_flant5xl (blip2_pretrain_flant5xl.yaml)."""
    vit = eva_vit.eva_vit_g(img_size)
    return Blip2Config(
        vit=vit,
        t5=t5_mod.flan_t5_xl(),
        qformer=qformer.QFormerConfig(encoder_width=vit.embed_dim),
    )


def blip2_small(img_size: int = 224) -> Blip2Config:
    """Mid-scale BLIP-2 ('--model_scale small'): ViT-B/16 vision tower +
    flan-t5-base LM around the standard 12-layer Q-Former. No reference
    analogue (LAVIS ships only flant5xl/xxl); exists so the full pipeline
    can be exercised at ~0.5 GB instead of ~8 GB."""
    vit = eva_vit.vit_base_config(img_size)
    return Blip2Config(
        vit=vit,
        t5=t5_mod.flan_t5_base(),
        qformer=qformer.QFormerConfig(encoder_width=vit.embed_dim),
    )


def tiny_config(vocab_size: int = None) -> Blip2Config:
    vit = eva_vit.tiny_config()
    t5_kw = {} if vocab_size is None else {"vocab_size": vocab_size}
    return Blip2Config(
        vit=vit,
        t5=t5_mod.tiny_config(**t5_kw),
        qformer=qformer.tiny_config(encoder_width=vit.embed_dim),
    )


def init_params(cfg: Blip2Config, key: jax.Array, dtype=jnp.float32,
                vit_dtype=None, t5_dtype=None) -> PyTree:
    """``vit_dtype``/``t5_dtype`` default to ``dtype``; pass bfloat16 for the
    frozen towers to mirror the reference's fp16/bf16 split on TPU."""
    kv, kq, kt, kp = jax.random.split(key, 4)
    qf = qformer.init_params(cfg.qformer, kq, dtype)
    query_tokens = qf.pop("query_tokens")
    d_q, d_t5 = cfg.qformer.hidden_size, cfg.t5.d_model
    return {
        "visual_encoder": eva_vit.init_params(cfg.vit, kv, vit_dtype or dtype),
        "ln_vision": {
            "scale": jnp.ones((cfg.vit.embed_dim,), dtype),
            "bias": jnp.zeros((cfg.vit.embed_dim,), dtype),
        },
        "query_tokens": query_tokens,
        "qformer": qf,
        "t5_proj": {
            "kernel": (jax.random.normal(kp, (d_q, d_t5), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((d_t5,), dtype),
        },
        "t5_model": t5_mod.init_params(cfg.t5, kt, t5_dtype or dtype),
    }


def project_features(cfg: Blip2Config, params: PyTree, feats: jax.Array) -> jax.Array:
    """ViT token features -> (B, num_query_tokens, d_t5) projected query
    embeddings (ln_vision -> Q-Former -> t5_proj, blip2_t5.py:118-134)."""
    feats = layer_norm(params["ln_vision"], feats, 1e-5)
    q = qformer.forward(
        cfg.qformer, {**params["qformer"], "query_tokens": params["query_tokens"]},
        feats,
    )
    return (
        jnp.dot(q, params["t5_proj"]["kernel"], preferred_element_type=jnp.float32)
        + params["t5_proj"]["bias"]
    ).astype(q.dtype)


def encode_image(cfg: Blip2Config, params: PyTree, images: jax.Array) -> jax.Array:
    """image -> (B, num_query_tokens, d_t5) projected query embeddings
    (blip2_t5.py:118-134)."""
    feats = eva_vit.forward_features(cfg.vit, params["visual_encoder"], images)
    return project_features(cfg, params, feats)


def encoder_inputs(
    cfg: Blip2Config, params: PyTree, images, text_ids, text_mask
) -> Tuple[jax.Array, jax.Array]:
    """[query embeds ; text embeds], fused attention mask
    (blip2_t5.py:151-166)."""
    q = encode_image(cfg, params, images)
    text_embeds = params["t5_model"]["shared"][text_ids].astype(q.dtype)
    x = jnp.concatenate([q, text_embeds], axis=1)
    q_mask = jnp.ones(q.shape[:2], text_mask.dtype)
    mask = jnp.concatenate([q_mask, text_mask], axis=1)
    return x, mask


def per_sample_loss(cfg: Blip2Config, params: PyTree, batch: Any) -> jax.Array:
    """(B,) LM loss — the ``loss_vision_language`` calibration loss
    (compression/pruners/utils.py:21-29 -> blip2_t5.py:116-172)."""
    x, mask = encoder_inputs(
        cfg, params, batch["image"], batch["text_input_ids"], batch["text_input_mask"]
    )
    return t5_mod.per_sample_loss(
        cfg.t5, params["t5_model"], input_ids=None, attn_mask=mask,
        labels=batch["labels"], enc_embeds=x,
    )


def generate(
    cfg: Blip2Config,
    params: PyTree,
    images: jax.Array,
    prompt_ids: jax.Array,
    prompt_mask: jax.Array,
    gen: Optional[GenerateConfig] = None,
    use_beam: bool = True,
) -> jax.Array:
    """Jitted generate (blip2_t5.py:283-340 / predict_answers :371-431).

    ONE jit program end-to-end: with only the decode loop jitted, the
    ViT/Q-Former/T5-encoder half ran eagerly — hundreds of per-op dispatches
    through the device tunnel per batch (~8.6 s/batch at XL); fused, the
    encoder fuses into the same program as the beam scan."""
    if gen is None:
        gen = GenerateConfig(max_new_tokens=30, num_beams=5)
    return _generate_jit(cfg, params, images, prompt_ids, prompt_mask, gen,
                         use_beam)


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "use_beam"))
def _generate_jit(cfg, params, images, prompt_ids, prompt_mask, gen, use_beam):
    x, mask = encoder_inputs(cfg, params, images, prompt_ids, prompt_mask)
    enc_out = t5_mod.encode_embeds(cfg.t5, params["t5_model"], x, mask)
    return t5_generate(cfg.t5, params["t5_model"], enc_out, mask, gen, use_beam)


# ---------------------------------------------------------------------------
# pruning adapter (BLIPT5 orchestrator, wanda_pruner.py:660-876)
# ---------------------------------------------------------------------------

def make_adapter(cfg: Blip2Config, params: PyTree) -> ModelAdapter:
    vit_stack = eva_vit.make_stack(
        cfg.vit, name="visual_encoder.blocks", blocks_path="visual_encoder.blocks"
    )

    enc_stack = t5_mod.make_encoder_stack(cfg.t5, prefix="t5_model")
    dec_stack = t5_mod.make_decoder_stack(cfg.t5, prefix="t5_model")

    # BLIP-2's T5 sees [query ; text] embeddings, not ids — override the
    # default id-based prepare_inputs on both T5 stacks.
    def enc_prepare(p, batch):
        x, mask = encoder_inputs(
            cfg, p, batch["image"], batch["text_input_ids"], batch["text_input_mask"]
        )
        bias = t5_mod.encoder_bias(cfg.t5, p["t5_model"], mask, x.shape[1])
        return x, bias

    def dec_prepare(p, batch):
        x, mask = encoder_inputs(
            cfg, p, batch["image"], batch["text_input_ids"], batch["text_input_mask"]
        )
        enc_out = t5_mod.encode_embeds(cfg.t5, p["t5_model"], x, mask)
        labels = batch["labels"]
        dec_in = t5_mod.shift_right(cfg.t5, labels)
        # all-ones: match per_sample_loss / HF decoder_attention_mask=None
        # (see t5.make_decoder_stack.prepare_inputs)
        dec_mask = jnp.ones_like(dec_in)
        xd = p["t5_model"]["shared"][dec_in]
        self_bias, cross_bias = t5_mod.decoder_biases(
            cfg.t5, p["t5_model"], dec_mask, mask, xd.shape[1]
        )
        return xd, (self_bias, cross_bias, enc_out)

    enc_stack.prepare_inputs = enc_prepare
    dec_stack.prepare_inputs = dec_prepare

    def loss_fn(p, batch):
        return per_sample_loss(cfg, p, batch)

    def build_mezo_plans(p, batch, num_chunks: int = 1):
        """Suffix-cached fast paths for EVERY stack's MeZO targets
        (pruning/plans.py): a perturbation in block i of a stack cannot
        change that block's input, so each plan rolls a cache of block-i
        inputs forward and evaluates only blocks >= i plus the downstream
        tail. Replaces the round-1 single T5 plan (which cached only the
        ViT/Q-Former prefix); the reference re-runs the full model per group
        (layer_single_base_pruner.py:507-536)."""
        from ecoflap_tpu.pruning.plans import SuffixPlan

        text_keys = ("text_input_ids", "text_input_mask", "labels")

        def vit_finish(pp, y, d):
            q = project_features(cfg, pp, y)
            text_embeds = pp["t5_model"]["shared"][d["text_input_ids"]]
            x = jnp.concatenate([q.astype(text_embeds.dtype), text_embeds], axis=1)
            q_mask = jnp.ones(q.shape[:2], d["text_input_mask"].dtype)
            mask = jnp.concatenate([q_mask, d["text_input_mask"]], axis=1)
            return t5_mod.per_sample_loss(
                cfg.t5, pp["t5_model"], None, mask, d["labels"], enc_embeds=x
            )

        def enc_finish(pp, y, d):
            enc_out = t5_mod.rms_norm(
                pp["t5_model"]["encoder"]["final_ln"], y, cfg.t5.ln_eps
            )
            return t5_mod.loss_from_enc(
                cfg.t5, pp["t5_model"], enc_out, d["enc_mask"], d["labels"]
            )

        def dec_finish(pp, y, d):
            return t5_mod.loss_from_dec_hidden(
                cfg.t5, pp["t5_model"], y, d["labels"]
            )

        q_mask = jnp.ones(
            (batch["image"].shape[0], cfg.num_query_tokens),
            batch["text_input_mask"].dtype,
        )
        enc_mask = jnp.concatenate([q_mask, batch["text_input_mask"]], axis=1)

        return [
            SuffixPlan(vit_stack, vit_finish, p, batch,
                       batch_keys=text_keys, num_chunks=num_chunks),
            SuffixPlan(enc_stack, enc_finish, p, batch,
                       batch_keys=("labels",),
                       extra_data={"enc_mask": enc_mask},
                       num_chunks=num_chunks),
            SuffixPlan(dec_stack, dec_finish, p, batch,
                       batch_keys=("labels",), num_chunks=num_chunks),
        ]

    return ModelAdapter(
        name="blip2_t5",
        params=params,
        loss_fn=loss_fn,
        stacks=[vit_stack, enc_stack, dec_stack],
        model_prefixes={
            vit_stack.name: "visual_encoder",
            enc_stack.name: "t5_model",
            dec_stack.name: "t5_model",
        },
        build_mezo_plans=build_mezo_plans,
    )
