"""BLIP-1 — the UPop-subproject model family (captioner first).

Reference: UPop/models/blip.py ``BLIP_Decoder`` (:77-140): ViT-B/16 tower +
BERT ``text_decoder`` (med.py BertLMHeadModel: 12 post-LN layers, cross-attn
to image tokens on every layer, causal, LM head), trained/evaluated with
next-token CE over the caption (prompt tokens masked out).

Pruned stacks (UPop/pruners/wanda_pruner.py:600-720): ``visual_encoder.
blocks`` (per-tensor) and ``text_decoder.bert.encoder.layer`` (per-row), a
joint coarse stage over both — exactly the BLIP-2 orchestration shape, so the
same TwoStagePruner drives it.

ITC/ITM retrieval heads and the NLVR dual-image variant follow the same
tower composition; the retrieval projections are included (vision_proj /
text_proj -> shared 256-d space, blip.py BLIP_Base).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models import bert as bert_mod
from ecoflap_tpu.models import eva_vit
from ecoflap_tpu.pruning.adapter import LossPlan, ModelAdapter

PyTree = Any


@dataclass(frozen=True)
class Blip1Config:
    vit: eva_vit.EvaViTConfig
    text: bert_mod.BertConfig
    embed_dim: int = 256  # ITC projection space
    prompt_length: int = 0  # caption prompt tokens excluded from the loss


def blip_base(img_size: int = 384) -> Blip1Config:
    """BLIP w/ ViT-B/16 (blip.py:84-92 defaults)."""
    vit = eva_vit.EvaViTConfig(
        img_size=img_size, patch_size=16, embed_dim=768, depth=12,
        num_heads=12, mlp_hidden=3072, final_norm=True, qkv_bias_mode="full",
    )
    text = bert_mod.BertConfig(
        add_cross_attention=True, causal=True, encoder_width=768,
    )
    return Blip1Config(vit=vit, text=text)


def tiny_config() -> Blip1Config:
    vit = eva_vit.tiny_config(final_norm=True, qkv_bias_mode="full")
    text = bert_mod.tiny_config(add_cross_attention=True, causal=True,
                                encoder_width=vit.embed_dim)
    return Blip1Config(vit=vit, text=text, embed_dim=16)


def init_params(cfg: Blip1Config, key: jax.Array, dtype=jnp.float32) -> PyTree:
    kv, kt, kp1, kp2 = jax.random.split(key, 4)
    d_v, d_t = cfg.vit.embed_dim, cfg.text.hidden_size
    return {
        "visual_encoder": eva_vit.init_params(cfg.vit, kv, dtype),
        "text_decoder": bert_mod.init_params(cfg.text, kt, dtype),
        "vision_proj": {
            "kernel": (jax.random.normal(kp1, (d_v, cfg.embed_dim), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((cfg.embed_dim,), dtype),
        },
        "text_proj": {
            "kernel": (jax.random.normal(kp2, (d_t, cfg.embed_dim), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((cfg.embed_dim,), dtype),
        },
    }


def encode_image(cfg: Blip1Config, params: PyTree, images: jax.Array) -> jax.Array:
    """All ViT tokens (final-norm applied to every token, BLIP convention)."""
    x = eva_vit.forward_features(cfg.vit, params["visual_encoder"], images)
    from ecoflap_tpu.models.layers import layer_norm

    return layer_norm(params["visual_encoder"]["norm"], x, cfg.vit.ln_eps)


def per_sample_loss(cfg: Blip1Config, params: PyTree, batch: Any) -> jax.Array:
    """Caption LM loss: decoder teacher-forced on caption ids with cross-attn
    to image tokens; next-token CE, -100/prompt positions ignored
    (blip.py:107-134)."""
    img = encode_image(cfg, params, batch["image"])
    ids = batch["caption_ids"]
    mask = batch["caption_mask"]
    hidden = bert_mod.forward(cfg.text, params["text_decoder"], ids, mask, img)
    logits = bert_mod.lm_logits(cfg.text, params["text_decoder"], hidden)
    targets = ids[:, 1:]
    valid = mask[:, 1:] > 0
    if cfg.prompt_length > 1:
        pos = jnp.arange(targets.shape[1])[None]
        valid = valid & (pos >= cfg.prompt_length - 1)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)


def itc_features(cfg: Blip1Config, params: PyTree, images, ids, mask):
    """Normalized (image, text) embeddings in the shared 256-d ITC space."""
    img = encode_image(cfg, params, images)[:, 0]
    iv = jnp.dot(img, params["vision_proj"]["kernel"],
                 preferred_element_type=jnp.float32) + params["vision_proj"]["bias"]
    txt_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False,
                                     "add_cross_attention": False})
    # text-only encoding reuses the decoder's self-attn path without cross
    hidden = bert_mod.forward(txt_cfg, params["text_decoder"], ids, mask)
    tv = jnp.dot(hidden[:, 0], params["text_proj"]["kernel"],
                 preferred_element_type=jnp.float32) + params["text_proj"]["bias"]

    def norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    return norm(iv), norm(tv)


def make_adapter(cfg: Blip1Config, params: PyTree) -> ModelAdapter:
    vit_stack = eva_vit.make_stack(
        cfg.vit, name="visual_encoder.blocks", blocks_path="visual_encoder.blocks"
    )

    def bert_prepare(p, batch):
        img = encode_image(cfg, p, batch["image"])
        x = bert_mod.embed(cfg.text, p["text_decoder"], batch["caption_ids"])
        cache = bert_mod.make_cache(
            cfg.text, batch["caption_mask"], img,
            jnp.ones(img.shape[:2], jnp.int32), x.shape[1],
        )
        return x, cache

    bert_stack = bert_mod.make_bert_stack(
        cfg.text, name="text_decoder.bert.encoder.layer",
        blocks_path="text_decoder.blocks", prepare_inputs=bert_prepare,
    )

    def loss_fn(p, batch):
        return per_sample_loss(cfg, p, batch)

    def build_mezo_plans(p, batch, num_chunks: int = 1):
        from ecoflap_tpu.pruning.mezo import make_chunked_loss

        enc = make_chunked_loss(
            lambda pp, b: encode_image(cfg, pp, b["image"]), num_chunks
        )
        img = jax.jit(enc)(p, {"image": batch["image"]})
        n = batch["image"].shape[0]
        img = img.reshape(n, -1, cfg.vit.embed_dim)
        data = {**batch, "image_embeds": img}

        def text_loss(pp, b):
            hidden = bert_mod.forward(
                cfg.text, pp["text_decoder"], b["caption_ids"],
                b["caption_mask"], b["image_embeds"],
            )
            logits = bert_mod.lm_logits(cfg.text, pp["text_decoder"], hidden)
            targets = b["caption_ids"][:, 1:]
            valid = b["caption_mask"][:, 1:] > 0
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            ce = jnp.where(valid, ce, 0.0)
            return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)

        return [LossPlan(
            match=lambda name: name.startswith("text_decoder."),
            loss_fn=text_loss, data=data,
        )]

    return ModelAdapter(
        name="blip1", params=params, loss_fn=loss_fn,
        stacks=[vit_stack, bert_stack],
        model_prefixes={
            vit_stack.name: "visual_encoder",
            bert_stack.name: "text_decoder",
        },
        build_mezo_plans=build_mezo_plans,
    )
