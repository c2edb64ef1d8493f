"""BLIP-2 OPT — frozen EVA-ViT ∘ Q-Former ∘ opt_proj ∘ frozen OPT decoder
(LAVIS/lavis/models/blip2_models/blip2_opt.py: query embeds prepended to the
prompt embeds, LM loss on the text continuation only).

Same pruning surface shape as Blip2T5: ``visual_encoder.blocks`` (per-tensor)
+ ``opt_model.model.decoder.layers`` (per-row).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ecoflap_tpu.models import eva_vit, opt as opt_mod, qformer
from ecoflap_tpu.models.layers import layer_norm, mask_bias, tower_scan
from ecoflap_tpu.pruning.adapter import LossPlan, ModelAdapter

PyTree = Any


@dataclass(frozen=True)
class Blip2OptConfig:
    vit: eva_vit.EvaViTConfig
    opt: opt_mod.OPTConfig
    qformer: qformer.QFormerConfig

    @property
    def num_query_tokens(self) -> int:
        return self.qformer.num_query_tokens


def blip2_opt2_7b(img_size: int = 224) -> Blip2OptConfig:
    vit = eva_vit.eva_vit_g(img_size)
    return Blip2OptConfig(
        vit=vit, opt=opt_mod.opt_2_7b(),
        qformer=qformer.QFormerConfig(encoder_width=vit.embed_dim),
    )


def tiny_config() -> Blip2OptConfig:
    vit = eva_vit.tiny_config()
    return Blip2OptConfig(
        vit=vit, opt=opt_mod.tiny_config(),
        qformer=qformer.tiny_config(encoder_width=vit.embed_dim),
    )


def init_params(cfg: Blip2OptConfig, key: jax.Array, dtype=jnp.float32) -> PyTree:
    kv, kq, ko, kp = jax.random.split(key, 4)
    qf = qformer.init_params(cfg.qformer, kq, dtype)
    query_tokens = qf.pop("query_tokens")
    return {
        "visual_encoder": eva_vit.init_params(cfg.vit, kv, dtype),
        "ln_vision": {"scale": jnp.ones((cfg.vit.embed_dim,), dtype),
                      "bias": jnp.zeros((cfg.vit.embed_dim,), dtype)},
        "query_tokens": query_tokens,
        "qformer": qf,
        "opt_proj": {
            "kernel": (jax.random.normal(
                kp, (cfg.qformer.hidden_size, cfg.opt.d_model), jnp.float32
            ) * 0.02).astype(dtype),
            "bias": jnp.zeros((cfg.opt.d_model,), dtype),
        },
        "opt_model": opt_mod.init_params(cfg.opt, ko, dtype),
    }


def encode_image(cfg: Blip2OptConfig, params: PyTree, images: jax.Array) -> jax.Array:
    feats = eva_vit.forward_features(cfg.vit, params["visual_encoder"], images)
    feats = layer_norm(params["ln_vision"], feats, 1e-5)
    q = qformer.forward(
        cfg.qformer,
        {**params["qformer"], "query_tokens": params["query_tokens"]},
        feats,
    )
    return (jnp.dot(q, params["opt_proj"]["kernel"],
                    preferred_element_type=jnp.float32)
            + params["opt_proj"]["bias"]).astype(q.dtype)


def _decoder_inputs(cfg, params, query_embeds, text_ids, text_mask):
    """[query ; text] embedding sequence + joint mask. Positions for the text
    part restart after the queries (blip2_opt concatenates embeds)."""
    op = params["opt_model"]
    text_embeds = op["embed_tokens"][text_ids]
    positions = jnp.cumsum(text_mask, axis=1) * text_mask - 1
    text_embeds = text_embeds + op["embed_positions"][positions + 2].astype(
        text_embeds.dtype)
    nq = query_embeds.shape[1]
    # queries take the first nq positions
    qpos = jnp.arange(nq)[None]
    q = query_embeds + op["embed_positions"][qpos + 2].astype(query_embeds.dtype)
    x = jnp.concatenate([q, text_embeds.astype(q.dtype)], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((x.shape[0], nq), text_mask.dtype), text_mask], axis=1)
    return x, mask


def generate(
    cfg: Blip2OptConfig,
    params: PyTree,
    images: jax.Array,
    prompt_ids: jax.Array,
    prompt_mask: jax.Array,
    gen=None,
    use_beam: bool = True,
) -> jax.Array:
    """Jitted captioning/VQA generate (blip2_opt.py:154-236: query embeds
    prepended to the prompt, HF beam search over the OPT decoder; the
    reference's caption eval runs beam-5, max_len 30, min_len 8).

    Prompts must be UNPADDED and uniform-length (the reference's captioning
    path tokenizes one shared prompt) — positions and the HF length
    accounting (min_length counts the prompt TOKENS, not the query embeds;
    length-penalty normalization counts neither) come from the static
    prompt length."""
    from ecoflap_tpu.models.generation import GenerateConfig

    if gen is None:
        gen = GenerateConfig(max_new_tokens=30, num_beams=5, min_length=8,
                             eos_token_id=cfg.opt.eos_token_id,
                             pad_token_id=cfg.opt.pad_token_id)
    return _generate_jit(cfg, params, images, prompt_ids, prompt_mask, gen,
                         use_beam)


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "use_beam"))
def _generate_jit(cfg, params, images, prompt_ids, prompt_mask, gen, use_beam):
    q = encode_image(cfg, params, images)
    x, mask = _decoder_inputs(cfg, params, q, prompt_ids, prompt_mask)
    t = prompt_ids.shape[1]
    return opt_mod.generate_from_embeds(
        cfg.opt, params["opt_model"],
        x[:, :-1], mask[:, :-1], prompt_ids[:, -1], gen, use_beam,
        pos0=t - 1, len_offset=t - 1, prompt_tokens=prompt_ids)


def per_sample_loss(cfg: Blip2OptConfig, params: PyTree, batch: Any) -> jax.Array:
    """LM loss over the text tokens only (queries masked out of the targets,
    blip2_opt.py forward)."""
    q = encode_image(cfg, params, batch["image"])
    x, mask = _decoder_inputs(cfg, params, q, batch["text_ids"],
                              batch["text_mask"])
    s = x.shape[1]
    causal = jnp.where(jnp.tril(jnp.ones((s, s), jnp.bool_)), 0.0, -1e9)[None, None]
    bias = causal + mask_bias(mask)
    op = params["opt_model"]

    def body(h, bp):
        y, _ = opt_mod.block_forward(cfg.opt, bp, h, bias)
        return y, None

    h, _ = tower_scan(body, x, op["layers"])
    h = layer_norm(op["final_ln"], h, cfg.opt.ln_eps)
    logits = jnp.dot(h, op["embed_tokens"].T, preferred_element_type=jnp.float32)

    nq = cfg.num_query_tokens
    text_logits = logits[:, nq - 1 : -1]  # predict text token t from t-1
    targets = batch["text_ids"]
    valid = batch["text_mask"] > 0
    logp = jax.nn.log_softmax(text_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)


def make_adapter(cfg: Blip2OptConfig, params: PyTree) -> ModelAdapter:
    vit_stack = eva_vit.make_stack(
        cfg.vit, name="visual_encoder.blocks", blocks_path="visual_encoder.blocks"
    )

    from ecoflap_tpu.models.adapters import make_stack

    def opt_prepare(p, batch):
        q = encode_image(cfg, p, batch["image"])
        x, mask = _decoder_inputs(cfg, p, q, batch["text_ids"],
                                  batch["text_mask"])
        s = x.shape[1]
        causal = jnp.where(jnp.tril(jnp.ones((s, s), jnp.bool_)), 0.0,
                           -1e9)[None, None]
        return x, causal + mask_bias(mask)

    def _fwd(bp, x, cache, collect=None):
        return opt_mod.block_forward(cfg.opt, bp, x, cache, collect)

    opt_stack = make_stack(
        name="opt_model.model.decoder.layers",
        num_blocks=cfg.opt.num_layers,
        linear_names=opt_mod.LINEAR_NAMES,
        per_row_mask=True,
        prepare_inputs=opt_prepare,
        block_forward=_fwd,
        blocks_path="opt_model.layers",
        local_to_path=opt_mod.LOCAL_TO_PATH,
    )

    def loss_fn(p, batch):
        return per_sample_loss(cfg, p, batch)

    def build_mezo_plans(p, batch, num_chunks: int = 1):
        from ecoflap_tpu.pruning.mezo import make_chunked_loss

        enc = make_chunked_loss(
            lambda pp, b: encode_image(cfg, pp, b["image"]), num_chunks)
        q = jax.jit(enc)(p, {"image": batch["image"]})
        q = q.reshape(batch["image"].shape[0], cfg.num_query_tokens, -1)
        data = {**batch, "query_embeds": q}

        def opt_loss(pp, b):
            x, mask = _decoder_inputs(cfg, pp, b["query_embeds"],
                                      b["text_ids"], b["text_mask"])
            s = x.shape[1]
            causal = jnp.where(jnp.tril(jnp.ones((s, s), jnp.bool_)), 0.0,
                               -1e9)[None, None]
            bias = causal + mask_bias(mask)
            op = pp["opt_model"]

            def body(h, bp):
                y, _ = opt_mod.block_forward(cfg.opt, bp, h, bias)
                return y, None

            h, _ = tower_scan(body, x, op["layers"])
            h = layer_norm(op["final_ln"], h, cfg.opt.ln_eps)
            logits = jnp.dot(h, op["embed_tokens"].T,
                             preferred_element_type=jnp.float32)
            nq = cfg.num_query_tokens
            logp = jax.nn.log_softmax(logits[:, nq - 1 : -1], axis=-1)
            ce = -jnp.take_along_axis(
                logp, b["text_ids"][..., None], axis=-1)[..., 0]
            valid = b["text_mask"] > 0
            ce = jnp.where(valid, ce, 0.0)
            return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)

        return [LossPlan(
            match=lambda name: name.startswith("opt_model."),
            loss_fn=opt_loss, data=data,
        )]

    return ModelAdapter(
        name="blip2_opt", params=params, loss_fn=loss_fn,
        stacks=[vit_stack, opt_stack],
        model_prefixes={vit_stack.name: "visual_encoder",
                        opt_stack.name: "opt_model"},
        build_mezo_plans=build_mezo_plans,
    )
