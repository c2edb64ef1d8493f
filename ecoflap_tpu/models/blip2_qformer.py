"""BLIP-2 stage-1 Q-Former — ITC/ITM retrieval heads (``blip2`` model,
LAVIS/lavis/models/blip2_models/blip2_qformer.py; compute_sim_matrix
blip2.py:116-229 drives the retrieval task).

On top of the query-only Q-Former (models/qformer.py) the stage-1 model has:
* text embeddings (word + position, shared LayerNorm),
* a text path through the SAME layers (self-attention joint with queries for
  ITM; text-only for ITC) with the text FFN (``intermediate``/``output`` —
  the modules blip2_t5 deletes),
* heads: ``vision_proj``/``text_proj`` into the 256-d ITC space and the
  2-way ``itm_head``.

Retrieval scoring follows the reference: ITC first stage =
max-over-query-tokens cosine (blip2_qformer.py sim_q2t), ITM re-ranks the
top-k candidates (blip2.py:150-213).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models.layers import gelu, layer_norm, mask_bias
from ecoflap_tpu.models.qformer import (
    QFormerConfig,
    _bert_attention,
    _dense,
    _ln,
    init_params as init_query_params,
)

PyTree = Any


@dataclass(frozen=True)
class Blip2QformerConfig:
    qformer: QFormerConfig
    vocab_size: int = 30523
    max_position: int = 512
    embed_dim: int = 256  # ITC space


def tiny_config() -> Blip2QformerConfig:
    from ecoflap_tpu.models.qformer import tiny_config as qf_tiny

    return Blip2QformerConfig(qformer=qf_tiny(), vocab_size=64,
                              max_position=32, embed_dim=16)


def init_params(cfg: Blip2QformerConfig, key: jax.Array,
                dtype=jnp.float32) -> PyTree:
    qf = init_query_params(cfg.qformer, key, dtype)
    d = cfg.qformer.hidden_size
    ks = jax.random.split(jax.random.fold_in(key, 55), 8)
    # text FFN per layer (intermediate/output — stripped in blip2_t5)
    for i, layer in enumerate(qf["layers"]):
        k = jax.random.fold_in(ks[0], i)
        layer["text_ffn"] = {
            "intermediate": _dense(k, d, cfg.qformer.intermediate_size, dtype),
            "output": {
                "dense": _dense(jax.random.fold_in(k, 1),
                                cfg.qformer.intermediate_size, d, dtype),
                "ln": _ln(d, dtype),
            },
        }
    qf["word_embeddings"] = (
        jax.random.normal(ks[1], (cfg.vocab_size, d), jnp.float32) * 0.02
    ).astype(dtype)
    qf["position_embeddings"] = (
        jax.random.normal(ks[2], (cfg.max_position, d), jnp.float32) * 0.02
    ).astype(dtype)
    qf["vision_proj"] = _dense(ks[3], d, cfg.embed_dim, dtype)
    qf["text_proj"] = _dense(ks[4], d, cfg.embed_dim, dtype)
    qf["itm_head"] = _dense(ks[5], d, 2, dtype)
    return qf


def _embed_text(cfg: Blip2QformerConfig, params: PyTree, ids: jax.Array):
    x = params["word_embeddings"][ids]
    x = x + params["position_embeddings"][: ids.shape[1]][None].astype(x.dtype)
    return layer_norm(params["embeddings_ln"], x, cfg.qformer.ln_eps)


def _ffn(cfg: QFormerConfig, ffn: PyTree, x: jax.Array) -> jax.Array:
    h = (jnp.dot(x, ffn["intermediate"]["kernel"],
                 preferred_element_type=jnp.float32)
         + ffn["intermediate"]["bias"]).astype(x.dtype)
    h = gelu(h, approximate=False)
    h = (jnp.dot(h, ffn["output"]["dense"]["kernel"],
                 preferred_element_type=jnp.float32)
         + ffn["output"]["dense"]["bias"]).astype(x.dtype)
    return layer_norm(ffn["output"]["ln"], h + x, cfg.ln_eps)


def encode_text(cfg: Blip2QformerConfig, params: PyTree, ids, mask) -> jax.Array:
    """Text-only path (ITC text features): self-attn + text FFN, no cross."""
    qcfg = cfg.qformer
    x = _embed_text(cfg, params, ids)
    bias = mask_bias(mask)
    for layer in params["layers"]:
        x = _bert_attention(qcfg, layer["self_attn"], x, x, bias)
        x = _ffn(qcfg, layer["text_ffn"], x)
    return x


def encode_queries(cfg: Blip2QformerConfig, params: PyTree,
                   image_embeds: jax.Array) -> jax.Array:
    """Query-only path with cross-attn (ITC image features)."""
    from ecoflap_tpu.models.qformer import forward as qf_forward

    return qf_forward(cfg.qformer, params, image_embeds)


def multimodal_forward(cfg: Blip2QformerConfig, params: PyTree,
                       image_embeds, ids, mask) -> jax.Array:
    """ITM joint path: [queries ; text] share self-attention; queries also
    cross-attend the image and use the query FFN; text uses the text FFN
    (Qformer.py:402-470 query_length splitting)."""
    qcfg = cfg.qformer
    nq = qcfg.num_query_tokens
    b = image_embeds.shape[0]
    q = jnp.broadcast_to(
        params["query_tokens"].astype(image_embeds.dtype),
        (b, nq, qcfg.hidden_size))
    q = layer_norm(params["embeddings_ln"], q, qcfg.ln_eps)
    t = _embed_text(cfg, params, ids)
    x = jnp.concatenate([q, t], axis=1)
    joint_mask = jnp.concatenate(
        [jnp.ones((b, nq), mask.dtype), mask], axis=1)
    self_bias = mask_bias(joint_mask)

    for layer in params["layers"]:
        x = _bert_attention(qcfg, layer["self_attn"], x, x, self_bias)
        qpart, tpart = x[:, :nq], x[:, nq:]
        if "cross_attn" in layer:
            qpart = _bert_attention(qcfg, layer["cross_attn"], qpart,
                                    image_embeds, None)
        qpart = _ffn(qcfg, layer["ffn"], qpart)
        tpart = _ffn(qcfg, layer["text_ffn"], tpart)
        x = jnp.concatenate([qpart, tpart], axis=1)
    return x[:, :nq]  # query outputs feed the ITM head


def _proj_norm(p, x):
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32) + p["bias"]
    return y / jnp.linalg.norm(y, axis=-1, keepdims=True)


def itc_sim_matrix(cfg: Blip2QformerConfig, params: PyTree, image_embeds,
                   ids, mask) -> jax.Array:
    """(N_img, N_txt) first-stage similarity: max over the 32 query tokens of
    query-text cosine (blip2_qformer.py sim_q2t -> sim_i2t)."""
    q_out = encode_queries(cfg, params, image_embeds)
    img_feats = _proj_norm(params["vision_proj"], q_out)  # (N, 32, 256)
    t_out = encode_text(cfg, params, ids, mask)
    txt_feats = _proj_norm(params["text_proj"], t_out[:, 0])  # (M, 256)
    sim = jnp.einsum("nqd,md->nmq", img_feats, txt_feats)
    return jnp.max(sim, axis=-1)


def itm_score(cfg: Blip2QformerConfig, params: PyTree, image_embeds, ids,
              mask) -> jax.Array:
    """(B,) match logit: mean over query tokens of itm_head's positive class
    (blip2.py:150-213 re-ranking)."""
    q_out = multimodal_forward(cfg, params, image_embeds, ids, mask)
    logits = (jnp.dot(q_out, params["itm_head"]["kernel"],
                      preferred_element_type=jnp.float32)
              + params["itm_head"]["bias"])
    return jnp.mean(logits[..., 1], axis=-1)


def compute_sim_matrix(cfg: Blip2QformerConfig, params: PyTree, image_embeds,
                       ids, mask, k_test: int = 128):
    """Reference ``compute_sim_matrix`` (blip2.py:116-229): ITC first stage,
    then ITM re-scores each image's top-k text candidates (and symmetric for
    texts). Returns (score_i2t, score_t2i) with ITM-refined scores on the
    top-k and -inf elsewhere, like the reference's score_matrix fill."""
    import functools

    import numpy as np

    # ONE jitted ITM program reused across the host loops: each eager
    # multimodal_forward is hundreds of per-op dispatches — seconds of pure
    # dispatch per eval through a remote-device tunnel
    itm_jit = jax.jit(functools.partial(itm_score, cfg))

    sim = jax.jit(functools.partial(itc_sim_matrix, cfg))(
        params, image_embeds, ids, mask)  # (N, M)
    sim_np = np.asarray(sim)
    n, m = sim_np.shape
    k = min(k_test, m)

    score_i2t = np.full((n, m), -np.inf, np.float32)
    for i in range(n):
        topk = np.argsort(-sim_np[i])[:k]
        scores = itm_jit(params,
                         jnp.repeat(image_embeds[i:i + 1], k, axis=0),
                         ids[topk], mask[topk])
        score_i2t[i, topk] = np.asarray(scores) + sim_np[i, topk]

    kt = min(k_test, n)
    score_t2i = np.full((m, n), -np.inf, np.float32)
    for j in range(m):
        topk = np.argsort(-sim_np[:, j])[:kt]
        scores = itm_jit(params, image_embeds[topk],
                         jnp.repeat(ids[j:j + 1], kt, axis=0),
                         jnp.repeat(mask[j:j + 1], kt, axis=0))
        score_t2i[j, topk] = np.asarray(scores) + sim_np[topk, j]
    return score_i2t, score_t2i
