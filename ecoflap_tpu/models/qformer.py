"""Q-Former — the BLIP-2 querying transformer, query-only path.

Rebuild of the reference's BERT-based Q-Former as used by ``Blip2T5``
(LAVIS/lavis/models/blip2_models/Qformer.py:378-470, blip2.py:47-61):

* 32 learned query tokens; no word/position embeddings (stripped,
  blip2_t5.py:79-84) — the embedding stage is just LayerNorm(+dropout) over
  the query tokens.
* 12 post-LN BERT layers: self-attention; cross-attention to the frozen
  image tokens on every ``cross_attention_freq=2``-nd layer (layer_num % 2
  == 0); query-token FFN ``intermediate_query``/``output_query`` (the text
  ``intermediate``/``output`` modules are deleted in blip2_t5).
* cross-attention key/value project from ``encoder_width`` (1408 for
  EVA-g) down to the Q-Former hidden size.

Layers are stored as a heterogeneous list (cross-attn exists only on even
layers); the Q-Former is never pruned or scanned, and 12 unrolled layers jit
fine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ecoflap_tpu.models.layers import attention, gelu, layer_norm, tower_scan

PyTree = Any


@dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    encoder_width: int = 1408  # image token width (EVA-g)
    num_query_tokens: int = 32
    cross_attention_freq: int = 2
    ln_eps: float = 1e-12  # BERT default


def tiny_config(**kw) -> QFormerConfig:
    defaults = dict(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, encoder_width=32, num_query_tokens=4)
    defaults.update(kw)
    return QFormerConfig(**defaults)


def _dense(key, d_in, d_out, dtype, std=0.02):
    return {
        "kernel": (jax.random.normal(key, (d_in, d_out), jnp.float32) * std).astype(dtype),
        "bias": jnp.zeros((d_out,), dtype),
    }


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _attn_block(key, d_q, d_kv, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "query": _dense(ks[0], d_q, d, dtype),
        "key": _dense(ks[1], d_kv, d, dtype),
        "value": _dense(ks[2], d_kv, d, dtype),
        "output": {"dense": _dense(ks[3], d, d, dtype), "ln": _ln(d, dtype)},
    }


def init_params(cfg: QFormerConfig, key: jax.Array, dtype=jnp.float32) -> PyTree:
    d = cfg.hidden_size
    keys = jax.random.split(key, cfg.num_layers + 2)
    layers: List[Dict[str, Any]] = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i], 3)
        layer: Dict[str, Any] = {
            "self_attn": _attn_block(ks[0], d, d, d, dtype),
            "ffn": {
                "intermediate": _dense(ks[1], d, cfg.intermediate_size, dtype),
                "output": {
                    "dense": _dense(ks[2], cfg.intermediate_size, d, dtype),
                    "ln": _ln(d, dtype),
                },
            },
        }
        if i % cfg.cross_attention_freq == 0:
            layer["cross_attn"] = _attn_block(
                jax.random.fold_in(keys[i], 7), d, cfg.encoder_width, d, dtype
            )
        layers.append(layer)
    return {
        "embeddings_ln": _ln(d, dtype),
        "layers": layers,
        "query_tokens": (
            jax.random.normal(keys[-1], (1, cfg.num_query_tokens, d), jnp.float32)
            * 0.02
        ).astype(dtype),
    }


def _bert_attention(
    cfg: QFormerConfig, ap: PyTree, x: jax.Array, kv: jax.Array,
    bias: Optional[jax.Array],
) -> jax.Array:
    """Post-LN BERT attention: out = LN(dense(attn) + x)."""
    def proj(p, v):
        return (
            jnp.dot(v, p["kernel"], preferred_element_type=jnp.float32) + p["bias"]
        ).astype(x.dtype)

    q = proj(ap["query"], x)
    k = proj(ap["key"], kv)
    v = proj(ap["value"], kv)
    o = attention(q, k, v, cfg.num_heads, bias=bias)
    o = proj(ap["output"]["dense"], o)
    return layer_norm(ap["output"]["ln"], o + x, cfg.ln_eps)


def _layer_forward(cfg, layer, x, image_embeds, bias):
    x = _bert_attention(cfg, layer["self_attn"], x, x, None)
    if "cross_attn" in layer:
        x = _bert_attention(cfg, layer["cross_attn"], x, image_embeds, bias)
    h = (
        jnp.dot(x, layer["ffn"]["intermediate"]["kernel"],
                preferred_element_type=jnp.float32)
        + layer["ffn"]["intermediate"]["bias"]
    ).astype(x.dtype)
    h = gelu(h, approximate=False)
    h = (
        jnp.dot(h, layer["ffn"]["output"]["dense"]["kernel"],
                preferred_element_type=jnp.float32)
        + layer["ffn"]["output"]["dense"]["bias"]
    ).astype(x.dtype)
    return layer_norm(layer["ffn"]["output"]["ln"], h + x, cfg.ln_eps)


def forward(
    cfg: QFormerConfig,
    params: PyTree,
    image_embeds: jax.Array,
    image_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Query-only Q-Former: (B, Nimg, encoder_width) image tokens ->
    (B, num_query_tokens, hidden) query outputs (Qformer.py:402-470).

    With the standard every-2nd-layer cross-attention layout the layer list
    is scanned as stacked (cross, plain) PAIRS — one compiled pair program
    instead of 12 inlined layers. Cuts the traced-graph size ~6x, which is
    what makes the full BLIP-2 loss compile in seconds instead of minutes
    when nested under chunked lax.map."""
    b = image_embeds.shape[0]
    x = jnp.broadcast_to(
        params["query_tokens"].astype(image_embeds.dtype),
        (b, cfg.num_query_tokens, cfg.hidden_size),
    )
    x = layer_norm(params["embeddings_ln"], x, cfg.ln_eps)
    bias = None
    if image_mask is not None:
        from ecoflap_tpu.models.layers import mask_bias
        bias = mask_bias(image_mask)

    layers = params["layers"]
    pairable = (
        cfg.cross_attention_freq == 2
        and cfg.num_layers % 2 == 0
        and all(("cross_attn" in l) == (i % 2 == 0) for i, l in enumerate(layers))
    )
    if pairable and cfg.num_layers >= 4:
        evens = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers[0::2])
        odds = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers[1::2])

        def body(x, pair):
            even, odd = pair
            x = _layer_forward(cfg, even, x, image_embeds, bias)
            x = _layer_forward(cfg, odd, x, image_embeds, bias)
            return x, None

        x, _ = tower_scan(body, x, (evens, odds))
        return x

    for layer in layers:
        x = _layer_forward(cfg, layer, x, image_embeds, bias)
    return x
