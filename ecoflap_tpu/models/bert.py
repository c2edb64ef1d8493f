"""Stacked BERT stack — BLIP's ``med.py`` text encoder/decoder rebuilt.

Reference: UPop/models/med.py (BertSelfAttention :87, BertLayer :322,
BertLMHeadModel) — standard post-LN BERT with:

* optional cross-attention on EVERY layer (BLIP text towers set
  ``add_cross_attention`` globally, unlike the Q-Former's every-2nd),
* causal masking + LM head for the decoder (``text_decoder``),
* word+position embeddings with LayerNorm.

Blocks are STACKED (homogeneous, unlike the Q-Former) so the tower scans and
the pruning engine slices. Prunable linears carry the reference local names
(``attention.self.query`` … ``output.dense``, UPop/pruners/wanda_pruner.py
walks exactly these under ``text_decoder.bert.encoder.layer``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models.adapters import make_stack
from ecoflap_tpu.models.layers import (
    attention,
    collect_stats,
    layer_norm,
    mask_bias,
    tower_scan,
)

PyTree = Any

LINEAR_NAMES = (
    "attention.self.query",
    "attention.self.key",
    "attention.self.value",
    "attention.output.dense",
    "crossattention.self.query",
    "crossattention.self.key",
    "crossattention.self.value",
    "crossattention.output.dense",
    "intermediate.dense",
    "output.dense",
)
LINEAR_NAMES_NO_CROSS = tuple(
    n for n in LINEAR_NAMES if not n.startswith("crossattention")
)
LOCAL_TO_PATH = {
    "attention.self.query": "attn.query",
    "attention.self.key": "attn.key",
    "attention.self.value": "attn.value",
    "attention.output.dense": "attn.out",
    "crossattention.self.query": "cross.query",
    "crossattention.self.key": "cross.key",
    "crossattention.self.value": "cross.value",
    "crossattention.output.dense": "cross.out",
    "intermediate.dense": "ffn.intermediate",
    "output.dense": "ffn.out",
}


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30524  # BLIP's bert-base + special tokens
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    encoder_width: int = 768  # cross-attn K/V input width
    add_cross_attention: bool = False
    causal: bool = False  # decoder mode
    ln_eps: float = 1e-12
    pad_token_id: int = 0  # BERT tokenizer [PAD]
    sep_token_id: int = 102  # [SEP] — BLIP's caption EOS


def tiny_config(**kw) -> BertConfig:
    # sep within the tiny vocab: the real [SEP]=102 would be an OOB EOS
    # (silently-dropped scatter + unreachable stop) at vocab 64
    defaults = dict(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position=32, encoder_width=32,
                    sep_token_id=5)
    defaults.update(kw)
    return BertConfig(**defaults)


def _dense(key, d_in, d_out, L, dtype, std=0.02):
    return {
        "kernel": (jax.random.normal(key, (L, d_in, d_out), jnp.float32) * std).astype(dtype),
        "bias": jnp.zeros((L, d_out), dtype),
    }


def _ln(L, d, dtype):
    return {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)}


def init_params(cfg: BertConfig, key: jax.Array, dtype=jnp.float32) -> PyTree:
    ks = jax.random.split(key, 16)
    d, L, F = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    blocks: Dict[str, Any] = {
        "attn": {
            "query": _dense(ks[0], d, d, L, dtype),
            "key": _dense(ks[1], d, d, L, dtype),
            "value": _dense(ks[2], d, d, L, dtype),
            "out": _dense(ks[3], d, d, L, dtype),
            "ln": _ln(L, d, dtype),
        },
        "ffn": {
            "intermediate": _dense(ks[4], d, F, L, dtype),
            "out": _dense(ks[5], F, d, L, dtype),
            "ln": _ln(L, d, dtype),
        },
    }
    if cfg.add_cross_attention:
        blocks["cross"] = {
            "query": _dense(ks[6], d, d, L, dtype),
            "key": _dense(ks[7], cfg.encoder_width, d, L, dtype),
            "value": _dense(ks[8], cfg.encoder_width, d, L, dtype),
            "out": _dense(ks[9], d, d, L, dtype),
            "ln": _ln(L, d, dtype),
        }
    return {
        "embeddings": {
            "word": (jax.random.normal(ks[10], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
            "position": (jax.random.normal(ks[11], (cfg.max_position, d), jnp.float32) * 0.02).astype(dtype),
            "ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        },
        "blocks": blocks,
        "cls": {  # BertLMPredictionHead: transform + decoder tied/untied
            "transform": {
                "kernel": (jax.random.normal(ks[12], (d, d), jnp.float32) * 0.02).astype(dtype),
                "bias": jnp.zeros((d,), dtype),
            },
            "transform_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "decoder_bias": jnp.zeros((cfg.vocab_size,), dtype),
        },
    }


def _proj(p, x):
    return (jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
            + p["bias"]).astype(x.dtype)


def _bert_attn(cfg, ap, x, kv, bias, stats, prefix, collect):
    collect_stats(stats, f"{prefix}.self.query", x, collect)
    collect_stats(stats, f"{prefix}.self.key", kv, collect)
    collect_stats(stats, f"{prefix}.self.value", kv, collect)
    q = _proj(ap["query"], x)
    k = _proj(ap["key"], kv)
    v = _proj(ap["value"], kv)
    o = attention(q, k, v, cfg.num_heads, bias=bias)
    collect_stats(stats, f"{prefix}.output.dense", o, collect)
    o = _proj(ap["out"], o)
    return layer_norm(ap["ln"], o + x, cfg.ln_eps)


def block_forward(
    cfg: BertConfig,
    bp: PyTree,
    x: jax.Array,
    cache: Any,
    collect: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """cache = (self_bias, cross_bias, encoder_hidden_states)."""
    self_bias, cross_bias, enc = cache
    stats: Dict[str, jax.Array] = {}
    x = _bert_attn(cfg, bp["attn"], x, x, self_bias, stats, "attention", collect)
    if cfg.add_cross_attention:
        x = _bert_attn(cfg, bp["cross"], x, enc.astype(x.dtype), cross_bias,
                       stats, "crossattention", collect)
    collect_stats(stats, "intermediate.dense", x, collect)
    h = jax.nn.gelu(_proj(bp["ffn"]["intermediate"], x), approximate=False)
    collect_stats(stats, "output.dense", h, collect)
    h = _proj(bp["ffn"]["out"], h)
    return layer_norm(bp["ffn"]["ln"], h + x, cfg.ln_eps), stats


def embed(cfg: BertConfig, params: PyTree, ids: jax.Array) -> jax.Array:
    e = params["embeddings"]
    x = e["word"][ids] + e["position"][: ids.shape[1]][None].astype(e["word"].dtype)
    return layer_norm(e["ln"], x, cfg.ln_eps)


def make_cache(cfg: BertConfig, attn_mask, enc=None, enc_mask=None, seq=None):
    self_bias = mask_bias(attn_mask)
    if cfg.causal:
        s = seq if seq is not None else attn_mask.shape[1]
        causal = jnp.where(jnp.tril(jnp.ones((s, s), jnp.bool_)), 0.0, -1e9)
        self_bias = self_bias + causal[None, None]
    cross_bias = mask_bias(enc_mask) if enc_mask is not None else None
    return (self_bias, cross_bias, enc)


def forward(
    cfg: BertConfig,
    params: PyTree,
    ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    enc: Optional[jax.Array] = None,
    enc_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, S) ids -> (B, S, D) hidden states via one scanned program."""
    if attn_mask is None:
        attn_mask = jnp.ones_like(ids)
    if enc is not None and enc_mask is None:
        enc_mask = jnp.ones(enc.shape[:2], jnp.int32)
    x = embed(cfg, params, ids)
    cache = make_cache(cfg, attn_mask, enc, enc_mask, x.shape[1])

    def body(x, bp):
        y, _ = block_forward(cfg, bp, x, cache)
        return y, None

    x, _ = tower_scan(body, x, params["blocks"])
    return x


def lm_logits(cfg: BertConfig, params: PyTree, hidden: jax.Array) -> jax.Array:
    """BertLMPredictionHead: gelu(transform) -> LN -> tied word embedding."""
    c = params["cls"]
    h = (jnp.dot(hidden, c["transform"]["kernel"], preferred_element_type=jnp.float32)
         + c["transform"]["bias"]).astype(hidden.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = layer_norm(c["transform_ln"], h, cfg.ln_eps)
    return (
        jnp.dot(h, params["embeddings"]["word"].T, preferred_element_type=jnp.float32)
        + c["decoder_bias"]
    )


def make_bert_stack(
    cfg: BertConfig,
    name: str,
    blocks_path: str,
    prepare_inputs,
):
    linears = LINEAR_NAMES if cfg.add_cross_attention else LINEAR_NAMES_NO_CROSS

    def _fwd(bp, x, cache, collect=None):
        return block_forward(cfg, bp, x, cache, collect)

    return make_stack(
        name=name, num_blocks=cfg.num_layers, linear_names=linears,
        per_row_mask=True, prepare_inputs=prepare_inputs, block_forward=_fwd,
        blocks_path=blocks_path, local_to_path=LOCAL_TO_PATH,
    )


# ---------------------------------------------------------------------------
# generation (BLIP caption decoder): the reference generates captions via
# HF BertLMHeadModel.generate with encoder_hidden_states cross-attention
# (UPop/BLIP blip_caption generate: beam-3, max_length 20, min_length 5,
# prompt "a picture of "). Decoder-only semantics: HF's cur_len counts the
# prompt tokens (min_length only; the length-penalty normalization
# subtracts decoder_prompt_len), so callers pass len_offset = T - 1.
# ---------------------------------------------------------------------------

def init_gen_cache(
    cfg: BertConfig,
    params: PyTree,
    prompt_ids: jax.Array,
    prompt_mask: jax.Array,
    enc: jax.Array,
    enc_mask: Optional[jax.Array],
    max_new_tokens: int,
) -> PyTree:
    """Prefill over ``prompt_ids`` (which must EXCLUDE the last prompt
    token — that is fed as ``tok0``): capture every layer's self K/V and
    precompute the per-layer cross K/V once (the decode loop never touches
    the encoder again). Leaves are batch-major for beam reorder."""
    assert cfg.causal and cfg.add_cross_attention
    if enc_mask is None:
        enc_mask = jnp.ones(enc.shape[:2], jnp.int32)
    p = prompt_ids.shape[1]
    self_bias, cross_bias, _ = make_cache(cfg, prompt_mask, enc, enc_mask, p)
    x = embed(cfg, params, prompt_ids)

    def body(x, bp):
        k = _proj(bp["attn"]["key"], x)
        v = _proj(bp["attn"]["value"], x)
        y, _ = block_forward(cfg, bp, x, (self_bias, cross_bias, enc))
        ck = _proj(bp["cross"]["key"], enc.astype(x.dtype))
        cv = _proj(bp["cross"]["value"], enc.astype(x.dtype))
        return y, (k, v, ck, cv)

    _, (ks, vs, cks, cvs) = tower_scan(body, x, params["blocks"])
    pad = [(0, 0), (0, 0), (0, max_new_tokens), (0, 0)]
    return {
        "self_k": jnp.pad(ks, pad).transpose(1, 0, 2, 3),
        "self_v": jnp.pad(vs, pad).transpose(1, 0, 2, 3),
        "cross_k": cks.transpose(1, 0, 2, 3),
        "cross_v": cvs.transpose(1, 0, 2, 3),
        "cross_bias": mask_bias(enc_mask),
        "key_mask": jnp.pad(prompt_mask.astype(jnp.int32),
                            [(0, 0), (0, max_new_tokens)]),
    }


def make_bert_step_fn(cfg: BertConfig, params: PyTree, prefix_len: int,
                      max_new_tokens: int):
    """One-token decode step (post-LN residuals, cross-attn every layer,
    BertLMPredictionHead logits). Absolute position of the token processed
    at step ``pos`` is ``prefix_len + pos`` (the last prompt token sits at
    slot/position ``prefix_len``)."""
    total = prefix_len + max_new_tokens
    ar = jnp.arange(total)
    e = params["embeddings"]

    def _attn_1(q, k, v, bias):
        return attention(q, k, v, cfg.num_heads, bias=bias)

    def step_fn(tok: jax.Array, pos: jax.Array, cache: PyTree):
        x = e["word"][tok][:, None, :]
        x = x + jax.lax.dynamic_slice_in_dim(
            e["position"], prefix_len + pos, 1, axis=0)[None].astype(x.dtype)
        x = layer_norm(e["ln"], x, cfg.ln_eps)
        write = prefix_len + pos
        valid = (cache["key_mask"] > 0) | (
            (ar >= prefix_len) & (ar <= write))[None]
        self_bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :].astype(
            jnp.float32)
        cross_bias = cache["cross_bias"]

        def layer(x, inp):
            bp, sk, sv, ck, cv = inp
            q = _proj(bp["attn"]["query"], x)
            k_new = _proj(bp["attn"]["key"], x).astype(sk.dtype)
            v_new = _proj(bp["attn"]["value"], x).astype(sv.dtype)
            sk = jax.lax.dynamic_update_slice_in_dim(sk, k_new, write, axis=1)
            sv = jax.lax.dynamic_update_slice_in_dim(sv, v_new, write, axis=1)
            o = _proj(bp["attn"]["out"], _attn_1(q, sk, sv, self_bias))
            x = layer_norm(bp["attn"]["ln"], o + x, cfg.ln_eps)

            q = _proj(bp["cross"]["query"], x)
            o = _proj(bp["cross"]["out"], _attn_1(q, ck, cv, cross_bias))
            x = layer_norm(bp["cross"]["ln"], o + x, cfg.ln_eps)

            h = jax.nn.gelu(_proj(bp["ffn"]["intermediate"], x),
                            approximate=False)
            x = layer_norm(bp["ffn"]["ln"], _proj(bp["ffn"]["out"], h) + x,
                           cfg.ln_eps)
            return x, (sk, sv)

        xs = (params["blocks"],
              cache["self_k"].swapaxes(0, 1), cache["self_v"].swapaxes(0, 1),
              cache["cross_k"].swapaxes(0, 1), cache["cross_v"].swapaxes(0, 1))
        x, (sk, sv) = jax.lax.scan(layer, x, xs)
        cache = {**cache, "self_k": sk.swapaxes(0, 1),
                 "self_v": sv.swapaxes(0, 1)}
        logits = lm_logits(cfg, params, x)[:, 0]
        return logits, cache

    return step_fn


def generate_with_encoder(
    cfg: BertConfig,
    params: PyTree,
    prompt_ids: jax.Array,
    enc: jax.Array,
    gen,
    use_beam: bool = True,
) -> jax.Array:
    """Generate from an UNPADDED uniform prompt with cross-attention to
    ``enc`` (the BLIP caption path: one shared prompt per batch)."""
    from ecoflap_tpu.models.generation import (
        beam_generate,
        expand_for_beams,
        greedy_generate,
    )

    b, t = prompt_ids.shape
    mask = jnp.ones((b, t - 1), jnp.int32)
    prefix, last = prompt_ids[:, :-1], prompt_ids[:, -1]
    if use_beam and gen.num_beams > 1:
        prefix = expand_for_beams(prefix, gen.num_beams)
        mask = expand_for_beams(mask, gen.num_beams)
        last = expand_for_beams(last, gen.num_beams)
        enc_b = expand_for_beams(enc, gen.num_beams)
        cache = init_gen_cache(cfg, params, prefix, mask, enc_b, None,
                               gen.max_new_tokens)
        step = make_bert_step_fn(cfg, params, t - 1, gen.max_new_tokens)
        return beam_generate(step, cache, b, gen, tok0=last,
                             len_offset=t - 1,
                             prompt_tokens=expand_for_beams(
                                 prompt_ids, gen.num_beams))
    cache = init_gen_cache(cfg, params, prefix, mask, enc, None,
                           gen.max_new_tokens)
    step = make_bert_step_fn(cfg, params, t - 1, gen.max_new_tokens)
    return greedy_generate(step, cache, b, gen, tok0=last,
                           len_offset=t - 1, prompt_tokens=prompt_ids)
