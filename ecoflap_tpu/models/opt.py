"""OPT decoder LM — the BLIP-2 OPT variant's language tower
(LAVIS/lavis/models/blip2_models/modeling_opt.py, ``blip2_opt`` model).

HF OPTModel semantics: learned positional embeddings with the +2 offset,
pre-LN decoder layers (self-attn with q/k/v/o biases, ReLU FFN fc1/fc2),
final layer norm, tied lm_head. Stacked blocks, scanned forward, prunable
linears named HF-style (``model.decoder.layers.{i}.self_attn.q_proj.weight``
etc.) so sparsity dicts line up with OPT checkpoints.
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
    "self_attn.q_proj",
    "self_attn.k_proj",
    "self_attn.v_proj",
    "self_attn.out_proj",
    "fc1",
    "fc2",
)
LOCAL_TO_PATH = {
    "self_attn.q_proj": "attn.q",
    "self_attn.k_proj": "attn.k",
    "self_attn.v_proj": "attn.v",
    "self_attn.out_proj": "attn.o",
    "fc1": "mlp.fc1",
    "fc2": "mlp.fc2",
}


@dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    d_model: int = 2560  # opt-2.7b
    num_layers: int = 32
    num_heads: int = 32
    d_ff: int = 10240
    max_position: int = 2048
    ln_eps: float = 1e-5
    pad_token_id: int = 1
    bos_token_id: int = 2
    eos_token_id: int = 2


def opt_2_7b() -> OPTConfig:
    return OPTConfig()


def opt_6_7b() -> OPTConfig:
    return OPTConfig(d_model=4096, d_ff=16384)


def tiny_config(**kw) -> OPTConfig:
    defaults = dict(vocab_size=64, d_model=32, num_layers=2, num_heads=4,
                    d_ff=64, max_position=64)
    defaults.update(kw)
    return OPTConfig(**defaults)


def init_params(cfg: OPTConfig, key: jax.Array, dtype=jnp.float32) -> PyTree:
    ks = jax.random.split(key, 10)
    d, L, F = cfg.d_model, cfg.num_layers, cfg.d_ff

    def dense(k, din, dout):
        return {
            "kernel": (jax.random.normal(k, (L, din, dout), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((L, dout), dtype),
        }

    def ln(dim):
        return {"scale": jnp.ones((L, dim), dtype), "bias": jnp.zeros((L, dim), dtype)}

    return {
        "embed_tokens": (jax.random.normal(ks[0], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        # HF OPT: positions offset by 2 (OPTLearnedPositionalEmbedding)
        "embed_positions": (jax.random.normal(ks[1], (cfg.max_position + 2, d), jnp.float32) * 0.02).astype(dtype),
        "layers": {
            "ln1": ln(d),
            "attn": {
                "q": dense(ks[2], d, d), "k": dense(ks[3], d, d),
                "v": dense(ks[4], d, d), "o": dense(ks[5], d, d),
            },
            "ln2": ln(d),
            "mlp": {"fc1": dense(ks[6], d, F), "fc2": dense(ks[7], F, d)},
        },
        "final_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        # lm_head tied to embed_tokens (OPT default)
    }


def _proj(p, x):
    return (jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
            + p["bias"]).astype(x.dtype)


def block_forward(cfg: OPTConfig, bp: PyTree, x: jax.Array, cache: Any,
                  collect: Optional[str] = None) -> Tuple[jax.Array, Dict]:
    bias = cache
    stats: Dict[str, jax.Array] = {}
    h = layer_norm(bp["ln1"], x, cfg.ln_eps)
    collect_stats(stats, "self_attn.q_proj", h, collect)
    collect_stats(stats, "self_attn.k_proj", h, collect)
    collect_stats(stats, "self_attn.v_proj", h, collect)
    q = _proj(bp["attn"]["q"], h)
    k = _proj(bp["attn"]["k"], h)
    v = _proj(bp["attn"]["v"], h)
    o = attention(q, k, v, cfg.num_heads, bias=bias)
    collect_stats(stats, "self_attn.out_proj", o, collect)
    x = x + _proj(bp["attn"]["o"], o)

    h = layer_norm(bp["ln2"], x, cfg.ln_eps)
    collect_stats(stats, "fc1", h, collect)
    h = jax.nn.relu(_proj(bp["mlp"]["fc1"], h))
    collect_stats(stats, "fc2", h, collect)
    return x + _proj(bp["mlp"]["fc2"], h), stats


def _embed(cfg: OPTConfig, params: PyTree, ids: jax.Array,
           attn_mask: Optional[jax.Array]) -> jax.Array:
    x = params["embed_tokens"][ids]
    if attn_mask is None:
        positions = jnp.arange(ids.shape[1])[None]
    else:
        positions = jnp.cumsum(attn_mask, axis=1) * attn_mask - 1
    pos = params["embed_positions"][positions + 2]
    return x + pos.astype(x.dtype)


def _cache(cfg: OPTConfig, attn_mask: Optional[jax.Array], s: int):
    causal = jnp.where(jnp.tril(jnp.ones((s, s), jnp.bool_)), 0.0, -1e9)[None, None]
    return causal if attn_mask is None else causal + mask_bias(attn_mask)


def forward(cfg: OPTConfig, params: PyTree, input_ids: jax.Array,
            attn_mask: Optional[jax.Array] = None) -> jax.Array:
    x = _embed(cfg, params, input_ids, attn_mask)
    cache = _cache(cfg, attn_mask, x.shape[1])

    def body(x, bp):
        y, _ = block_forward(cfg, bp, x, cache)
        return y, None

    x, _ = tower_scan(body, x, params["layers"])
    x = layer_norm(params["final_ln"], x, cfg.ln_eps)
    return jnp.dot(x, params["embed_tokens"].T, preferred_element_type=jnp.float32)


def per_sample_loss(cfg: OPTConfig, params: PyTree, input_ids: jax.Array,
                    attn_mask: Optional[jax.Array] = None) -> jax.Array:
    logits = forward(cfg, params, input_ids, attn_mask)
    targets = input_ids[:, 1:]
    valid = (jnp.ones_like(targets, jnp.bool_) if attn_mask is None
             else attn_mask[:, 1:] > 0)
    # lse-form CE (see llama._next_token_ce): no second (B, S, V) array
    shifted = logits[:, :-1]
    lse = jax.nn.logsumexp(shifted, axis=-1)
    picked = jnp.take_along_axis(shifted, targets[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, lse - picked, 0.0)
    return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)


def make_adapter(cfg: OPTConfig, params: PyTree):
    from ecoflap_tpu.pruning.adapter import ModelAdapter

    def prepare_inputs(p, batch):
        ids = batch["input_ids"]
        mask = batch.get("attn_mask")
        return _embed(cfg, p, ids, mask), _cache(cfg, mask, ids.shape[1])

    def _fwd(bp, x, cache, collect=None):
        return block_forward(cfg, bp, x, cache, collect)

    stack = make_stack(
        name="model.decoder.layers", num_blocks=cfg.num_layers,
        linear_names=LINEAR_NAMES, per_row_mask=True,
        prepare_inputs=prepare_inputs, block_forward=_fwd,
        blocks_path="layers", local_to_path=LOCAL_TO_PATH,
    )

    def loss_fn(p, batch):
        return per_sample_loss(cfg, p, batch["input_ids"], batch.get("attn_mask"))

    return ModelAdapter(name="opt", params=params, loss_fn=loss_fn,
                        stacks=[stack], model_prefixes={stack.name: "model"})


# ---------------------------------------------------------------------------
# generation (decoder-only with a prefix): blip2_opt.py:154-236 generate —
# the reference drives its custom OPT through HF beam search with
# query_embeds prepended to the prompt tokens.
# ---------------------------------------------------------------------------

def init_gen_cache(
    cfg: OPTConfig,
    params: PyTree,
    prefix_embeds: jax.Array,
    prefix_mask: jax.Array,
    max_new_tokens: int,
) -> PyTree:
    """Prefill: one full forward over the prefix embeddings, capturing every
    layer's K/V into slots [0, P); slots [P, P+S) are reserved for generated
    tokens. Leaves are batch-major (B leading) so beam reorder can gather
    rows (generation.beam_generate does ``leaf[gather]``).

    ``prefix_embeds`` must already include positional embeddings (the
    caller owns the position scheme — blip2_opt restarts text positions
    after the query embeds) and must EXCLUDE the last prompt token: that
    token is fed as ``tok0`` so step 0 yields the first new token's logits.
    """
    p = prefix_embeds.shape[1]
    bias = _cache(cfg, prefix_mask, p)

    def body(x, bp):
        h = layer_norm(bp["ln1"], x, cfg.ln_eps)
        q = _proj(bp["attn"]["q"], h)
        k = _proj(bp["attn"]["k"], h)
        v = _proj(bp["attn"]["v"], h)
        o = attention(q, k, v, cfg.num_heads, bias=bias)
        x = x + _proj(bp["attn"]["o"], o)
        h = layer_norm(bp["ln2"], x, cfg.ln_eps)
        x = x + _proj(bp["mlp"]["fc2"], jax.nn.relu(_proj(bp["mlp"]["fc1"], h)))
        return x, (k, v)

    _, (ks, vs) = tower_scan(body, prefix_embeds, params["layers"])
    pad = [(0, 0), (0, 0), (0, max_new_tokens), (0, 0)]
    return {
        # (L, B, P, d) -> (B, L, P+S, d)
        "k": jnp.pad(ks, pad).transpose(1, 0, 2, 3),
        "v": jnp.pad(vs, pad).transpose(1, 0, 2, 3),
        # (B, P+S) key validity of the PREFIX slots; generated slots are
        # handled positionally inside the step
        "key_mask": jnp.pad(prefix_mask.astype(jnp.int32),
                            [(0, 0), (0, max_new_tokens)]),
    }


def make_opt_step_fn(
    cfg: OPTConfig, params: PyTree, prefix_len: int, pos0: int,
    max_new_tokens: int
):
    """One-token decode step. ``prefix_len`` = prefilled slots (P);
    ``pos0`` = the POSITION ID of the token processed at step 0 (the last
    prompt token) — blip2_opt's text segment restarts at 0 after the query
    embeds, so position ids and cache slots are decoupled."""
    total = prefix_len + max_new_tokens
    ar = jnp.arange(total)

    def step_fn(tok: jax.Array, pos: jax.Array, cache: PyTree):
        x = params["embed_tokens"][tok][:, None, :]
        x = (x + params["embed_positions"][pos0 + pos + 2][None, None]
             .astype(x.dtype))
        write = prefix_len + pos
        valid = (cache["key_mask"] > 0) | (
            (ar >= prefix_len) & (ar <= write))[None]
        bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :].astype(jnp.float32)

        def layer(x, inp):
            bp, k_all, v_all = inp
            h = layer_norm(bp["ln1"], x, cfg.ln_eps)
            q = _proj(bp["attn"]["q"], h)
            k_new = _proj(bp["attn"]["k"], h).astype(k_all.dtype)
            v_new = _proj(bp["attn"]["v"], h).astype(v_all.dtype)
            k_all = jax.lax.dynamic_update_slice_in_dim(k_all, k_new, write,
                                                        axis=1)
            v_all = jax.lax.dynamic_update_slice_in_dim(v_all, v_new, write,
                                                        axis=1)
            o = attention(q, k_all, v_all, cfg.num_heads, bias=bias)
            x = x + _proj(bp["attn"]["o"], o)
            h = layer_norm(bp["ln2"], x, cfg.ln_eps)
            x = x + _proj(bp["mlp"]["fc2"],
                          jax.nn.relu(_proj(bp["mlp"]["fc1"], h)))
            return x, (k_all, v_all)

        xs = (params["layers"],
              cache["k"].swapaxes(0, 1), cache["v"].swapaxes(0, 1))
        x, (ks, vs) = jax.lax.scan(layer, x, xs)
        cache = {**cache, "k": ks.swapaxes(0, 1), "v": vs.swapaxes(0, 1)}
        x = layer_norm(params["final_ln"], x, cfg.ln_eps)
        logits = jnp.dot(x[:, 0], params["embed_tokens"].T,
                         preferred_element_type=jnp.float32)
        return logits, cache

    return step_fn


def generate_from_embeds(
    cfg: OPTConfig,
    params: PyTree,
    prefix_embeds: jax.Array,
    prefix_mask: jax.Array,
    last_tok: jax.Array,
    gen,
    use_beam: bool = True,
    pos0: Optional[int] = None,
    len_offset: int = 0,
    prompt_tokens: Optional[jax.Array] = None,
) -> jax.Array:
    """Generate from a position-embedded prefix (EXCLUDING the last prompt
    token, which is ``last_tok``). ``len_offset`` = prompt token count - 1
    (HF's min_length counts the prompt; query embeds and the length-penalty
    normalization don't).
    ``pos0`` defaults to the sequence slot of ``last_tok``."""
    from ecoflap_tpu.models.generation import (
        beam_generate,
        expand_for_beams,
        greedy_generate,
    )

    b, p = prefix_embeds.shape[0], prefix_embeds.shape[1]
    if pos0 is None:
        pos0 = p
    if use_beam and gen.num_beams > 1:
        prefix_embeds = expand_for_beams(prefix_embeds, gen.num_beams)
        prefix_mask = expand_for_beams(prefix_mask, gen.num_beams)
        last_tok = expand_for_beams(last_tok, gen.num_beams)
        if prompt_tokens is not None:
            prompt_tokens = expand_for_beams(prompt_tokens, gen.num_beams)
        cache = init_gen_cache(cfg, params, prefix_embeds, prefix_mask,
                               gen.max_new_tokens)
        step = make_opt_step_fn(cfg, params, p, pos0, gen.max_new_tokens)
        return beam_generate(step, cache, b, gen, tok0=last_tok,
                             len_offset=len_offset,
                             prompt_tokens=prompt_tokens)
    cache = init_gen_cache(cfg, params, prefix_embeds, prefix_mask,
                           gen.max_new_tokens)
    step = make_opt_step_fn(cfg, params, p, pos0, gen.max_new_tokens)
    return greedy_generate(step, cache, b, gen, tok0=last_tok,
                           len_offset=len_offset,
                           prompt_tokens=prompt_tokens)
