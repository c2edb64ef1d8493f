"""Autoregressive generation under jit — greedy and beam search.

The reference leans on HF's imperative ``generate`` (blip2_t5.py:416-431:
num_beams=5, min_length=1, length_penalty -1 for VQA / 1.0 for captions).
Under XLA everything must be static-shape: decoding runs as a ``lax.scan``
over ``max_new_tokens`` steps against a pre-allocated KV cache, and beam
search keeps a fixed (B, num_beams) frontier with HF's scoring rules:

* ``min_length``: EOS logit masked to -inf while cur_len < min_length.
* finished beams are frozen (only pad appended, score kept).
* final ranking by ``sum_logprobs / (length ** length_penalty)`` — HF
  ``BeamHypotheses.add``; length counts generated tokens incl. EOS.
* ``repetition_penalty``: CTRL-style divide-if-positive/multiply-if-negative
  over previously generated tokens.

The model plugs in as a ``step_fn(tokens, pos, cache) -> (logits, cache)``
closure; T5's lives in this module (cached cross-attention K/V computed once
per sequence), LLaMA's in models/llama.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models import t5 as t5_mod
from ecoflap_tpu.models.layers import mask_bias, rms_norm

PyTree = Any
StepFn = Callable[[jax.Array, jax.Array, PyTree], Tuple[jax.Array, PyTree]]


@dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 30
    num_beams: int = 5
    min_length: int = 1
    length_penalty: float = 1.0
    repetition_penalty: float = 1.0
    eos_token_id: int = 1
    pad_token_id: int = 0
    bos_token_id: int = 0  # decoder_start for T5


# ---------------------------------------------------------------------------
# greedy
# ---------------------------------------------------------------------------

def greedy_generate(
    step_fn: StepFn, cache: PyTree, batch_size: int, gen: GenerateConfig
) -> jax.Array:
    """(B, max_new_tokens) greedy tokens; pads after EOS."""
    tok0 = jnp.full((batch_size,), gen.bos_token_id, jnp.int32)

    def body(carry, pos):
        tok, cache, done = carry
        logits, cache = step_fn(tok, pos, cache)
        logits = _mask_min_length(logits, pos, gen)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, gen.pad_token_id, nxt)
        done = done | (nxt == gen.eos_token_id)
        return (nxt, cache, done), nxt

    init = (tok0, cache, jnp.zeros((batch_size,), jnp.bool_))
    _, toks = jax.lax.scan(body, init, jnp.arange(gen.max_new_tokens))
    return toks.T  # (B, S)


def _mask_min_length(logits: jax.Array, pos: jax.Array, gen: GenerateConfig):
    """pos is the index of the token being generated (0-based); HF masks EOS
    while cur_len < min_length."""
    block_eos = (pos + 1) < gen.min_length
    return jnp.where(
        block_eos,
        logits.at[:, gen.eos_token_id].set(-jnp.inf),
        logits,
    )


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

def beam_generate(
    step_fn: StepFn,
    cache: PyTree,
    batch_size: int,
    gen: GenerateConfig,
) -> jax.Array:
    """HF-style beam search; ``cache`` must already be expanded to
    B·num_beams rows (row-major: sample-major then beam). Returns the best
    hypothesis per sample, (B, max_new_tokens), padded after EOS."""
    nb = gen.num_beams
    flat = batch_size * nb
    neg = jnp.float32(-1e9)

    tok0 = jnp.full((flat,), gen.bos_token_id, jnp.int32)
    # first step: only beam 0 live, others -inf so the frontier diversifies
    beam_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((nb - 1,), neg)]), (batch_size,)
    ).astype(jnp.float32)
    seqs = jnp.full((flat, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    done = jnp.zeros((flat,), jnp.bool_)
    lengths = jnp.zeros((flat,), jnp.int32)

    def body(carry, pos):
        tok, cache, beam_scores, seqs, done, lengths = carry
        logits, cache = step_fn(tok, pos, cache)
        logits = _mask_min_length(logits, pos, gen)
        if gen.repetition_penalty != 1.0:
            logits = _apply_repetition_penalty(
                logits, seqs, pos, gen.repetition_penalty
            )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]

        # finished beams: freeze score; only pad continues
        cont = jnp.where(done[:, None], neg, logp)
        pad_only = jnp.full((flat, vocab), neg).at[:, gen.pad_token_id].set(0.0)
        logp_eff = jnp.where(done[:, None], pad_only, cont)

        cand = beam_scores[:, None] + logp_eff  # (flat, V)
        cand = cand.reshape(batch_size, nb * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, nb)  # (B, nb)
        src_beam = top_idx // vocab  # (B, nb) index within sample
        new_tok = (top_idx % vocab).astype(jnp.int32)

        gather = (jnp.arange(batch_size)[:, None] * nb + src_beam).reshape(-1)
        cache = jax.tree_util.tree_map(lambda a: a[gather], cache)
        seqs = seqs[gather]
        done_g = done[gather]
        lengths_g = lengths[gather]

        new_tok = new_tok.reshape(-1)
        new_tok = jnp.where(done_g, gen.pad_token_id, new_tok)
        seqs = seqs.at[:, pos].set(new_tok)
        newly_done = (new_tok == gen.eos_token_id) & ~done_g
        lengths = jnp.where(done_g, lengths_g, pos + 1)
        done = done_g | newly_done
        beam_scores = top_scores.reshape(-1)
        return (new_tok, cache, beam_scores, seqs, done, lengths), None

    init = (tok0, cache, beam_scores, seqs, done, lengths)
    (tok, cache, beam_scores, seqs, done, lengths), _ = jax.lax.scan(
        body, init, jnp.arange(gen.max_new_tokens)
    )

    lengths = jnp.where(done, lengths, gen.max_new_tokens)
    norm = lengths.astype(jnp.float32) ** gen.length_penalty
    final = beam_scores / norm
    final = final.reshape(batch_size, nb)
    best = jnp.argmax(final, axis=-1)
    seqs = seqs.reshape(batch_size, nb, -1)
    return seqs[jnp.arange(batch_size), best]


def _apply_repetition_penalty(
    logits: jax.Array, seqs: jax.Array, pos: jax.Array, penalty: float
) -> jax.Array:
    """CTRL-style penalty over tokens generated so far (positions < pos)."""
    vocab = logits.shape[-1]
    valid = jnp.arange(seqs.shape[1])[None, :] < pos
    onehot = jax.nn.one_hot(seqs, vocab, dtype=jnp.bool_) & valid[..., None]
    seen = jnp.any(onehot, axis=1)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def expand_for_beams(tree: PyTree, num_beams: int) -> PyTree:
    """Repeat every leaf's batch row num_beams times (sample-major)."""
    return jax.tree_util.tree_map(
        lambda a: jnp.repeat(a, num_beams, axis=0), tree
    )


# ---------------------------------------------------------------------------
# T5 cached decoding
# ---------------------------------------------------------------------------

def t5_init_cache(
    cfg: t5_mod.T5Config,
    params: PyTree,
    enc_out: jax.Array,
    enc_mask: jax.Array,
    max_new_tokens: int,
    dtype=jnp.float32,
) -> PyTree:
    """Precompute per-layer cross K/V (one matmul per layer per sequence —
    the decode loop never touches the encoder again) and allocate self K/V."""
    L = cfg.num_decoder_layers
    B = enc_out.shape[0]
    blocks = params["decoder"]["blocks"]

    def cross_kv(ap, enc):
        k = jnp.dot(enc, ap["k"]["kernel"], preferred_element_type=jnp.float32)
        v = jnp.dot(enc, ap["v"]["kernel"], preferred_element_type=jnp.float32)
        return k.astype(dtype), v.astype(dtype)

    ck, cv = jax.vmap(cross_kv, in_axes=(0, None))(blocks["cross_attn"], enc_out)
    # (L, B, Senc, inner) -> batch-major (B, L, Senc, inner) so beam gather
    # (leaf[gather] over axis 0) works uniformly
    return {
        "self_k": jnp.zeros((B, L, max_new_tokens, cfg.inner_dim), dtype),
        "self_v": jnp.zeros((B, L, max_new_tokens, cfg.inner_dim), dtype),
        "cross_k": ck.transpose(1, 0, 2, 3),
        "cross_v": cv.transpose(1, 0, 2, 3),
        "cross_bias": mask_bias(enc_mask),  # (B, 1, 1, Senc)
    }


def make_t5_step_fn(
    cfg: t5_mod.T5Config, params: PyTree, max_new_tokens: int
) -> StepFn:
    """Single-token decoder step over the KV cache. The self-attention
    rel-pos bias row is precomputed for all (pos, key) pairs."""
    blocks = params["decoder"]["blocks"]
    # (1, H, S, S) full causal rel-pos bias table, row-sliced per step
    full_bias = t5_mod.position_bias(
        cfg, params["decoder"]["rel_bias"], max_new_tokens, max_new_tokens, False
    )[0]  # (H, S, S)

    def step_fn(tok: jax.Array, pos: jax.Array, cache: PyTree):
        x = params["shared"][tok][:, None, :]  # (B, 1, D)
        bias_row = jax.lax.dynamic_slice_in_dim(full_bias, pos, 1, axis=1)  # (H,1,S)
        key_valid = (jnp.arange(max_new_tokens) <= pos)[None, None, None, :]
        self_bias = jnp.where(key_valid, bias_row[None], -1e9)  # (1,H,1,S)

        def layer(x, inp):
            bp, sk, sv, ck, cv = inp
            h = rms_norm(bp["ln0"], x, cfg.ln_eps)
            q = jnp.dot(h, bp["self_attn"]["q"]["kernel"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
            k_new = jnp.dot(h, bp["self_attn"]["k"]["kernel"],
                            preferred_element_type=jnp.float32).astype(sk.dtype)
            v_new = jnp.dot(h, bp["self_attn"]["v"]["kernel"],
                            preferred_element_type=jnp.float32).astype(sv.dtype)
            sk = jax.lax.dynamic_update_slice_in_dim(sk, k_new, pos, axis=1)
            sv = jax.lax.dynamic_update_slice_in_dim(sv, v_new, pos, axis=1)
            o = _cached_attention(cfg, q, sk, sv, self_bias)
            x = x + jnp.dot(o, bp["self_attn"]["o"]["kernel"],
                            preferred_element_type=jnp.float32).astype(x.dtype)

            h = rms_norm(bp["ln1"], x, cfg.ln_eps)
            q = jnp.dot(h, bp["cross_attn"]["q"]["kernel"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
            o = _cached_attention(cfg, q, ck, cv, cache["cross_bias"])
            x = x + jnp.dot(o, bp["cross_attn"]["o"]["kernel"],
                            preferred_element_type=jnp.float32).astype(x.dtype)

            h = rms_norm(bp["ln2"], x, cfg.ln_eps)
            g = jnp.dot(h, bp["mlp"]["wi_0"]["kernel"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
            u = jnp.dot(h, bp["mlp"]["wi_1"]["kernel"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
            hh = jax.nn.gelu(g, approximate=False) * u
            x = x + jnp.dot(hh, bp["mlp"]["wo"]["kernel"],
                            preferred_element_type=jnp.float32).astype(x.dtype)
            return x, (sk, sv)

        # scan over layers: xs leaves have layer axis 0 (cache is batch-major,
        # so swap to layer-major for the scan)
        xs = (
            blocks,
            cache["self_k"].swapaxes(0, 1),
            cache["self_v"].swapaxes(0, 1),
            cache["cross_k"].swapaxes(0, 1),
            cache["cross_v"].swapaxes(0, 1),
        )
        x, (sk, sv) = jax.lax.scan(layer, x, xs)
        cache = {
            **cache,
            "self_k": sk.swapaxes(0, 1),
            "self_v": sv.swapaxes(0, 1),
        }
        x = rms_norm(params["decoder"]["final_ln"], x, cfg.ln_eps)
        logits = jnp.dot(
            x[:, 0], params["lm_head"]["kernel"], preferred_element_type=jnp.float32
        )
        return logits, cache

    return step_fn


def _cached_attention(cfg, q, k, v, bias):
    """q: (B, 1, inner); k/v: (B, S, inner); bias broadcast (.., 1, S)."""
    b = q.shape[0]
    h, dh = cfg.num_heads, cfg.d_kv
    qh = q.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).reshape(b, 1, h * dh).astype(q.dtype)


@functools.partial(
    jax.jit, static_argnames=("cfg", "gen", "use_beam")
)
def t5_generate(
    cfg: t5_mod.T5Config,
    params: PyTree,
    enc_out: jax.Array,
    enc_mask: jax.Array,
    gen: GenerateConfig,
    use_beam: bool = True,
) -> jax.Array:
    """End-to-end jitted T5 generation from encoder outputs."""
    b = enc_out.shape[0]
    gen = GenerateConfig(**{**gen.__dict__, "bos_token_id": cfg.decoder_start_token_id,
                            "eos_token_id": cfg.eos_token_id,
                            "pad_token_id": cfg.pad_token_id})
    if use_beam and gen.num_beams > 1:
        enc_out_b = jnp.repeat(enc_out, gen.num_beams, axis=0)
        enc_mask_b = jnp.repeat(enc_mask, gen.num_beams, axis=0)
        cache = t5_init_cache(
            cfg, params, enc_out_b, enc_mask_b, gen.max_new_tokens, enc_out.dtype
        )
        step = make_t5_step_fn(cfg, params, gen.max_new_tokens)
        return beam_generate(step, cache, b, gen)
    cache = t5_init_cache(cfg, params, enc_out, enc_mask, gen.max_new_tokens,
                          enc_out.dtype)
    step = make_t5_step_fn(cfg, params, gen.max_new_tokens)
    return greedy_generate(step, cache, b, gen)
