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

Beam search mirrors transformers' vectorized ``_beam_search`` (the scheme the
reference exercises through ``t5_model.generate``, blip2_t5.py:416-431)
step-for-step so outputs are token-identical (tests/test_generation_hf_parity.py):

* two beam sets per sample: ``num_beams`` *running* beams and ``num_beams``
  *finished* hypotheses (scores length-normalized by ``len**length_penalty``).
* per step: top ``2*num_beams`` candidates over ``num_beams*vocab``; those
  hitting a stopping criterion (EOS, or max length on the last step) are
  merged into the finished set (only candidate ranks < num_beams are
  eligible), the best ``num_beams`` non-finished continue.
* processors (repetition penalty, min-length EOS mask) apply to the
  *log-softmax* scores in beam mode and to raw logits in greedy mode,
  exactly as HF ``_beam_search`` vs ``_sample`` do.
* ``early_stopping=False`` heuristic: a batch stops accepting finished
  hypotheses once ``best_running/(cur_len**lp) <= worst_finished`` with all
  slots filled.
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
    step_fn: StepFn, cache: PyTree, batch_size: int, gen: GenerateConfig,
    tok0: Optional[jax.Array] = None, len_offset: int = 0,
    prompt_tokens: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, max_new_tokens) greedy tokens; pads after EOS (HF ``_sample``:
    processors on raw logits, finished rows keep feeding pad).

    Decoder-only prefix models (OPT/BLIP): pass ``tok0`` = the LAST prompt
    token per row (its K/V is not in the prefilled cache; step 0 processes
    it and yields the first new token's logits) and ``len_offset`` =
    prompt_len - 1, so HF's ``cur_len`` (= len_offset + pos + 1) counts the
    whole prompt. Only ``min_length`` uses it: HF's MinLengthLogitsProcessor
    compares cur_len, but the beam length normalization subtracts
    ``decoder_prompt_len`` (generation/utils.py:3087) and stays
    offset-free. T5 passes 0 (decoder_start is the +1)."""
    S = gen.max_new_tokens
    if tok0 is None:
        tok0 = jnp.full((batch_size,), gen.bos_token_id, jnp.int32)
    seqs0 = jnp.full((batch_size, S), gen.pad_token_id, jnp.int32)

    def body(carry, pos):
        tok, cache, done, seqs = carry
        logits, cache = step_fn(tok, pos, cache)
        if gen.repetition_penalty != 1.0:
            logits = _apply_repetition_penalty(
                logits, seqs, pos, gen,
                seen0=_prompt_seen(prompt_tokens, logits.shape[-1]),
            )
        logits = _mask_min_length(logits, pos + len_offset, gen)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, gen.pad_token_id, nxt)
        seqs = seqs.at[:, pos].set(nxt)
        done = done | (nxt == gen.eos_token_id)
        return (nxt, cache, done, seqs), None

    init = (tok0, cache, jnp.zeros((batch_size,), jnp.bool_), seqs0)
    (_, _, _, seqs), _ = jax.lax.scan(body, init, jnp.arange(S))
    return seqs


def _mask_min_length(logits: jax.Array, pos: jax.Array, gen: GenerateConfig):
    """pos is the index of the token being generated (0-based); HF masks EOS
    while cur_len (incl. decoder_start) < min_length."""
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
    tok0: Optional[jax.Array] = None,
    len_offset: int = 0,
    prompt_tokens: Optional[jax.Array] = None,
) -> jax.Array:
    """Token-identical port of HF transformers' vectorized ``_beam_search``
    (``early_stopping=False``, ``do_sample=False``). ``cache`` must already be
    expanded to B*num_beams rows (sample-major). Returns the best finished
    hypothesis per sample, (B, max_new_tokens), EOS included, pad after.

    ``tok0``/``len_offset``: decoder-only prefix support — see
    ``greedy_generate``. ``len_offset`` (prompt_len - 1) feeds ONLY the
    min-length EOS mask; HF's hypothesis normalization subtracts
    ``decoder_prompt_len``, so scores are normalized by generated length
    alone."""
    nb = gen.num_beams
    K = 2 * nb  # beams_to_keep: (n_eos_tokens + 1) * nb, min 2*nb
    S = gen.max_new_tokens
    flat = batch_size * nb
    neg = jnp.float32(-1.0e9)
    lp = jnp.float32(gen.length_penalty)

    if tok0 is None:
        tok0 = jnp.full((flat,), gen.bos_token_id, jnp.int32)
    # only beam 0 live at step 0 so the frontier diversifies
    run_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((nb - 1,), neg)]), (batch_size,)
    ).astype(jnp.float32).reshape(batch_size, nb)
    run_seqs = jnp.full((batch_size, nb, S), gen.pad_token_id, jnp.int32)
    fin_seqs = jnp.full((batch_size, nb, S), gen.pad_token_id, jnp.int32)
    fin_scores = jnp.full((batch_size, nb), neg)
    is_sent_finished = jnp.zeros((batch_size, nb), jnp.bool_)
    # per-batch: can the running beams still improve on the finished set?
    improving = jnp.ones((batch_size, 1), jnp.bool_)
    # rank mask: only the top-nb of the K candidates may finalize
    top_nb_mask = (jnp.arange(K) < nb)[None, :]

    def body(carry, pos):
        (tok, cache, run_scores, run_seqs, fin_seqs, fin_scores,
         is_sent_finished, improving) = carry
        logits, cache = step_fn(tok, pos, cache)
        # HF _beam_search: log_softmax FIRST, then processors on the log-probs
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if gen.repetition_penalty != 1.0:
            logp = _apply_repetition_penalty(
                logp, run_seqs.reshape(flat, S), pos, gen,
                seen0=_prompt_seen(prompt_tokens, logp.shape[-1]),
            )
        logp = _mask_min_length(logp, pos + len_offset, gen)
        vocab = logp.shape[-1]

        cand = run_scores.reshape(flat)[:, None] + logp  # (flat, V)
        cand = cand.reshape(batch_size, nb * vocab)
        topk_logp, topk_idx = jax.lax.top_k(cand, K)  # (B, K)
        src_beam = topk_idx // vocab  # (B, K) beam index within sample
        topk_tok = (topk_idx % vocab).astype(jnp.int32)
        bidx = jnp.arange(batch_size)[:, None]
        topk_seqs = run_seqs[bidx, src_beam].at[:, :, pos].set(topk_tok)

        # stopping criteria: EOS, or max length reached on the last step
        hits = (topk_tok == gen.eos_token_id) | ((pos + 1) >= S)

        # next running beams: best nb candidates not hitting a criterion
        run_cand_scores = topk_logp + hits.astype(jnp.float32) * neg
        _, next_idx = jax.lax.top_k(run_cand_scores, nb)  # (B, nb)
        run_seqs = topk_seqs[bidx, next_idx]
        run_scores = run_cand_scores[bidx, next_idx]
        src_run = src_beam[bidx, next_idx]  # (B, nb) origin beams for cache

        # finished update: length-normalized scores, rank < nb only,
        # blocked once the batch can no longer improve
        # HF normalizes by cur_len+1-decoder_prompt_len (utils.py:3087):
        # the prompt does NOT count — norm is offset-free
        norm = (pos + 1).astype(jnp.float32) ** lp
        fin_cand = topk_logp / norm
        eligible = hits & top_nb_mask
        fin_cand = fin_cand + (~eligible).astype(jnp.float32) * neg
        fin_cand = fin_cand + (~improving).astype(jnp.float32) * neg
        merged_scores = jnp.concatenate([fin_scores, fin_cand], axis=1)
        merged_seqs = jnp.concatenate([fin_seqs, topk_seqs], axis=1)
        merged_fin = jnp.concatenate([is_sent_finished, eligible], axis=1)
        fin_scores, keep = jax.lax.top_k(merged_scores, nb)
        fin_seqs = merged_seqs[bidx, keep]
        is_sent_finished = merged_fin[bidx, keep]

        # early_stopping==False heuristic (post cur_len increment):
        # best running, normalized at current length, vs worst finished
        best_running = run_scores[:, :1] / ((pos + 1).astype(jnp.float32) ** lp)
        worst_fin = jnp.where(
            is_sent_finished, jnp.min(fin_scores, axis=1, keepdims=True), neg
        )
        improving = improving & jnp.any(
            best_running > worst_fin, axis=-1, keepdims=True
        )

        gather = (jnp.arange(batch_size)[:, None] * nb + src_run).reshape(-1)
        cache = jax.tree_util.tree_map(lambda a: a[gather], cache)
        tok = run_seqs[:, :, pos].reshape(flat)
        return (tok, cache, run_scores, run_seqs, fin_seqs, fin_scores,
                is_sent_finished, improving), None

    init = (tok0, cache, run_scores, run_seqs, fin_seqs, fin_scores,
            is_sent_finished, improving)
    carry, _ = jax.lax.scan(body, init, jnp.arange(S))
    fin_seqs = carry[4]
    return fin_seqs[:, 0]  # top_k-sorted: slot 0 is the best hypothesis


def _apply_repetition_penalty(
    scores: jax.Array, seqs: jax.Array, pos: jax.Array, gen: GenerateConfig
, seen0: Optional[jax.Array] = None,
) -> jax.Array:
    """CTRL-style penalty over the full input_ids: prompt plus tokens
    generated so far (positions < pos). HF RepetitionPenaltyLogitsProcessor:
    score/penalty if positive else score*penalty.

    ``seen0`` (B, V bool) marks the PROMPT tokens for decoder-only prefix
    models (HF penalizes the full input_ids, which includes the prompt but
    never a synthetic bos); when None — the T5 path — decoder_start is the
    only prompt token and is marked via ``gen.bos_token_id``."""
    penalty = gen.repetition_penalty
    vocab = scores.shape[-1]
    valid = jnp.arange(seqs.shape[1])[None, :] < pos
    onehot = jax.nn.one_hot(seqs, vocab, dtype=jnp.bool_) & valid[..., None]
    seen = jnp.any(onehot, axis=1)
    if seen0 is None:
        seen = seen.at[:, gen.bos_token_id].set(True)  # decoder_start
    else:
        seen = seen | seen0
    penalized = jnp.where(scores < 0, scores * penalty, scores / penalty)
    return jnp.where(seen, penalized, scores)


def _prompt_seen(prompt_tokens: Optional[jax.Array], vocab: int):
    """(B, T) prompt ids -> (B, V) bool seen mask (None passthrough)."""
    if prompt_tokens is None:
        return None
    return jnp.any(jax.nn.one_hot(prompt_tokens, vocab, dtype=jnp.bool_),
                   axis=1)


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
