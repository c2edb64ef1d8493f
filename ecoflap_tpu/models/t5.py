"""FlanT5 encoder-decoder — TPU-native functional rebuild of the vendored HF
T5 (LAVIS/lavis/models/blip2_models/modeling_t5.py: ``T5ForConditionalGeneration``
:1649, blocks/attention semantics :330-700).

Faithful semantics:
* RMS layer norm (T5LayerNorm), eps 1e-6, pre-norm residual blocks.
* Attention is UNSCALED (no 1/sqrt(d) — T5 folds it into init).
* q/k/v/o have no bias; inner dim = num_heads · d_kv.
* One shared relative-attention-bias table per stack (HF stores it on
  block 0; here it lives at stack level so stacked blocks stay homogeneous —
  the checkpoint converter maps ``block.0.layer.0.SelfAttention.
  relative_attention_bias.weight`` here). Bucketing: bidirectional for the
  encoder, causal for the decoder; cross-attention has zero bias.
* FlanT5 gated FFN (DenseGatedActDense): ``wo(act(wi_0(x)) * wi_1(x))`` with
  exact gelu (blip2_t5.py:88-89 overrides dense_act_fn="gelu").
* flan-t5 does NOT tie embeddings: separate lm_head, no d_model^-0.5 rescale.
* CE loss ignores -100 labels (pad masking, blip2_t5.py:152-154).

Sparsity-dict naming matches the reference exactly:
``{prefix}.encoder.block.{i}.layer.0.SelfAttention.q.weight`` etc.
(wanda_pruner.py:275); per-row masking (T5 path, :272-277).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models.adapters import make_stack
from ecoflap_tpu.models.layers import collect_stats, mask_bias, rms_norm, tower_scan

PyTree = Any

ENCODER_LINEARS = (
    "layer.0.SelfAttention.q",
    "layer.0.SelfAttention.k",
    "layer.0.SelfAttention.v",
    "layer.0.SelfAttention.o",
    "layer.1.DenseReluDense.wi_0",
    "layer.1.DenseReluDense.wi_1",
    "layer.1.DenseReluDense.wo",
)
DECODER_LINEARS = (
    "layer.0.SelfAttention.q",
    "layer.0.SelfAttention.k",
    "layer.0.SelfAttention.v",
    "layer.0.SelfAttention.o",
    "layer.1.EncDecAttention.q",
    "layer.1.EncDecAttention.k",
    "layer.1.EncDecAttention.v",
    "layer.1.EncDecAttention.o",
    "layer.2.DenseReluDense.wi_0",
    "layer.2.DenseReluDense.wi_1",
    "layer.2.DenseReluDense.wo",
)
ENCODER_LOCAL_TO_PATH = {
    "layer.0.SelfAttention.q": "attn.q",
    "layer.0.SelfAttention.k": "attn.k",
    "layer.0.SelfAttention.v": "attn.v",
    "layer.0.SelfAttention.o": "attn.o",
    "layer.1.DenseReluDense.wi_0": "mlp.wi_0",
    "layer.1.DenseReluDense.wi_1": "mlp.wi_1",
    "layer.1.DenseReluDense.wo": "mlp.wo",
}
DECODER_LOCAL_TO_PATH = {
    "layer.0.SelfAttention.q": "self_attn.q",
    "layer.0.SelfAttention.k": "self_attn.k",
    "layer.0.SelfAttention.v": "self_attn.v",
    "layer.0.SelfAttention.o": "self_attn.o",
    "layer.1.EncDecAttention.q": "cross_attn.q",
    "layer.1.EncDecAttention.k": "cross_attn.k",
    "layer.1.EncDecAttention.v": "cross_attn.v",
    "layer.1.EncDecAttention.o": "cross_attn.o",
    "layer.2.DenseReluDense.wi_0": "mlp.wi_0",
    "layer.2.DenseReluDense.wi_1": "mlp.wi_1",
    "layer.2.DenseReluDense.wo": "mlp.wo",
}


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 2048
    d_kv: int = 64
    d_ff: int = 5120
    num_layers: int = 24
    num_decoder_layers: int = 24
    num_heads: int = 32
    rel_buckets: int = 32
    rel_max_distance: int = 128
    ln_eps: float = 1e-6
    pad_token_id: int = 0
    decoder_start_token_id: int = 0
    eos_token_id: int = 1

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def flan_t5_xl() -> T5Config:
    return T5Config()


def flan_t5_xxl() -> T5Config:
    return T5Config(d_model=4096, d_ff=10240, num_heads=64)


def flan_t5_base() -> T5Config:
    """flan-t5-base dims — the '--model_scale small' T5."""
    return T5Config(d_model=768, d_ff=2048, num_layers=12,
                    num_decoder_layers=12, num_heads=12)


def tiny_config(**kw) -> T5Config:
    defaults = dict(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, rel_buckets=8, rel_max_distance=16,
    )
    defaults.update(kw)
    return T5Config(**defaults)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _attn_params(key, L, d_model, inner, dtype):
    ks = jax.random.split(key, 4)

    def f(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    # HF T5 init factors (modeling_t5 _init_weights): q ~ (d·d_kv)^-0.5 etc.
    return {
        "q": {"kernel": f(ks[0], (L, d_model, inner), (d_model * inner) ** -0.5)},
        "k": {"kernel": f(ks[1], (L, d_model, inner), d_model**-0.5)},
        "v": {"kernel": f(ks[2], (L, d_model, inner), d_model**-0.5)},
        "o": {"kernel": f(ks[3], (L, inner, d_model), inner**-0.5)},
    }


def _mlp_params(key, L, d_model, d_ff, dtype):
    ks = jax.random.split(key, 3)

    def f(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    return {
        "wi_0": {"kernel": f(ks[0], (L, d_model, d_ff), d_model**-0.5)},
        "wi_1": {"kernel": f(ks[1], (L, d_model, d_ff), d_model**-0.5)},
        "wo": {"kernel": f(ks[2], (L, d_ff, d_model), d_ff**-0.5)},
    }


def _ln(L, d, dtype):
    return {"scale": jnp.ones((L, d), dtype)}


def init_params(cfg: T5Config, key: jax.Array, dtype=jnp.float32) -> PyTree:
    ks = jax.random.split(key, 9)
    d, Le, Ld = cfg.d_model, cfg.num_layers, cfg.num_decoder_layers
    return {
        "shared": (jax.random.normal(ks[0], (cfg.vocab_size, d), jnp.float32)).astype(dtype),
        "encoder": {
            "rel_bias": (jax.random.normal(ks[1], (cfg.rel_buckets, cfg.num_heads), jnp.float32) * 0.1).astype(dtype),
            "blocks": {
                "ln0": _ln(Le, d, dtype),
                "attn": _attn_params(ks[2], Le, d, cfg.inner_dim, dtype),
                "ln1": _ln(Le, d, dtype),
                "mlp": _mlp_params(ks[3], Le, d, cfg.d_ff, dtype),
            },
            "final_ln": {"scale": jnp.ones((d,), dtype)},
        },
        "decoder": {
            "rel_bias": (jax.random.normal(ks[4], (cfg.rel_buckets, cfg.num_heads), jnp.float32) * 0.1).astype(dtype),
            "blocks": {
                "ln0": _ln(Ld, d, dtype),
                "self_attn": _attn_params(ks[5], Ld, d, cfg.inner_dim, dtype),
                "ln1": _ln(Ld, d, dtype),
                "cross_attn": _attn_params(ks[6], Ld, d, cfg.inner_dim, dtype),
                "ln2": _ln(Ld, d, dtype),
                "mlp": _mlp_params(ks[7], Ld, d, cfg.d_ff, dtype),
            },
            "final_ln": {"scale": jnp.ones((d,), dtype)},
        },
        # own key: flan-t5 is untied (module docstring) — reusing shared's
        # key made lm_head the identical random stream reshaped
        "lm_head": {"kernel": (jax.random.normal(ks[8], (d, cfg.vocab_size), jnp.float32) * d**-0.5).astype(dtype)},
    }


# ---------------------------------------------------------------------------
# relative position bias (modeling_t5.py T5Attention._relative_position_bucket)
# ---------------------------------------------------------------------------

def relative_position_bucket(
    relative_position: jax.Array,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    rp = relative_position
    bucket = jnp.zeros_like(rp)
    if bidirectional:
        num_buckets //= 2
        bucket = bucket + (rp > 0).astype(jnp.int32) * num_buckets
        rp = jnp.abs(rp)
    else:
        rp = -jnp.minimum(rp, 0)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return bucket + jnp.where(is_small, rp, large)


def position_bias(
    cfg: T5Config, table: jax.Array, q_len: int, k_len: int, bidirectional: bool
) -> jax.Array:
    """(1, H, q_len, k_len) additive bias from a (buckets, H) table."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, bidirectional, cfg.rel_buckets, cfg.rel_max_distance
    )
    bias = table[buckets]  # (q, k, H)
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


# ---------------------------------------------------------------------------
# attention / block forward
# ---------------------------------------------------------------------------

def _heads(x: jax.Array, n: int) -> jax.Array:
    b, s, _ = x.shape
    return x.reshape(b, s, n, -1).transpose(0, 2, 1, 3)


def t5_attention(
    cfg: T5Config,
    ap: PyTree,
    x: jax.Array,
    kv: jax.Array,
    bias: jax.Array,
    stats: Dict[str, jax.Array],
    prefix: str,
    collect: Optional[str],
) -> jax.Array:
    """Unscaled T5 attention with separate q/k/v/o projections, each hooked
    for calibration stats under ``{prefix}.{q|k|v|o}`` stat keys."""
    collect_stats(stats, f"{prefix}.q", x, collect)
    collect_stats(stats, f"{prefix}.k", kv, collect)
    collect_stats(stats, f"{prefix}.v", kv, collect)
    q = jnp.dot(x, ap["q"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.dot(kv, ap["k"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.dot(kv, ap["v"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    qh, kh, vh = _heads(q, cfg.num_heads), _heads(k, cfg.num_heads), _heads(v, cfg.num_heads)
    # scores accumulate in the activation dtype (bf16 scores for bf16
    # activations — matches the reference's autocast matmuls)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=x.dtype)
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
    b, h, s, dh = o.shape
    o = o.transpose(0, 2, 1, 3).reshape(b, s, h * dh).astype(x.dtype)
    collect_stats(stats, f"{prefix}.o", o, collect)
    return jnp.dot(o, ap["o"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)


def t5_mlp(
    cfg: T5Config,
    mp: PyTree,
    x: jax.Array,
    stats: Dict[str, jax.Array],
    prefix: str,
    collect: Optional[str],
) -> jax.Array:
    """Gated-gelu FFN: wo(gelu(wi_0 x) * (wi_1 x))."""
    collect_stats(stats, f"{prefix}.wi_0", x, collect)
    collect_stats(stats, f"{prefix}.wi_1", x, collect)
    g = jnp.dot(x, mp["wi_0"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    u = jnp.dot(x, mp["wi_1"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    h = jax.nn.gelu(g, approximate=False) * u
    collect_stats(stats, f"{prefix}.wo", h, collect)
    return jnp.dot(h, mp["wo"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)


def encoder_block_forward(
    cfg: T5Config,
    bp: PyTree,
    x: jax.Array,
    cache: Any,
    collect: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """cache = self-attention bias (pos bias + pad mask), shared by all blocks
    — the reference's kwargs cache (wanda_pruner.py:179-199)."""
    stats: Dict[str, jax.Array] = {}
    h = rms_norm(bp["ln0"], x, cfg.ln_eps)
    x = x + t5_attention(cfg, bp["attn"], h, h, cache, stats,
                         "layer.0.SelfAttention", collect)
    h = rms_norm(bp["ln1"], x, cfg.ln_eps)
    x = x + t5_mlp(cfg, bp["mlp"], h, stats, "layer.1.DenseReluDense", collect)
    return x, stats


def decoder_block_forward(
    cfg: T5Config,
    bp: PyTree,
    x: jax.Array,
    cache: Any,
    collect: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """cache = (self_bias, cross_bias, encoder_hidden_states)."""
    self_bias, cross_bias, enc = cache
    stats: Dict[str, jax.Array] = {}
    h = rms_norm(bp["ln0"], x, cfg.ln_eps)
    x = x + t5_attention(cfg, bp["self_attn"], h, h, self_bias, stats,
                         "layer.0.SelfAttention", collect)
    h = rms_norm(bp["ln1"], x, cfg.ln_eps)
    x = x + t5_attention(cfg, bp["cross_attn"], h, enc.astype(h.dtype), cross_bias,
                         stats, "layer.1.EncDecAttention", collect)
    h = rms_norm(bp["ln2"], x, cfg.ln_eps)
    x = x + t5_mlp(cfg, bp["mlp"], h, stats, "layer.2.DenseReluDense", collect)
    return x, stats


# ---------------------------------------------------------------------------
# full forwards
# ---------------------------------------------------------------------------

def _scan_blocks(block_fn, blocks: PyTree, x: jax.Array, cache: Any) -> jax.Array:
    def body(x, bp):
        y, _ = block_fn(bp, x, cache)
        return y, None

    x, _ = tower_scan(body, x, blocks)
    return x


def encoder_bias(cfg: T5Config, params: PyTree, attn_mask: jax.Array, q_len: int) -> jax.Array:
    pb = position_bias(cfg, params["encoder"]["rel_bias"], q_len, q_len, True)
    return pb + mask_bias(attn_mask)


def encode_embeds(
    cfg: T5Config, params: PyTree, x: jax.Array, attn_mask: jax.Array
) -> jax.Array:
    """Encoder over pre-built input embeddings — the BLIP-2 path, which
    concatenates projected query tokens with text embeddings
    (blip2_t5.py:157-166)."""
    bias = encoder_bias(cfg, params, attn_mask, x.shape[1])
    x = _scan_blocks(
        lambda bp, h, c: encoder_block_forward(cfg, bp, h, c),
        params["encoder"]["blocks"], x, bias,
    )
    return rms_norm(params["encoder"]["final_ln"], x, cfg.ln_eps)


def encode(cfg: T5Config, params: PyTree, input_ids: jax.Array,
           attn_mask: jax.Array) -> jax.Array:
    x = params["shared"][input_ids]
    return encode_embeds(cfg, params, x, attn_mask)


def decoder_biases(
    cfg: T5Config, params: PyTree, dec_mask: jax.Array, enc_mask: jax.Array,
    q_len: int,
) -> Tuple[jax.Array, jax.Array]:
    pb = position_bias(cfg, params["decoder"]["rel_bias"], q_len, q_len, False)
    causal = jnp.where(
        jnp.tril(jnp.ones((q_len, q_len), jnp.bool_)), 0.0, -1e9
    )[None, None]
    self_bias = pb + causal + mask_bias(dec_mask)
    cross_bias = mask_bias(enc_mask)
    return self_bias, cross_bias


def decode(
    cfg: T5Config,
    params: PyTree,
    enc_out: jax.Array,
    enc_mask: jax.Array,
    decoder_input_ids: jax.Array,
    decoder_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Teacher-forced decoder -> (B, S, V) logits."""
    if decoder_mask is None:
        decoder_mask = jnp.ones_like(decoder_input_ids)
    x = params["shared"][decoder_input_ids]
    self_bias, cross_bias = decoder_biases(
        cfg, params, decoder_mask, enc_mask, x.shape[1]
    )
    x = _scan_blocks(
        lambda bp, h, c: decoder_block_forward(cfg, bp, h, c),
        params["decoder"]["blocks"], x, (self_bias, cross_bias, enc_out),
    )
    x = rms_norm(params["decoder"]["final_ln"], x, cfg.ln_eps)
    return jnp.dot(
        x, params["lm_head"]["kernel"], preferred_element_type=jnp.float32
    )


def shift_right(cfg: T5Config, labels: jax.Array) -> jax.Array:
    """HF ``_shift_right``: prepend decoder_start, drop last, and replace any
    -100 with pad so embedding lookups stay in-vocab."""
    shifted = jnp.concatenate(
        [jnp.full_like(labels[:, :1], cfg.decoder_start_token_id), labels[:, :-1]],
        axis=1,
    )
    return jnp.where(shifted == -100, cfg.pad_token_id, shifted)


def per_sample_loss(
    cfg: T5Config,
    params: PyTree,
    input_ids: jax.Array,
    attn_mask: jax.Array,
    labels: jax.Array,
    decoder_mask: Optional[jax.Array] = None,
    enc_embeds: Optional[jax.Array] = None,
) -> jax.Array:
    """(B,) per-sample token-mean CE with -100 ignored.

    NB the reference computes one token-weighted mean over the whole batch
    (HF CrossEntropyLoss); the per-sample mean here averages samples equally.
    They coincide when sample token counts match (fixed-length calibration) —
    the calibration pipelines pad to fixed length, so MeZO scores agree.
    """
    if enc_embeds is not None:
        enc_out = encode_embeds(cfg, params, enc_embeds, attn_mask)
    else:
        enc_out = encode(cfg, params, input_ids, attn_mask)
    return loss_from_enc(cfg, params, enc_out, attn_mask, labels, decoder_mask)


def ce_per_sample(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """(B, S, V) logits + (B, S) labels (-100 ignored) -> (B,) token-mean CE."""
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    # lse-form (== -log_softmax gather) avoids materializing a second
    # (B, S, V) array next to the logits (see llama._next_token_ce)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, lse - picked, 0.0)
    return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)


def loss_from_enc(
    cfg: T5Config,
    params: PyTree,
    enc_out: jax.Array,
    enc_mask: jax.Array,
    labels: jax.Array,
    decoder_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """per_sample_loss from a precomputed encoder output — the suffix-plan
    entry point for encoder-block perturbations (pruning/plans.py)."""
    dec_in = shift_right(cfg, labels)
    logits = decode(cfg, params, enc_out, enc_mask, dec_in, decoder_mask)
    return ce_per_sample(logits, labels)


def loss_from_dec_hidden(
    cfg: T5Config, params: PyTree, x: jax.Array, labels: jax.Array
) -> jax.Array:
    """per_sample_loss from the decoder stack's output hidden states (before
    the final RMSNorm) — the suffix-plan entry point for decoder blocks."""
    x = rms_norm(params["decoder"]["final_ln"], x, cfg.ln_eps)
    logits = jnp.dot(
        x, params["lm_head"]["kernel"], preferred_element_type=jnp.float32
    )
    return ce_per_sample(logits, labels)


# ---------------------------------------------------------------------------
# pruning stacks (T5LayerWandaPruner walk order, wanda_pruner.py:853-871)
# ---------------------------------------------------------------------------

def make_encoder_stack(cfg: T5Config, prefix: str = "t5_model",
                       batch_keys: Optional[Dict[str, str]] = None):
    bk = {"input_ids": "input_ids", "attn_mask": "attn_mask"}
    bk.update(batch_keys or {})

    def prepare_inputs(params, batch):
        sub = params[prefix] if prefix in params else params
        x = sub["shared"][batch[bk["input_ids"]]]
        bias = encoder_bias(cfg, sub, batch[bk["attn_mask"]], x.shape[1])
        return x, bias

    def _fwd(bp, x, cache, collect=None):
        return encoder_block_forward(cfg, bp, x, cache, collect)

    root = f"{prefix}." if prefix else ""
    return make_stack(
        name=f"{prefix}.encoder.block" if prefix else "encoder.block",
        num_blocks=cfg.num_layers,
        linear_names=ENCODER_LINEARS,
        per_row_mask=True,
        prepare_inputs=prepare_inputs,
        block_forward=_fwd,
        blocks_path=f"{root}encoder.blocks",
        local_to_path=ENCODER_LOCAL_TO_PATH,
    )


def make_decoder_stack(cfg: T5Config, prefix: str = "t5_model",
                       batch_keys: Optional[Dict[str, str]] = None):
    bk = {"input_ids": "input_ids", "attn_mask": "attn_mask", "labels": "labels"}
    bk.update(batch_keys or {})

    def prepare_inputs(params, batch):
        sub = params[prefix] if prefix in params else params
        enc_out = encode(cfg, sub, batch[bk["input_ids"]], batch[bk["attn_mask"]])
        labels = batch[bk["labels"]]
        dec_in = shift_right(cfg, labels)
        # all-ones, matching the loss path (decode's decoder_mask=None) and
        # HF's decoder_attention_mask=None: a (labels != -100) key mask is
        # misaligned with shift_right(labels) by one and diverges from the
        # activations the reference's hooks capture
        dec_mask = jnp.ones_like(dec_in)
        x = sub["shared"][dec_in]
        self_bias, cross_bias = decoder_biases(
            cfg, sub, dec_mask, batch[bk["attn_mask"]], x.shape[1]
        )
        return x, (self_bias, cross_bias, enc_out)

    def _fwd(bp, x, cache, collect=None):
        return decoder_block_forward(cfg, bp, x, cache, collect)

    root = f"{prefix}." if prefix else ""
    return make_stack(
        name=f"{prefix}.decoder.block" if prefix else "decoder.block",
        num_blocks=cfg.num_decoder_layers,
        linear_names=DECODER_LINEARS,
        per_row_mask=True,
        prepare_inputs=prepare_inputs,
        block_forward=_fwd,
        blocks_path=f"{root}decoder.blocks",
        local_to_path=DECODER_LOCAL_TO_PATH,
    )


def make_adapter(cfg: T5Config, params: PyTree, prefix: str = ""):
    """Standalone-T5 adapter (``t5`` model, lavis/models/t5_models/t5.py):
    prefix-LM calibration loss over C4-style (input_ids, labels) batches."""
    from ecoflap_tpu.pruning.adapter import ModelAdapter

    enc = make_encoder_stack(cfg, prefix)
    dec = make_decoder_stack(cfg, prefix)

    def loss_fn(p, batch):
        sub = p[prefix] if prefix and prefix in p else p
        return per_sample_loss(
            cfg, sub, batch["input_ids"], batch["attn_mask"], batch["labels"]
        )

    root = prefix or "t5"
    return ModelAdapter(
        name="t5", params=params, loss_fn=loss_fn, stacks=[enc, dec],
        model_prefixes={enc.name: root, dec.name: root},
    )
