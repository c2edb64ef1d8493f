"""LLaMA decoder-only LM — the rebuilt ``LLaMA/`` subproject path.

The reference's pruning library (`LLaMA/lib/`) is missing from the snapshot
(SURVEY.md §2.2); behavior is reconstructed from ``LLaMA/main.py:8-9,27,40-90``
(HF ``AutoModelForCausalLM``, seqlen 2048, C4 calibration, WikiText-2 ppl) and
the wanda-paper semantics shared with the LAVIS twins.

Architecture (HF LlamaModel): RMSNorm pre-norm, rotary position embeddings,
SwiGLU MLP (``down(silu(gate x) * (up x))``), separate q/k/v/o projections,
no biases. Sparsity keys follow HF naming:
``model.layers.{i}.self_attn.q_proj.weight`` etc.; per-row Wanda masks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models.adapters import make_stack
from ecoflap_tpu.models.layers import collect_stats, mask_bias, rms_norm, tower_scan
from ecoflap_tpu.ops.attention import mha

PyTree = Any

LINEAR_NAMES = (
    "self_attn.q_proj",
    "self_attn.k_proj",
    "self_attn.v_proj",
    "self_attn.o_proj",
    "mlp.gate_proj",
    "mlp.up_proj",
    "mlp.down_proj",
)
LOCAL_TO_PATH = {
    "self_attn.q_proj": "attn.q",
    "self_attn.k_proj": "attn.k",
    "self_attn.v_proj": "attn.v",
    "self_attn.o_proj": "attn.o",
    "mlp.gate_proj": "mlp.gate",
    "mlp.up_proj": "mlp.up",
    "mlp.down_proj": "mlp.down",
}


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    d_model: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    d_ff: int = 11008
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    max_seq_len: int = 2048

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def llama_7b() -> LlamaConfig:
    return LlamaConfig()


def llama_13b() -> LlamaConfig:
    return LlamaConfig(d_model=5120, num_layers=40, num_heads=40,
                       num_kv_heads=40, d_ff=13824)


def open_llama_3b() -> LlamaConfig:
    """OpenLLaMA-3B (the llama-family size that fits a 16 GB chip dense:
    7B bf16 weights alone are 13.5 GB and the scoring program needs ~17 GB
    total — over this device; 3B is ~6.8 GB, comfortable at seqlen 2048)."""
    return LlamaConfig(d_model=3200, num_layers=26, num_heads=32,
                       num_kv_heads=32, d_ff=8640)


def tiny_config(**kw) -> LlamaConfig:
    defaults = dict(vocab_size=64, d_model=32, num_layers=2, num_heads=4,
                    num_kv_heads=4, d_ff=64, max_seq_len=32)
    defaults.update(kw)
    return LlamaConfig(**defaults)


def init_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32,
                per_leaf: bool = False) -> PyTree:
    """Random init. ``per_leaf=True`` generates each leaf in its own jitted
    program: identical values (same keys, same ops), but temporaries (f32
    normals + threefry bits) are freed between leaves — one whole-tree jit
    at 7B holds ~70 GB of host temporaries on the CPU backend, per-leaf
    peaks near the largest leaf. Use it for host-resident big-model init
    (cli/prune.py --host_stream fine stage)."""
    ks = jax.random.split(key, 9)
    d, L, F = cfg.d_model, cfg.num_layers, cfg.d_ff
    kv_dim = cfg.num_kv_heads * cfg.head_dim

    def gen(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    def f(k, shape, std=0.02):
        if per_leaf:
            return jax.jit(gen, static_argnums=(1, 2))(k, shape, std)
        return gen(k, shape, std)

    return {
        "embed_tokens": f(ks[0], (cfg.vocab_size, d)),
        "layers": {
            "input_ln": {"scale": jnp.ones((L, d), dtype)},
            "attn": {
                "q": {"kernel": f(ks[1], (L, d, d), d**-0.5)},
                "k": {"kernel": f(ks[2], (L, d, kv_dim), d**-0.5)},
                "v": {"kernel": f(ks[3], (L, d, kv_dim), d**-0.5)},
                "o": {"kernel": f(ks[4], (L, d, d), d**-0.5)},
            },
            "post_ln": {"scale": jnp.ones((L, d), dtype)},
            "mlp": {
                "gate": {"kernel": f(ks[5], (L, d, F), d**-0.5)},
                "up": {"kernel": f(ks[6], (L, d, F), d**-0.5)},
                "down": {"kernel": f(ks[7], (L, F, d), F**-0.5)},
            },
        },
        "norm": {"scale": jnp.ones((d,), dtype)},
        "lm_head": {"kernel": f(ks[8], (d, cfg.vocab_size), d**-0.5)},
    }


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin(cfg: LlamaConfig, seq_len: int) -> Tuple[jax.Array, jax.Array]:
    inv_freq = 1.0 / (
        cfg.rope_theta
        ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim)
    )
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (S, Dh/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, H, S, Dh); HF rotate_half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, None] + rotated * sin[None, None]


# ---------------------------------------------------------------------------
# block forward
# ---------------------------------------------------------------------------

def block_forward(
    cfg: LlamaConfig,
    bp: PyTree,
    x: jax.Array,
    cache: Any,
    collect: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """cache = (attn_bias, cos, sin) shared by every block."""
    bias, cos, sin = cache
    stats: Dict[str, jax.Array] = {}
    b, s, d = x.shape
    h_n, kv_n, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = rms_norm(bp["input_ln"], x, cfg.rms_eps)
    collect_stats(stats, "self_attn.q_proj", h, collect)
    collect_stats(stats, "self_attn.k_proj", h, collect)
    collect_stats(stats, "self_attn.v_proj", h, collect)
    q = jnp.dot(h, bp["attn"]["q"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.dot(h, bp["attn"]["k"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.dot(h, bp["attn"]["v"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    qh = q.reshape(b, s, h_n, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, kv_n, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, kv_n, dh).transpose(0, 2, 1, 3)
    qh = apply_rope(qh, cos, sin)
    kh = apply_rope(kh, cos, sin)
    if kv_n != h_n:  # grouped-query attention broadcast
        rep = h_n // kv_n
        kh = jnp.repeat(kh, rep, axis=1)
        vh = jnp.repeat(vh, rep, axis=1)
    # bias None = pure causal (calibration windows): flash/chunked eligible.
    # With a padding mask the combined bias rides in and causality is baked
    # into it (_prepare_cache) — naive/chunked handle that path.
    o = mha(qh, kh, vh, sm_scale=dh**-0.5, bias=bias, causal=bias is None)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, h_n * dh).astype(x.dtype)
    collect_stats(stats, "self_attn.o_proj", o, collect)
    o = jnp.dot(o, bp["attn"]["o"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + o

    h = rms_norm(bp["post_ln"], x, cfg.rms_eps)
    collect_stats(stats, "mlp.gate_proj", h, collect)
    collect_stats(stats, "mlp.up_proj", h, collect)
    g = jnp.dot(h, bp["mlp"]["gate"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    u = jnp.dot(h, bp["mlp"]["up"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    hh = jax.nn.silu(g) * u
    collect_stats(stats, "mlp.down_proj", hh, collect)
    hh = jnp.dot(hh, bp["mlp"]["down"]["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    return x + hh, stats


def _prepare_cache(cfg: LlamaConfig, attn_mask: Optional[jax.Array], seq_len: int):
    """attn_mask None => cache carries bias=None and block_forward runs
    pure-causal attention (flash-kernel eligible; no (S,S) bias buffer at
    all for 2048-token calibration batches). With a padding mask the causal
    + padding bias is prebuilt here (B,1,S,S) and causality comes from it."""
    if attn_mask is None:
        bias = None
    else:
        causal = jnp.where(
            jnp.tril(jnp.ones((seq_len, seq_len), jnp.bool_)), 0.0, -1e9
        )[None, None]
        bias = causal + mask_bias(attn_mask)
    cos, sin = rope_cos_sin(cfg, seq_len)
    return bias, cos, sin


def forward(
    cfg: LlamaConfig,
    params: PyTree,
    input_ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, S) ids -> (B, S, V) float32 logits via one scanned block program."""
    x = params["embed_tokens"][input_ids]
    cache = _prepare_cache(cfg, attn_mask, x.shape[1])

    def body(x, bp):
        y, _ = block_forward(cfg, bp, x, cache)
        return y, None

    x, _ = tower_scan(body, x, params["layers"])
    x = rms_norm(params["norm"], x, cfg.rms_eps)
    return jnp.dot(x, params["lm_head"]["kernel"], preferred_element_type=jnp.float32)


def _next_token_ce(
    logits: jax.Array, input_ids: jax.Array, attn_mask: Optional[jax.Array]
) -> jax.Array:
    targets = input_ids[:, 1:]
    valid = (
        jnp.ones_like(targets, jnp.bool_)
        if attn_mask is None
        else attn_mask[:, 1:] > 0
    )
    # lse-form CE: log_softmax would materialize a SECOND (B, S, V) array
    # next to the logits — at LLaMA-7B 32k-vocab that extra 2 GB/chunk is
    # what pushed the coarse-stage program past the 15.75 GB chip
    shifted = logits[:, :-1]
    lse = jax.nn.logsumexp(shifted, axis=-1)
    picked = jnp.take_along_axis(shifted, targets[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, lse - picked, 0.0)
    return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)


def per_sample_loss(
    cfg: LlamaConfig,
    params: PyTree,
    input_ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """(B,) next-token CE, mean over valid target positions."""
    logits = forward(cfg, params, input_ids, attn_mask)
    return _next_token_ce(logits, input_ids, attn_mask)


def loss_from_hidden(
    cfg: LlamaConfig,
    params: PyTree,
    x: jax.Array,
    input_ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """per_sample_loss from the layer stack's output hidden states — the
    suffix-plan entry point (pruning/plans.py)."""
    x = rms_norm(params["norm"], x, cfg.rms_eps)
    logits = jnp.dot(
        x, params["lm_head"]["kernel"], preferred_element_type=jnp.float32
    )
    return _next_token_ce(logits, input_ids, attn_mask)


def perplexity(
    cfg: LlamaConfig, params: PyTree, token_stream: jax.Array, seqlen: int = 2048,
    batch_size: int = 1,
) -> float:
    """WikiText-2-style ppl: non-overlapping seqlen windows over one long
    token stream, token-weighted mean NLL (LLaMA/main.py:89-90 eval_ppl)."""
    n = token_stream.shape[0] // seqlen
    windows = token_stream[: n * seqlen].reshape(n, seqlen)
    fwd = jax.jit(lambda p, ids: per_sample_loss(cfg, p, ids))
    total = 0.0
    for i in range(0, n, batch_size):
        chunk = windows[i : i + batch_size]
        total += float(jnp.sum(fwd(params, chunk))) * seqlen
    return float(jnp.exp(total / (n * seqlen)))


# ---------------------------------------------------------------------------
# pruning adapter
# ---------------------------------------------------------------------------

def make_stack(cfg: LlamaConfig, name: str = "model.layers"):
    from ecoflap_tpu.models.adapters import make_stack as _mk

    def prepare_inputs(params, batch):
        ids = batch["input_ids"]
        x = params["embed_tokens"][ids]
        return x, _prepare_cache(cfg, batch.get("attn_mask"), x.shape[1])

    def _fwd(bp, x, cache, collect=None):
        return block_forward(cfg, bp, x, cache, collect)

    return _mk(
        name=name, num_blocks=cfg.num_layers, linear_names=LINEAR_NAMES,
        per_row_mask=True, prepare_inputs=prepare_inputs, block_forward=_fwd,
        blocks_path="layers", local_to_path=LOCAL_TO_PATH,
    )


def make_adapter(cfg: LlamaConfig, params: PyTree):
    from ecoflap_tpu.pruning.adapter import ModelAdapter

    stack = make_stack(cfg)

    def loss_fn(p, batch):
        return per_sample_loss(cfg, p, batch["input_ids"], batch.get("attn_mask"))

    def build_mezo_plans(p, batch, num_chunks: int = 1):
        from ecoflap_tpu.pruning.plans import SuffixPlan

        def finish(pp, y, d):
            return loss_from_hidden(
                cfg, pp, y, d["input_ids"], d.get("attn_mask"))

        keys = [k for k in ("input_ids", "attn_mask") if k in batch]
        return [SuffixPlan(stack, finish, p, batch, batch_keys=keys,
                           num_chunks=num_chunks)]

    return ModelAdapter(
        name="llama", params=params, loss_fn=loss_fn, stacks=[stack],
        model_prefixes={stack.name: "model"},
        build_mezo_plans=build_mezo_plans,
    )
