"""CLIP — vendored-OpenAI style (CoOp/clip/model.py) and EVA-CLIP
(LAVIS/lavis/models/clip_models/eva_model.py) as one functional module.

Towers:
* ``resblock`` stack — CLIP-style pre-LN transformer used by the OpenAI
  visual tower and BOTH text towers: ``ln_1 -> attn(in_proj/out_proj) ->
  ln_2 -> mlp(c_fc/act/c_proj)`` (CoOp/clip/model.py ResidualAttentionBlock,
  eva_model.py Transformer). The reference prunes it through the
  ``hacky_attn`` rebuild of nn.MultiheadAttention
  (CoOp/trainers/pruners/wanda_pruner.py:300-322); here ``attn.in_proj`` is a
  plain fused-qkv linear from the start, so the weight-copy dance disappears
  while the sparsity keys stay addressable.
* EVA-CLIP visual tower = ``eva_vit`` with ``final_norm`` + linear head
  (EVA-CLIP-g.json: 40 layers, width 1408, head 1024).

Losses:
* ``contrastive_loss`` — symmetric InfoNCE (CoOp/trainers/zsclip.py:73-93).
  Per-sample VALUES depend on the whole batch (in-batch negatives), so the
  adapter sets ``chunk_safe=False``: MeZO groups per microbatch (reference-
  consistent) but never sub-chunks the loss eval.
* ``zero_shot_ce_loss`` — CE of image features against a prompt-ensemble
  classifier, the LAVIS ``loss_vision`` (compression/pruners/utils.py:37-57,
  un-scaling the x100 predict logits).

Zero-shot classifier construction mirrors eva_model.py:530-544: encode every
prompt template per class, mean-pool, L2-normalize.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.core.pytree import get_leaf
from ecoflap_tpu.models import eva_vit
from ecoflap_tpu.models.adapters import make_stack
from ecoflap_tpu.models.layers import (
    activation,
    attention,
    causal_bias,
    collect_stats,
    extract_patches,
    layer_norm,
    tower_scan,
)
from ecoflap_tpu.pruning.adapter import ModelAdapter

PyTree = Any

RESBLOCK_LINEARS = ("attn.in_proj", "attn.out_proj", "mlp.c_fc", "mlp.c_proj")


@dataclass(frozen=True)
class TowerConfig:
    width: int
    layers: int
    heads: int
    act: str = "quick_gelu"  # OpenAI CLIP; EVA-CLIP text uses "gelu"
    ln_eps: float = 1e-5

    @property
    def mlp_hidden(self) -> int:
        return 4 * self.width


@dataclass(frozen=True)
class CLIPVisualConfig(TowerConfig):
    patch_size: int = 16
    img_size: int = 224
    embed_dim: int = 512

    @property
    def seq_len(self) -> int:
        return (self.img_size // self.patch_size) ** 2 + 1


@dataclass(frozen=True)
class CLIPTextConfig(TowerConfig):
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 512


@dataclass(frozen=True)
class CLIPConfig:
    visual: Optional[CLIPVisualConfig]  # None when visual tower is EVA
    text: CLIPTextConfig
    eva_visual: Optional[eva_vit.EvaViTConfig] = None  # EVA-CLIP mode

    @property
    def embed_dim(self) -> int:
        return self.text.embed_dim


def vit_b16(img_size: int = 224) -> CLIPConfig:
    """OpenAI CLIP ViT-B/16 (CoOp/clip/model.py build_model shapes)."""
    return CLIPConfig(
        visual=CLIPVisualConfig(width=768, layers=12, heads=12, patch_size=16,
                                img_size=img_size, embed_dim=512),
        text=CLIPTextConfig(width=512, layers=12, heads=8, embed_dim=512),
    )


def eva_clip_g(img_size: int = 224) -> CLIPConfig:
    """EVA-CLIP-g (EVA-CLIP-g.json)."""
    return CLIPConfig(
        visual=None,
        text=CLIPTextConfig(width=768, layers=12, heads=12, embed_dim=1024,
                            act="gelu"),
        eva_visual=eva_vit.eva_clip_g_visual(img_size=img_size, embed_dim=1024),
    )


def small_config(eva: bool = False, img_size: int = 224) -> CLIPConfig:
    """Mid-scale CLIP ('--model_scale small'): ViT-B-sized visual tower +
    a 6-layer text tower. For eva=False this is simply vit_b16 with the
    text depth halved; for eva=True it swaps EVA-g for a ViT-B-shaped EVA
    visual. No reference analogue — a cheap stand-in between tiny/full."""
    text = CLIPTextConfig(width=512, layers=6, heads=8, embed_dim=512,
                          act="gelu" if eva else "quick_gelu")
    if eva:
        return CLIPConfig(
            visual=None, text=text,
            eva_visual=eva_vit.vit_base_config(
                img_size, final_norm=True, head_dim=512),
        )
    return CLIPConfig(
        visual=CLIPVisualConfig(width=768, layers=12, heads=12, patch_size=16,
                                img_size=img_size, embed_dim=512),
        text=text,
    )


def tiny_config(eva: bool = False) -> CLIPConfig:
    text = CLIPTextConfig(width=32, layers=2, heads=4, vocab_size=64,
                          context_length=12, embed_dim=16,
                          act="gelu" if eva else "quick_gelu")
    if eva:
        return CLIPConfig(
            visual=None, text=text,
            eva_visual=eva_vit.tiny_config(final_norm=True, head_dim=16),
        )
    return CLIPConfig(
        visual=CLIPVisualConfig(width=32, layers=2, heads=4, patch_size=4,
                                img_size=16, embed_dim=16),
        text=text,
    )


# ---------------------------------------------------------------------------
# resblock stack (shared by OpenAI visual + both text towers)
# ---------------------------------------------------------------------------

def init_resblocks(cfg: TowerConfig, key: jax.Array, dtype=jnp.float32) -> PyTree:
    L, d, h = cfg.layers, cfg.width, cfg.mlp_hidden
    ks = jax.random.split(key, 4)

    def normal(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    attn_std = d**-0.5
    proj_std = (d**-0.5) * ((2 * L) ** -0.5)
    fc_std = (2 * d) ** -0.5
    return {
        "ln_1": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
        "attn": {
            "in_proj": {"kernel": normal(ks[0], (L, d, 3 * d), attn_std),
                        "bias": jnp.zeros((L, 3 * d), dtype)},
            "out_proj": {"kernel": normal(ks[1], (L, d, d), proj_std),
                         "bias": jnp.zeros((L, d), dtype)},
        },
        "ln_2": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
        "mlp": {
            "c_fc": {"kernel": normal(ks[2], (L, d, h), fc_std),
                     "bias": jnp.zeros((L, h), dtype)},
            "c_proj": {"kernel": normal(ks[3], (L, h, d), proj_std),
                       "bias": jnp.zeros((L, d), dtype)},
        },
    }


def resblock_forward(
    cfg: TowerConfig,
    bp: PyTree,
    x: jax.Array,
    cache: Any = None,
    collect: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One ResidualAttentionBlock. ``cache`` carries the additive attention
    bias (causal mask for text, None for vision)."""
    stats: Dict[str, jax.Array] = {}
    act = activation(cfg.act)

    h = layer_norm(bp["ln_1"], x, cfg.ln_eps)
    collect_stats(stats, "attn.in_proj", h, collect)
    qkv = (
        jnp.dot(h, bp["attn"]["in_proj"]["kernel"], preferred_element_type=jnp.float32)
        + bp["attn"]["in_proj"]["bias"]
    ).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = attention(q, k, v, cfg.heads, bias=cache)
    collect_stats(stats, "attn.out_proj", o, collect)
    o = (
        jnp.dot(o, bp["attn"]["out_proj"]["kernel"], preferred_element_type=jnp.float32)
        + bp["attn"]["out_proj"]["bias"]
    ).astype(x.dtype)
    x = x + o

    h = layer_norm(bp["ln_2"], x, cfg.ln_eps)
    collect_stats(stats, "mlp.c_fc", h, collect)
    h = (
        jnp.dot(h, bp["mlp"]["c_fc"]["kernel"], preferred_element_type=jnp.float32)
        + bp["mlp"]["c_fc"]["bias"]
    ).astype(x.dtype)
    h = act(h)
    collect_stats(stats, "mlp.c_proj", h, collect)
    h = (
        jnp.dot(h, bp["mlp"]["c_proj"]["kernel"], preferred_element_type=jnp.float32)
        + bp["mlp"]["c_proj"]["bias"]
    ).astype(x.dtype)
    return x + h, stats


def run_resblocks(
    cfg: TowerConfig, blocks: PyTree, x: jax.Array, bias: Optional[jax.Array]
) -> jax.Array:
    def body(x, bp):
        y, _ = resblock_forward(cfg, bp, x, bias)
        return y, None

    x, _ = tower_scan(body, x, blocks)
    return x


# ---------------------------------------------------------------------------
# towers
# ---------------------------------------------------------------------------

def init_params(cfg: CLIPConfig, key: jax.Array, dtype=jnp.float32) -> PyTree:
    kv, kt, kz = jax.random.split(key, 3)
    params: Dict[str, Any] = {
        "text": _init_text(cfg.text, kt, dtype),
        "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32),
    }
    if cfg.eva_visual is not None:
        params["visual"] = eva_vit.init_params(cfg.eva_visual, kv, dtype)
    else:
        params["visual"] = _init_visual(cfg.visual, kv, dtype)
    return params


def _init_visual(cfg: CLIPVisualConfig, key: jax.Array, dtype) -> PyTree:
    ks = jax.random.split(key, 4)
    d = cfg.width
    patch_in = 3 * cfg.patch_size**2

    def normal(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    return {
        "conv1": {"kernel": normal(ks[0], (patch_in, d), d**-0.5)},  # no bias
        "class_embedding": normal(ks[1], (d,), d**-0.5),
        "positional_embedding": normal(ks[2], (cfg.seq_len, d), d**-0.5),
        "ln_pre": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "blocks": init_resblocks(cfg, ks[3], dtype),
        "ln_post": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "proj": normal(ks[3], (d, cfg.embed_dim), d**-0.5),
    }


def _init_text(cfg: CLIPTextConfig, key: jax.Array, dtype) -> PyTree:
    ks = jax.random.split(key, 4)
    d = cfg.width
    return {
        "token_embedding": (
            jax.random.normal(ks[0], (cfg.vocab_size, d), jnp.float32) * 0.02
        ).astype(dtype),
        "positional_embedding": (
            jax.random.normal(ks[1], (cfg.context_length, d), jnp.float32) * 0.01
        ).astype(dtype),
        "blocks": init_resblocks(cfg, ks[2], dtype),
        "ln_final": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "text_projection": (
            jax.random.normal(ks[3], (d, cfg.embed_dim), jnp.float32) * d**-0.5
        ).astype(dtype),
    }


def visual_embed(cfg: CLIPVisualConfig, vp: PyTree, images: jax.Array) -> jax.Array:
    """OpenAI visual stem: conv-as-matmul + cls + pos + ln_pre."""
    patches = extract_patches(images, cfg.patch_size)
    x = jnp.dot(patches, vp["conv1"]["kernel"], preferred_element_type=jnp.float32)
    x = x.astype(images.dtype)
    cls = jnp.broadcast_to(
        vp["class_embedding"].astype(x.dtype)[None, None], (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["positional_embedding"].astype(x.dtype)[None]
    return layer_norm(vp["ln_pre"], x, cfg.ln_eps)


def encode_image(cfg: CLIPConfig, params: PyTree, images: jax.Array) -> jax.Array:
    if cfg.eva_visual is not None:
        return eva_vit.forward(cfg.eva_visual, params["visual"], images)
    vcfg = cfg.visual
    vp = params["visual"]
    x = visual_embed(vcfg, vp, images)
    x = run_resblocks(vcfg, vp["blocks"], x, None)
    x = layer_norm(vp["ln_post"], x[:, 0], vcfg.ln_eps)
    return jnp.dot(x, vp["proj"], preferred_element_type=jnp.float32).astype(x.dtype)


def text_embed(cfg: CLIPTextConfig, tp: PyTree, ids: jax.Array) -> jax.Array:
    x = tp["token_embedding"][ids]
    return x + tp["positional_embedding"].astype(x.dtype)[None, : x.shape[1]]


def encode_text(cfg: CLIPConfig, params: PyTree, ids: jax.Array) -> jax.Array:
    """(B, ctx) token ids -> (B, embed) features, EOT pooling = argmax of ids
    (eva_model.py:295-305, CoOp/clip/model.py encode_text)."""
    tcfg = cfg.text
    tp = params["text"]
    x = text_embed(tcfg, tp, ids)
    bias = causal_bias(x.shape[1])
    x = run_resblocks(tcfg, tp["blocks"], x, bias)
    x = layer_norm(tp["ln_final"], x, tcfg.ln_eps)
    eot = jnp.argmax(ids, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return jnp.dot(x, tp["text_projection"], preferred_element_type=jnp.float32).astype(
        x.dtype
    )


def _normalize(x: jax.Array) -> jax.Array:
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True).astype(
        x.dtype
    )


def logits(cfg: CLIPConfig, params: PyTree, images, ids) -> Tuple[jax.Array, jax.Array]:
    """(logits_per_image, logits_per_text), logit_scale applied."""
    img = _normalize(encode_image(cfg, params, images))
    txt = _normalize(encode_text(cfg, params, ids))
    scale = jnp.exp(params["logit_scale"])
    per_image = scale * jnp.dot(
        img.astype(jnp.float32), txt.astype(jnp.float32).T
    )
    return per_image, per_image.T


def contrastive_loss(cfg: CLIPConfig, params: PyTree, batch: Any) -> jax.Array:
    """(B,) per-sample symmetric InfoNCE (CoOp/trainers/zsclip.py:84-90).
    Mean over the batch equals the reference scalar loss."""
    per_image, per_text = logits(cfg, params, batch["image"], batch["text_ids"])
    labels = jnp.arange(per_image.shape[0])
    li = -jax.nn.log_softmax(per_image, axis=-1)[labels, labels]
    lt = -jax.nn.log_softmax(per_text, axis=-1)[labels, labels]
    return (li + lt) / 2.0


def predict(cfg: CLIPConfig, params: PyTree, images, classifier: jax.Array) -> jax.Array:
    """100 · img_features @ classifier (eva_model.py:512-521)."""
    img = _normalize(encode_image(cfg, params, images))
    return 100.0 * jnp.dot(img.astype(jnp.float32), classifier.astype(jnp.float32))


def zero_shot_ce_loss(
    cfg: CLIPConfig, params: PyTree, batch: Any, classifier: jax.Array
) -> jax.Array:
    """(B,) LAVIS ``loss_vision``: CE of (predict/100) vs labels
    (compression/pruners/utils.py:37-57)."""
    lg = predict(cfg, params, batch["image"], classifier) / 100.0
    return -jax.nn.log_softmax(lg, axis=-1)[jnp.arange(lg.shape[0]), batch["label"]]


def zero_shot_classifier(
    cfg: CLIPConfig,
    params: PyTree,
    prompt_ids: jax.Array,
    num_classes: int,
) -> jax.Array:
    """(C·T, ctx) tokenized prompts (T templates per class, class-major) ->
    (embed, C) normalized mean-pooled classifier (eva_model.py:530-544)."""
    feats = encode_text(cfg, params, prompt_ids)
    feats = _normalize(feats)
    feats = feats.reshape(num_classes, -1, feats.shape[-1]).mean(axis=1)
    return _normalize(feats).T


# ---------------------------------------------------------------------------
# pruning adapters
# ---------------------------------------------------------------------------

def make_visual_stack(cfg: CLIPConfig, name: str = "visual.transformer.resblocks"):
    if cfg.eva_visual is not None:
        return eva_vit.make_stack(cfg.eva_visual, name="visual.blocks",
                                  blocks_path="visual.blocks")
    vcfg = cfg.visual

    def prepare_inputs(params, batch):
        return visual_embed(vcfg, params["visual"], batch["image"]), None

    def _fwd(bp, x, cache, collect=None):
        return resblock_forward(vcfg, bp, x, cache, collect)

    return make_stack(
        name=name, num_blocks=vcfg.layers, linear_names=RESBLOCK_LINEARS,
        per_row_mask=True, prepare_inputs=prepare_inputs, block_forward=_fwd,
        blocks_path="visual.blocks",
    )


def make_text_stack(cfg: CLIPConfig, name: str = "transformer.resblocks"):
    tcfg = cfg.text

    def prepare_inputs(params, batch):
        x = text_embed(tcfg, params["text"], batch["text_ids"])
        return x, causal_bias(x.shape[1])

    def _fwd(bp, x, cache, collect=None):
        return resblock_forward(tcfg, bp, x, cache, collect)

    return make_stack(
        name=name, num_blocks=tcfg.layers, linear_names=RESBLOCK_LINEARS,
        per_row_mask=True, prepare_inputs=prepare_inputs, block_forward=_fwd,
        blocks_path="text.blocks",
    )


def make_adapter(
    cfg: CLIPConfig,
    params: PyTree,
    include_text: bool = True,
    classifier: Optional[jax.Array] = None,
) -> ModelAdapter:
    """CoOp-style adapter: visual + text stacks, contrastive calibration loss
    (zsclip.py:61-93). With ``classifier`` set, uses the LAVIS eva_clip path:
    visual-only prune + zero-shot CE loss (scripts/eva_clip/ecoflap.py)."""
    stacks = [make_visual_stack(cfg)]
    prefixes = {stacks[0].name: stacks[0].name.split(".")[0]}
    if include_text and classifier is None:
        ts = make_text_stack(cfg)
        stacks.append(ts)
        prefixes[ts.name] = "transformer"

    if classifier is not None:
        def loss_fn(p, batch):
            return zero_shot_ce_loss(cfg, p, batch, classifier)
    else:
        def loss_fn(p, batch):
            return contrastive_loss(cfg, p, batch)

    return ModelAdapter(
        name="eva_clip" if cfg.eva_visual is not None else "clip",
        params=params, loss_fn=loss_fn, stacks=stacks, model_prefixes=prefixes,
        # InfoNCE's per-sample values depend on the whole batch (in-batch
        # negatives) — loss sub-chunking would shrink each sample's negative
        # set; zero-shot CE is per-sample independent and chunk-safe
        chunk_safe=classifier is not None,
    )
