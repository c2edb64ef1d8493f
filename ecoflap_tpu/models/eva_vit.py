"""EVA Vision Transformer — TPU-native functional rebuild.

Covers both reference uses (LAVIS/lavis/models/eva_vit.py:250-470):
* BLIP-2's frozen ``eva_clip_g`` tower (``create_eva_vit_g``, :444-451):
  depth 39, embed 1408, heads 16, patch 14, fused qkv with separate q/v bias
  (zero k-bias, :79-85,123-128), abs pos embed, NO final norm — returns every
  token for the Q-Former.
* EVA-CLIP's visual tower (EVA-CLIP-g.json: depth 40 + final norm + linear
  head to the 1024-d joint space, eva_model.py:300-304,338-420).

TPU-first design choices:
* Blocks are STACKED: one ``(L, ...)`` leaf per parameter kind, so the whole
  stack forwards under one ``lax.scan`` (single compiled block program) and
  the pruning engine slices block ``i`` functionally — no ModuleList walking,
  no Catcher hooks.
* Patch embedding is a reshape + one big matmul (``extract_patches``) instead
  of a strided conv — same math, better MXU mapping.
* Params store jax-layout kernels ``(in, out)``; the pruning adapter exposes
  torch-layout views so sparsity-dict semantics match the reference exactly
  (keys ``{prefix}.{i}.attn.qkv.weight`` etc., wanda_pruner.py:553).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models.layers import (
    attention,
    collect_stats,
    extract_patches,
    gelu,
    layer_norm,
    tower_scan,
)

PyTree = Any

# Prunable linears per block, reference-local names (VITLayerWandaPruner
# walks exactly these four, wanda_pruner.py:499-568).
LINEAR_NAMES = ("attn.qkv", "attn.proj", "mlp.fc1", "mlp.fc2")


@dataclass(frozen=True)
class EvaViTConfig:
    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_hidden: int = 6144  # int(1408 * 4.3637), eva_vit.py:444-451
    in_chans: int = 3
    final_norm: bool = False  # EVA-CLIP: LayerNorm before head
    head_dim: int = 0  # EVA-CLIP: linear head to joint space (0 = none)
    ln_eps: float = 1e-6
    # "eva": fused qkv, separate q/v bias, zero k bias (eva_vit.py:79-85)
    # "full": fused qkv with one full bias vector (timm/BLIP ViT-B)
    qkv_bias_mode: str = "eva"

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + cls token


def eva_vit_g(img_size: int = 224) -> EvaViTConfig:
    """BLIP-2's frozen tower (create_eva_vit_g, eva_vit.py:444-451)."""
    return EvaViTConfig(img_size=img_size)


def eva_clip_g_visual(img_size: int = 224, embed_dim: int = 1024) -> EvaViTConfig:
    """EVA-CLIP-g visual tower (EVA-CLIP-g.json + eva_model.py:300-304)."""
    return EvaViTConfig(
        img_size=img_size, depth=40, final_norm=True, head_dim=embed_dim
    )


def vit_base_config(img_size: int = 224, **kw) -> EvaViTConfig:
    """ViT-B/16 layout (timm vit_base_patch16_224 dims) in the EVA block
    structure — the mid-scale ('--model_scale small') tower used when the
    full 39/40-block EVA-g is more model than the run needs."""
    defaults = dict(img_size=img_size, patch_size=16, embed_dim=768,
                    depth=12, num_heads=12, mlp_hidden=3072)
    defaults.update(kw)
    return EvaViTConfig(**defaults)


def tiny_config(**kw) -> EvaViTConfig:
    """Small shapes for CPU tests."""
    defaults = dict(
        img_size=16, patch_size=4, embed_dim=32, depth=3, num_heads=4,
        mlp_hidden=64,
    )
    defaults.update(kw)
    return EvaViTConfig(**defaults)


def init_params(
    cfg: EvaViTConfig, key: jax.Array, dtype=jnp.float32
) -> PyTree:
    ks = jax.random.split(key, 8)
    d, h, L = cfg.embed_dim, cfg.mlp_hidden, cfg.depth
    patch_in = cfg.in_chans * cfg.patch_size**2

    def normal(k, shape, std=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": normal(ks[0], (patch_in, d), patch_in**-0.5),
            "bias": jnp.zeros((d,), dtype),
        },
        "cls_token": normal(ks[1], (1, 1, d)),
        "pos_embed": normal(ks[2], (1, cfg.seq_len, d)),
        "blocks": {
            "norm1": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "attn": {
                "qkv": (
                    {"kernel": normal(ks[3], (L, d, 3 * d))}
                    if cfg.qkv_bias_mode == "eva"
                    else {"kernel": normal(ks[3], (L, d, 3 * d)),
                          "bias": jnp.zeros((L, 3 * d), dtype)}
                ),
                **(
                    {"q_bias": jnp.zeros((L, d), dtype),
                     "v_bias": jnp.zeros((L, d), dtype)}
                    if cfg.qkv_bias_mode == "eva" else {}
                ),
                "proj": {
                    "kernel": normal(ks[4], (L, d, d)),
                    "bias": jnp.zeros((L, d), dtype),
                },
            },
            "norm2": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "mlp": {
                "fc1": {"kernel": normal(ks[5], (L, d, h)), "bias": jnp.zeros((L, h), dtype)},
                "fc2": {"kernel": normal(ks[6], (L, h, d)), "bias": jnp.zeros((L, d), dtype)},
            },
        },
    }
    if cfg.final_norm:
        params["norm"] = {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
    if cfg.head_dim:
        params["head"] = {
            "kernel": normal(ks[7], (d, cfg.head_dim)),
            "bias": jnp.zeros((cfg.head_dim,), dtype),
        }
    return params


def embed(cfg: EvaViTConfig, params: PyTree, images: jax.Array) -> jax.Array:
    """(B, H, W, C) NHWC images -> (B, N+1, D) embedded token sequence
    (patch embed + cls token + abs pos embed, eva_vit.py:345-356)."""
    patches = extract_patches(images, cfg.patch_size)
    x = (
        jnp.dot(patches, params["patch_embed"]["kernel"], preferred_element_type=jnp.float32)
        + params["patch_embed"]["bias"]
    ).astype(images.dtype)
    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["pos_embed"].astype(x.dtype)


def block_forward(
    cfg: EvaViTConfig,
    bp: PyTree,
    x: jax.Array,
    cache: Any = None,
    collect: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One EVA block (eva_vit.py:155-185): pre-LN attn + pre-LN MLP, both
    residual. ``collect`` folds Wanda/Hessian stats inline (replaces hooks)."""
    del cache
    stats: Dict[str, jax.Array] = {}
    d = cfg.embed_dim

    h = layer_norm(bp["norm1"], x, cfg.ln_eps)
    collect_stats(stats, "attn.qkv", h, collect)
    qkv = jnp.dot(h, bp["attn"]["qkv"]["kernel"], preferred_element_type=jnp.float32)
    if cfg.qkv_bias_mode == "eva":
        # fused qkv: no kernel bias; add [q_bias, 0, v_bias] (eva_vit.py:123-128)
        qkv_bias = jnp.concatenate(
            [bp["attn"]["q_bias"], jnp.zeros_like(bp["attn"]["q_bias"]),
             bp["attn"]["v_bias"]]
        )
    else:  # timm/BLIP ViT: one full bias
        qkv_bias = bp["attn"]["qkv"]["bias"]
    qkv = (qkv + qkv_bias).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = attention(q, k, v, cfg.num_heads)
    collect_stats(stats, "attn.proj", o, collect)
    o = (
        jnp.dot(o, bp["attn"]["proj"]["kernel"], preferred_element_type=jnp.float32)
        + bp["attn"]["proj"]["bias"]
    ).astype(x.dtype)
    x = x + o

    h = layer_norm(bp["norm2"], x, cfg.ln_eps)
    collect_stats(stats, "mlp.fc1", h, collect)
    h = (
        jnp.dot(h, bp["mlp"]["fc1"]["kernel"], preferred_element_type=jnp.float32)
        + bp["mlp"]["fc1"]["bias"]
    ).astype(x.dtype)
    h = gelu(h)
    collect_stats(stats, "mlp.fc2", h, collect)
    h = (
        jnp.dot(h, bp["mlp"]["fc2"]["kernel"], preferred_element_type=jnp.float32)
        + bp["mlp"]["fc2"]["bias"]
    ).astype(x.dtype)
    return x + h, stats


def get_block(params: PyTree, i) -> PyTree:
    return jax.tree_util.tree_map(lambda a: a[i], params["blocks"])


def set_block(params: PyTree, i, bp: PyTree) -> PyTree:
    blocks = jax.tree_util.tree_map(
        lambda full, b: full.at[i].set(b.astype(full.dtype)), params["blocks"], bp
    )
    return {**params, "blocks": blocks}


def forward_features(
    cfg: EvaViTConfig, params: PyTree, images: jax.Array
) -> jax.Array:
    """Full tower -> (B, N+1, D) tokens, via ONE scanned block program
    (replaces the reference's Python loop over 39 nn.Modules,
    eva_vit.py:356-360)."""
    x = embed(cfg, params, images)

    def body(x, bp):
        y, _ = block_forward(cfg, bp, x)
        return y, None

    x, _ = tower_scan(body, x, params["blocks"])
    return x


def forward(cfg: EvaViTConfig, params: PyTree, images: jax.Array) -> jax.Array:
    """BLIP-2 mode: all tokens. EVA-CLIP mode: cls token -> norm -> head
    (eva_vit.py:345-380)."""
    x = forward_features(cfg, params, images)
    if not cfg.final_norm and not cfg.head_dim:
        return x
    x = x[:, 0]
    if cfg.final_norm:
        x = layer_norm(params["norm"], x, cfg.ln_eps)
    if cfg.head_dim:
        x = (
            jnp.dot(x, params["head"]["kernel"], preferred_element_type=jnp.float32)
            + params["head"]["bias"]
        ).astype(x.dtype)
    return x


def make_stack(
    cfg: EvaViTConfig,
    name: str = "visual_encoder.blocks",
    blocks_path: str = "blocks",
    image_key: str = "image",
):
    """StackSpec for the pruning engine. ``name`` sets sparsity-dict keys:
    BLIP-2 uses ``visual_encoder.blocks``, EVA-CLIP ``visual.blocks``
    (wanda_pruner.py:553,570-585). ViT masking is per-tensor (:553-556)."""
    from ecoflap_tpu.core.pytree import get_leaf
    from ecoflap_tpu.models.adapters import make_stack as _mk

    root = blocks_path.rsplit(".", 1)[0] if "." in blocks_path else ""

    def prepare_inputs(params, batch):
        sub = get_leaf(params, root) if root else params
        return embed(cfg, sub, batch[image_key]), None

    def _block_forward(bp, x, cache, collect=None):
        return block_forward(cfg, bp, x, cache, collect)

    return _mk(
        name=name,
        num_blocks=cfg.depth,
        linear_names=LINEAR_NAMES,
        per_row_mask=False,
        prepare_inputs=prepare_inputs,
        block_forward=_block_forward,
        blocks_path=blocks_path,
    )
