"""Image classifiers — the ``LLaMA/image_classifiers`` family (DeiT/ViT/
ConvNeXt Wanda pruning, layerwrapper.py:11-53 + prune_utils.py:27-226).

* ViT/DeiT classifiers = the shared ViT tower (eva_vit with timm-style full
  qkv bias) + classifier head; prunable linears identical to the reference's
  ``find_layers`` walk over blocks.
* ConvNeXt: per-stage depthwise 7x7 conv + LN + pointwise MLP (pwconv1/
  pwconv2) + layer scale. The POINTWISE convs are 1x1 == matmuls — exactly
  the layers the reference prunes (prune_convnext targets nn.Linear); the
  depthwise convs stay dense, as in the reference.

Cross-entropy calibration loss; per-layer/per-block mask granularity comes
from the shared coarse stage (prune_utils.compute_mask's granularity knob maps
onto sparsity_ratio_granularity layer/block).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.models import eva_vit
from ecoflap_tpu.models.adapters import make_stack
from ecoflap_tpu.models.layers import collect_stats, layer_norm, tower_scan
from ecoflap_tpu.pruning.adapter import ModelAdapter

PyTree = Any


# ---------------------------------------------------------------------------
# ViT / DeiT classifier
# ---------------------------------------------------------------------------

def deit_base(img_size: int = 224, num_classes: int = 1000) -> eva_vit.EvaViTConfig:
    return eva_vit.EvaViTConfig(
        img_size=img_size, patch_size=16, embed_dim=768, depth=12,
        num_heads=12, mlp_hidden=3072, final_norm=True, head_dim=num_classes,
        qkv_bias_mode="full",
    )


def deit_small(img_size: int = 224, num_classes: int = 1000) -> eva_vit.EvaViTConfig:
    """DeiT-S/16 ('--model_scale small'): timm deit_small_patch16_224 dims."""
    return eva_vit.EvaViTConfig(
        img_size=img_size, patch_size=16, embed_dim=384, depth=12,
        num_heads=6, mlp_hidden=1536, final_norm=True, head_dim=num_classes,
        qkv_bias_mode="full",
    )


def vit_classifier_loss(cfg: eva_vit.EvaViTConfig, params, batch):
    logits = eva_vit.forward(cfg, params, batch["image"])
    return -jax.nn.log_softmax(logits, axis=-1)[
        jnp.arange(logits.shape[0]), batch["label"]
    ]


def build(model: str, scale: str):
    """Shared CLI factory: (cfg, init_fn, forward_fn, img_size, num_classes)
    for 'deit' / 'convnext' at 'tiny' / 'small' / 'full' — one definition
    so prune-time checkpoints and eval-time templates can never drift.
    convnext 'small' aliases convnext_tiny (already the smallest real
    ConvNeXt); deit 'small' is DeiT-S/16."""
    if model == "deit":
        cfg = (deit_base() if scale == "full"
               else deit_small() if scale == "small"
               else eva_vit.tiny_config(final_norm=True, head_dim=10,
                                        qkv_bias_mode="full"))
        return (cfg, eva_vit.init_params,
                lambda p, im: eva_vit.forward(cfg, p, im),
                cfg.img_size, cfg.head_dim)
    if model == "convnext":
        cfg = convnext_tiny() if scale in ("full", "small") else tiny_config()
        return (cfg, init_params, lambda p, im: forward(cfg, p, im),
                cfg.img_size, cfg.num_classes)
    raise ValueError(f"unknown classifier family {model!r}")


def make_vit_classifier_adapter(cfg: eva_vit.EvaViTConfig, params) -> ModelAdapter:
    stack = eva_vit.make_stack(cfg, name="blocks", blocks_path="blocks")

    def loss_fn(p, batch):
        return vit_classifier_loss(cfg, p, batch)

    return ModelAdapter(
        name="vit_classifier", params=params, loss_fn=loss_fn, stacks=[stack],
        model_prefixes={"blocks": "blocks"},
    )


# ---------------------------------------------------------------------------
# ConvNeXt
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    num_classes: int = 1000
    img_size: int = 224
    ln_eps: float = 1e-6


def convnext_tiny() -> ConvNeXtConfig:
    return ConvNeXtConfig()


def tiny_config() -> ConvNeXtConfig:
    return ConvNeXtConfig(depths=(2, 2), dims=(16, 32), num_classes=10,
                          img_size=32)


def init_params(cfg: ConvNeXtConfig, key: jax.Array, dtype=jnp.float32) -> PyTree:
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    def normal(shape, std=0.02):
        return (jax.random.normal(next(ki), shape, jnp.float32) * std).astype(dtype)

    stages = []
    for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        blocks = {
            "dwconv": {"kernel": normal((depth, 7, 7, dim)),
                       "bias": jnp.zeros((depth, dim), dtype)},
            "norm": {"scale": jnp.ones((depth, dim), dtype),
                     "bias": jnp.zeros((depth, dim), dtype)},
            "pwconv1": {"kernel": normal((depth, dim, 4 * dim)),
                        "bias": jnp.zeros((depth, 4 * dim), dtype)},
            "pwconv2": {"kernel": normal((depth, 4 * dim, dim)),
                        "bias": jnp.zeros((depth, dim), dtype)},
            "gamma": jnp.full((depth, dim), 1e-6, dtype),
        }
        if si == 0:
            down = {
                "conv": {"kernel": normal((4 * 4 * 3, cfg.dims[0])),
                         "bias": jnp.zeros((cfg.dims[0],), dtype)},
                "norm": {"scale": jnp.ones((cfg.dims[0],), dtype),
                         "bias": jnp.zeros((cfg.dims[0],), dtype)},
            }
        else:
            down = {
                "norm": {"scale": jnp.ones((cfg.dims[si - 1],), dtype),
                         "bias": jnp.zeros((cfg.dims[si - 1],), dtype)},
                "conv": {"kernel": normal((2 * 2 * cfg.dims[si - 1], dim)),
                         "bias": jnp.zeros((dim,), dtype)},
            }
        stages.append({"downsample": down, "blocks": blocks})
    return {
        "stages": stages,
        "norm": {"scale": jnp.ones((cfg.dims[-1],), dtype),
                 "bias": jnp.zeros((cfg.dims[-1],), dtype)},
        "head": {"kernel": normal((cfg.dims[-1], cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,), dtype)},
    }


def _dwconv7(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """Depthwise 7x7, NHWC, same padding. kernel: (7, 7, C)."""
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, kernel[:, :, None, :],  # HWIO with I=1 per group: (7,7,1,C)
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out + bias


def convnext_block(cfg: ConvNeXtConfig, bp: PyTree, x: jax.Array,
                   collect: Optional[str] = None) -> Tuple[jax.Array, Dict]:
    stats: Dict[str, jax.Array] = {}
    h = _dwconv7(x, bp["dwconv"]["kernel"], bp["dwconv"]["bias"])
    h = layer_norm(bp["norm"], h, cfg.ln_eps)
    collect_stats(stats, "pwconv1", h, collect)
    h = (jnp.dot(h, bp["pwconv1"]["kernel"], preferred_element_type=jnp.float32)
         + bp["pwconv1"]["bias"]).astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    collect_stats(stats, "pwconv2", h, collect)
    h = (jnp.dot(h, bp["pwconv2"]["kernel"], preferred_element_type=jnp.float32)
         + bp["pwconv2"]["bias"]).astype(x.dtype)
    return x + bp["gamma"] * h, stats


def _downsample(si: int, dp: PyTree, x: jax.Array, eps: float) -> jax.Array:
    from ecoflap_tpu.models.layers import extract_patches

    if si == 0:
        p = extract_patches(x, 4)
        b, n, _ = p.shape
        hw = int(n**0.5)
        y = (jnp.dot(p, dp["conv"]["kernel"], preferred_element_type=jnp.float32)
             + dp["conv"]["bias"]).astype(x.dtype)
        y = y.reshape(b, hw, hw, -1)
        return layer_norm(dp["norm"], y, eps)
    x = layer_norm(dp["norm"], x, eps)
    p = extract_patches(x, 2)
    b, n, _ = p.shape
    hw = int(n**0.5)
    y = (jnp.dot(p, dp["conv"]["kernel"], preferred_element_type=jnp.float32)
         + dp["conv"]["bias"]).astype(x.dtype)
    return y.reshape(b, hw, hw, -1)


def forward(cfg: ConvNeXtConfig, params: PyTree, images: jax.Array) -> jax.Array:
    x = images
    for si, stage in enumerate(params["stages"]):
        x = _downsample(si, stage["downsample"], x, cfg.ln_eps)

        def body(x, bp):
            y, _ = convnext_block(cfg, bp, x)
            return y, None

        x, _ = tower_scan(body, x, stage["blocks"])
    x = x.mean(axis=(1, 2))
    x = layer_norm(params["norm"], x, cfg.ln_eps)
    return (jnp.dot(x, params["head"]["kernel"], preferred_element_type=jnp.float32)
            + params["head"]["bias"])


def make_convnext_adapter(cfg: ConvNeXtConfig, params: PyTree) -> ModelAdapter:
    """One stack per stage (``stages.{s}.blocks.{i}.pwconv{1,2}.weight``)."""
    stacks = []
    for si in range(len(cfg.depths)):
        def prepare_inputs(p, batch, si=si):
            x = batch["image"]
            for sj in range(si + 1):
                x = _downsample(sj, p["stages"][sj]["downsample"], x, cfg.ln_eps)
                if sj < si:
                    def body(x, bp):
                        y, _ = convnext_block(cfg, bp, x)
                        return y, None
                    x, _ = tower_scan(body, x, p["stages"][sj]["blocks"])
            return x, None

        def _fwd(bp, x, cache, collect=None):
            return convnext_block(cfg, bp, x, collect)

        stacks.append(make_stack(
            name=f"stages.{si}.blocks",
            num_blocks=cfg.depths[si],
            linear_names=("pwconv1", "pwconv2"),
            per_row_mask=True,
            prepare_inputs=prepare_inputs,
            block_forward=_fwd,
            blocks_path=f"stages.{si}.blocks",
        ))

    def loss_fn(p, batch):
        logits = forward(cfg, p, batch["image"])
        return -jax.nn.log_softmax(logits, axis=-1)[
            jnp.arange(logits.shape[0]), batch["label"]
        ]

    return ModelAdapter(
        name="convnext", params=params, loss_fn=loss_fn, stacks=stacks,
        model_prefixes={s.name: "stages" for s in stacks},
    )
