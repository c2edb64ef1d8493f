"""Checkpoint import/export: reference torch state_dicts <-> jax pytrees.

The reference ships .pth state_dicts (pruned_checkpoint/*.pth,
evaluate_blip.py:438-456) with torch ``(out, in)`` linear weights; our params
are jax ``(in, out)`` kernels with STACKED blocks (one (L, ...) leaf per
parameter kind). Converters here:

* gather ``blocks.{i}.*`` tensors into stacked leaves,
* transpose linears into jax layout,
* reshape Conv2d patch embeds into the matmul layout ``extract_patches``
  expects (flatten (C, ph, pw) then transpose — same pixel order),
* hoist T5's block-0 ``relative_attention_bias`` to stack level,
* and reverse all of it for export, so pruned checkpoints round-trip into
  reference-compatible key naming (incl. the quirks: fused qkv with separate
  q/v biases eva_vit.py:79-85, ``visual.``/``visual_encoder.`` remaps
  wanda_pruner.py:570-585).

All converters take/return dicts of numpy arrays keyed by reference names on
the torch side; use ``load_torch_checkpoint`` / ``save_torch_checkpoint`` for
.pth IO (torch-cpu is available in the image).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

PyTree = Any
StateDict = Dict[str, np.ndarray]


def load_torch_checkpoint(path: str) -> StateDict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def save_torch_checkpoint(state: StateDict, path: str) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}, path)


def _stack(state: StateDict, fmt: str, n: int) -> np.ndarray:
    return np.stack([state[fmt.format(i=i)] for i in range(n)])


def _stack_t(state: StateDict, fmt: str, n: int) -> np.ndarray:
    """Stack torch (out, in) linears into a (L, in, out) kernel leaf."""
    return np.stack([state[fmt.format(i=i)].T for i in range(n)])


def _cast(tree: PyTree, dtype) -> PyTree:
    import jax

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), tree)


# ---------------------------------------------------------------------------
# EVA ViT (eva_vit.py naming; prefix "" for a bare tower, "visual." for
# EVA-CLIP, "visual_encoder." inside BLIP-2 checkpoints)
# ---------------------------------------------------------------------------

def convert_eva_vit(state: StateDict, cfg, prefix: str = "",
                    dtype=jnp.float32) -> PyTree:
    p = prefix
    L = cfg.depth
    conv = state[f"{p}patch_embed.proj.weight"]  # (D, C, ph, pw)
    d = conv.shape[0]
    out = {
        "patch_embed": {
            "kernel": conv.reshape(d, -1).T,  # (C·ph·pw, D), matches extract_patches
            "bias": state[f"{p}patch_embed.proj.bias"],
        },
        "cls_token": state[f"{p}cls_token"],
        "pos_embed": state[f"{p}pos_embed"],
        "blocks": {
            "norm1": {
                "scale": _stack(state, p + "blocks.{i}.norm1.weight", L),
                "bias": _stack(state, p + "blocks.{i}.norm1.bias", L),
            },
            "attn": {
                "qkv": {"kernel": _stack_t(state, p + "blocks.{i}.attn.qkv.weight", L)},
                "proj": {
                    "kernel": _stack_t(state, p + "blocks.{i}.attn.proj.weight", L),
                    "bias": _stack(state, p + "blocks.{i}.attn.proj.bias", L),
                },
            },
            "norm2": {
                "scale": _stack(state, p + "blocks.{i}.norm2.weight", L),
                "bias": _stack(state, p + "blocks.{i}.norm2.bias", L),
            },
            "mlp": {
                "fc1": {
                    "kernel": _stack_t(state, p + "blocks.{i}.mlp.fc1.weight", L),
                    "bias": _stack(state, p + "blocks.{i}.mlp.fc1.bias", L),
                },
                "fc2": {
                    "kernel": _stack_t(state, p + "blocks.{i}.mlp.fc2.weight", L),
                    "bias": _stack(state, p + "blocks.{i}.mlp.fc2.bias", L),
                },
            },
        },
    }
    # qkv bias layout differs by family: EVA keeps separate q_bias/v_bias
    # params (no k bias, eva_vit.py:79-85); timm DeiT/ViT classifiers fuse
    # a full qkv.bias (image_classifiers checkpoints)
    attn = out["blocks"]["attn"]
    if getattr(cfg, "qkv_bias_mode", "eva") == "full":
        attn["qkv"]["bias"] = _stack(state, p + "blocks.{i}.attn.qkv.bias", L)
    else:
        attn["q_bias"] = _stack(state, p + "blocks.{i}.attn.q_bias", L)
        attn["v_bias"] = _stack(state, p + "blocks.{i}.attn.v_bias", L)
    if cfg.final_norm:
        out["norm"] = {"scale": state[f"{p}norm.weight"],
                       "bias": state[f"{p}norm.bias"]}
    if cfg.head_dim:
        out["head"] = {"kernel": state[f"{p}head.weight"].T,
                       "bias": state[f"{p}head.bias"]}
    return _cast(out, dtype)


def export_eva_vit(params: PyTree, cfg, prefix: str = "") -> StateDict:
    p = prefix
    out: StateDict = {}
    pe = np.asarray(params["patch_embed"]["kernel"], np.float32)
    d = pe.shape[1]
    out[f"{p}patch_embed.proj.weight"] = pe.T.reshape(
        d, cfg.in_chans, cfg.patch_size, cfg.patch_size
    )
    out[f"{p}patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["bias"], np.float32)
    out[f"{p}cls_token"] = np.asarray(params["cls_token"], np.float32)
    out[f"{p}pos_embed"] = np.asarray(params["pos_embed"], np.float32)
    b = params["blocks"]
    for i in range(cfg.depth):
        out[f"{p}blocks.{i}.norm1.weight"] = np.asarray(b["norm1"]["scale"][i], np.float32)
        out[f"{p}blocks.{i}.norm1.bias"] = np.asarray(b["norm1"]["bias"][i], np.float32)
        out[f"{p}blocks.{i}.attn.qkv.weight"] = np.asarray(b["attn"]["qkv"]["kernel"][i], np.float32).T
        if "bias" in b["attn"]["qkv"]:  # timm full-bias classifiers
            out[f"{p}blocks.{i}.attn.qkv.bias"] = np.asarray(
                b["attn"]["qkv"]["bias"][i], np.float32)
        else:  # EVA: separate q/v biases, no k bias (eva_vit.py:79-85)
            out[f"{p}blocks.{i}.attn.q_bias"] = np.asarray(b["attn"]["q_bias"][i], np.float32)
            out[f"{p}blocks.{i}.attn.v_bias"] = np.asarray(b["attn"]["v_bias"][i], np.float32)
        out[f"{p}blocks.{i}.attn.proj.weight"] = np.asarray(b["attn"]["proj"]["kernel"][i], np.float32).T
        out[f"{p}blocks.{i}.attn.proj.bias"] = np.asarray(b["attn"]["proj"]["bias"][i], np.float32)
        out[f"{p}blocks.{i}.norm2.weight"] = np.asarray(b["norm2"]["scale"][i], np.float32)
        out[f"{p}blocks.{i}.norm2.bias"] = np.asarray(b["norm2"]["bias"][i], np.float32)
        out[f"{p}blocks.{i}.mlp.fc1.weight"] = np.asarray(b["mlp"]["fc1"]["kernel"][i], np.float32).T
        out[f"{p}blocks.{i}.mlp.fc1.bias"] = np.asarray(b["mlp"]["fc1"]["bias"][i], np.float32)
        out[f"{p}blocks.{i}.mlp.fc2.weight"] = np.asarray(b["mlp"]["fc2"]["kernel"][i], np.float32).T
        out[f"{p}blocks.{i}.mlp.fc2.bias"] = np.asarray(b["mlp"]["fc2"]["bias"][i], np.float32)
    if cfg.final_norm and "norm" in params:
        out[f"{p}norm.weight"] = np.asarray(params["norm"]["scale"], np.float32)
        out[f"{p}norm.bias"] = np.asarray(params["norm"]["bias"], np.float32)
    if cfg.head_dim and "head" in params:
        out[f"{p}head.weight"] = np.asarray(params["head"]["kernel"], np.float32).T
        out[f"{p}head.bias"] = np.asarray(params["head"]["bias"], np.float32)
    return out


# ---------------------------------------------------------------------------
# T5 (HF naming, modeling_t5.py)
# ---------------------------------------------------------------------------

def _convert_t5_stack(state: StateDict, cfg, which: str, dtype) -> Dict[str, Any]:
    enc = which == "encoder"
    L = cfg.num_layers if enc else cfg.num_decoder_layers
    p = f"{which}.block.{{i}}."
    out: Dict[str, Any] = {
        "rel_bias": state[
            f"{which}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ],
        "final_ln": {"scale": state[f"{which}.final_layer_norm.weight"]},
    }
    attn0 = {
        k: {"kernel": _stack_t(state, p + f"layer.0.SelfAttention.{k}.weight", L)}
        for k in ("q", "k", "v", "o")
    }
    if enc:
        out["blocks"] = {
            "ln0": {"scale": _stack(state, p + "layer.0.layer_norm.weight", L)},
            "attn": attn0,
            "ln1": {"scale": _stack(state, p + "layer.1.layer_norm.weight", L)},
            "mlp": {
                k: {"kernel": _stack_t(state, p + f"layer.1.DenseReluDense.{k}.weight", L)}
                for k in ("wi_0", "wi_1", "wo")
            },
        }
    else:
        out["blocks"] = {
            "ln0": {"scale": _stack(state, p + "layer.0.layer_norm.weight", L)},
            "self_attn": attn0,
            "ln1": {"scale": _stack(state, p + "layer.1.layer_norm.weight", L)},
            "cross_attn": {
                k: {"kernel": _stack_t(state, p + f"layer.1.EncDecAttention.{k}.weight", L)}
                for k in ("q", "k", "v", "o")
            },
            "ln2": {"scale": _stack(state, p + "layer.2.layer_norm.weight", L)},
            "mlp": {
                k: {"kernel": _stack_t(state, p + f"layer.2.DenseReluDense.{k}.weight", L)}
                for k in ("wi_0", "wi_1", "wo")
            },
        }
    return out


def convert_t5(state: StateDict, cfg, dtype=jnp.float32) -> PyTree:
    """HF/reference ``t5_model.*``-style state_dict (prefix stripped) -> our
    T5 pytree."""
    out = {
        "shared": state["shared.weight"],
        "encoder": _convert_t5_stack(state, cfg, "encoder", dtype),
        "decoder": _convert_t5_stack(state, cfg, "decoder", dtype),
        "lm_head": {"kernel": state["lm_head.weight"].T},
    }
    return _cast(out, dtype)


def export_t5(params: PyTree, cfg) -> StateDict:
    out: StateDict = {"shared.weight": np.asarray(params["shared"], np.float32)}
    out["lm_head.weight"] = np.asarray(params["lm_head"]["kernel"], np.float32).T
    for which in ("encoder", "decoder"):
        enc = which == "encoder"
        sub = params[which]
        L = cfg.num_layers if enc else cfg.num_decoder_layers
        out[f"{which}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = (
            np.asarray(sub["rel_bias"], np.float32))
        out[f"{which}.final_layer_norm.weight"] = np.asarray(
            sub["final_ln"]["scale"], np.float32)
        b = sub["blocks"]
        attn_key = "attn" if enc else "self_attn"
        for i in range(L):
            out[f"{which}.block.{i}.layer.0.layer_norm.weight"] = np.asarray(
                b["ln0"]["scale"][i], np.float32)
            for k in ("q", "k", "v", "o"):
                out[f"{which}.block.{i}.layer.0.SelfAttention.{k}.weight"] = (
                    np.asarray(b[attn_key][k]["kernel"][i], np.float32).T)
            out[f"{which}.block.{i}.layer.1.layer_norm.weight"] = np.asarray(
                b["ln1"]["scale"][i], np.float32)
            if enc:
                for k in ("wi_0", "wi_1", "wo"):
                    out[f"{which}.block.{i}.layer.1.DenseReluDense.{k}.weight"] = (
                        np.asarray(b["mlp"][k]["kernel"][i], np.float32).T)
            else:
                for k in ("q", "k", "v", "o"):
                    out[f"{which}.block.{i}.layer.1.EncDecAttention.{k}.weight"] = (
                        np.asarray(b["cross_attn"][k]["kernel"][i], np.float32).T)
                out[f"{which}.block.{i}.layer.2.layer_norm.weight"] = np.asarray(
                    b["ln2"]["scale"][i], np.float32)
                for k in ("wi_0", "wi_1", "wo"):
                    out[f"{which}.block.{i}.layer.2.DenseReluDense.{k}.weight"] = (
                        np.asarray(b["mlp"][k]["kernel"][i], np.float32).T)
    return out


# ---------------------------------------------------------------------------
# LLaMA (HF naming)
# ---------------------------------------------------------------------------

def convert_llama(state: StateDict, cfg, dtype=jnp.float32) -> PyTree:
    L = cfg.num_layers
    p = "model.layers.{i}."
    out = {
        "embed_tokens": state["model.embed_tokens.weight"],
        "layers": {
            "input_ln": {"scale": _stack(state, p + "input_layernorm.weight", L)},
            "attn": {
                k: {"kernel": _stack_t(state, p + f"self_attn.{k}_proj.weight", L)}
                for k in ("q", "k", "v", "o")
            },
            "post_ln": {"scale": _stack(state, p + "post_attention_layernorm.weight", L)},
            "mlp": {
                k: {"kernel": _stack_t(state, p + f"mlp.{k}_proj.weight", L)}
                for k in ("gate", "up", "down")
            },
        },
        "norm": {"scale": state["model.norm.weight"]},
        "lm_head": {"kernel": state["lm_head.weight"].T},
    }
    return _cast(out, dtype)


def export_llama(params: PyTree, cfg) -> StateDict:
    out: StateDict = {
        "model.embed_tokens.weight": np.asarray(params["embed_tokens"], np.float32),
        "model.norm.weight": np.asarray(params["norm"]["scale"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"]["kernel"], np.float32).T,
    }
    b = params["layers"]
    for i in range(cfg.num_layers):
        out[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(
            b["input_ln"]["scale"][i], np.float32)
        out[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            b["post_ln"]["scale"][i], np.float32)
        for k in ("q", "k", "v", "o"):
            out[f"model.layers.{i}.self_attn.{k}_proj.weight"] = np.asarray(
                b["attn"][k]["kernel"][i], np.float32).T
        for k in ("gate", "up", "down"):
            out[f"model.layers.{i}.mlp.{k}_proj.weight"] = np.asarray(
                b["mlp"][k]["kernel"][i], np.float32).T
    return out


# ---------------------------------------------------------------------------
# CLIP (OpenAI naming, CoOp/clip/model.py) — visual resblock tower + text
# ---------------------------------------------------------------------------

def _convert_resblocks(state: StateDict, prefix: str, L: int) -> Dict[str, Any]:
    p = prefix + ".resblocks.{i}."
    return {
        "ln_1": {"scale": _stack(state, p + "ln_1.weight", L),
                 "bias": _stack(state, p + "ln_1.bias", L)},
        "attn": {
            "in_proj": {
                "kernel": _stack_t(state, p + "attn.in_proj_weight", L),
                "bias": _stack(state, p + "attn.in_proj_bias", L),
            },
            "out_proj": {
                "kernel": _stack_t(state, p + "attn.out_proj.weight", L),
                "bias": _stack(state, p + "attn.out_proj.bias", L),
            },
        },
        "ln_2": {"scale": _stack(state, p + "ln_2.weight", L),
                 "bias": _stack(state, p + "ln_2.bias", L)},
        "mlp": {
            "c_fc": {"kernel": _stack_t(state, p + "mlp.c_fc.weight", L),
                     "bias": _stack(state, p + "mlp.c_fc.bias", L)},
            "c_proj": {"kernel": _stack_t(state, p + "mlp.c_proj.weight", L),
                       "bias": _stack(state, p + "mlp.c_proj.bias", L)},
        },
    }


def convert_clip(state: StateDict, cfg, dtype=jnp.float32) -> PyTree:
    """OpenAI CLIP state_dict -> our CLIPConfig pytree. Handles both the
    resblock visual tower (cfg.visual) and EVA visual (cfg.eva_visual, keys
    ``visual.*`` in eva_vit naming)."""
    tcfg = cfg.text
    out: Dict[str, Any] = {
        "text": {
            "token_embedding": state["token_embedding.weight"],
            "positional_embedding": state["positional_embedding"],
            "blocks": _convert_resblocks(state, "transformer", tcfg.layers),
            "ln_final": {"scale": state["ln_final.weight"],
                         "bias": state["ln_final.bias"]},
            "text_projection": state["text_projection"],
        },
        "logit_scale": state["logit_scale"],
    }
    if cfg.eva_visual is not None:
        out["visual"] = convert_eva_vit(state, cfg.eva_visual, "visual.", dtype)
    else:
        vcfg = cfg.visual
        conv = state["visual.conv1.weight"]
        d = conv.shape[0]
        out["visual"] = {
            "conv1": {"kernel": conv.reshape(d, -1).T},
            "class_embedding": state["visual.class_embedding"],
            "positional_embedding": state["visual.positional_embedding"],
            "ln_pre": {"scale": state["visual.ln_pre.weight"],
                       "bias": state["visual.ln_pre.bias"]},
            "blocks": _convert_resblocks(state, "visual.transformer", vcfg.layers),
            "ln_post": {"scale": state["visual.ln_post.weight"],
                        "bias": state["visual.ln_post.bias"]},
            "proj": state["visual.proj"],
        }
    return _cast(out, dtype)


# ---------------------------------------------------------------------------
# Q-Former + BLIP-2 composition (blip2_t5 checkpoint naming)
# ---------------------------------------------------------------------------

def convert_qformer(state: StateDict, cfg, prefix: str = "Qformer.bert.",
                    dtype=jnp.float32) -> PyTree:
    def dense(name):
        return {"kernel": state[f"{name}.weight"].T, "bias": state[f"{name}.bias"]}

    def ln(name):
        return {"scale": state[f"{name}.weight"], "bias": state[f"{name}.bias"]}

    layers = []
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layer.{i}."
        layer: Dict[str, Any] = {
            "self_attn": {
                "query": dense(lp + "attention.self.query"),
                "key": dense(lp + "attention.self.key"),
                "value": dense(lp + "attention.self.value"),
                "output": {"dense": dense(lp + "attention.output.dense"),
                           "ln": ln(lp + "attention.output.LayerNorm")},
            },
            "ffn": {
                "intermediate": dense(lp + "intermediate_query.dense"),
                "output": {"dense": dense(lp + "output_query.dense"),
                           "ln": ln(lp + "output_query.LayerNorm")},
            },
        }
        if i % cfg.cross_attention_freq == 0:
            layer["cross_attn"] = {
                "query": dense(lp + "crossattention.self.query"),
                "key": dense(lp + "crossattention.self.key"),
                "value": dense(lp + "crossattention.self.value"),
                "output": {"dense": dense(lp + "crossattention.output.dense"),
                           "ln": ln(lp + "crossattention.output.LayerNorm")},
            }
        layers.append(layer)
    return _cast(
        {"embeddings_ln": ln(prefix + "embeddings.LayerNorm"), "layers": layers},
        dtype,
    )


def export_qformer(params: PyTree, cfg, prefix: str = "Qformer.bert.") -> StateDict:
    """Inverse of convert_qformer — reference BertModel key naming."""
    out: StateDict = {}

    def dense(name, p):
        out[f"{name}.weight"] = np.asarray(p["kernel"], np.float32).T
        out[f"{name}.bias"] = np.asarray(p["bias"], np.float32)

    def ln(name, p):
        out[f"{name}.weight"] = np.asarray(p["scale"], np.float32)
        out[f"{name}.bias"] = np.asarray(p["bias"], np.float32)

    ln(prefix + "embeddings.LayerNorm", params["embeddings_ln"])
    for i, layer in enumerate(params["layers"]):
        lp = f"{prefix}encoder.layer.{i}."
        sa = layer["self_attn"]
        dense(lp + "attention.self.query", sa["query"])
        dense(lp + "attention.self.key", sa["key"])
        dense(lp + "attention.self.value", sa["value"])
        dense(lp + "attention.output.dense", sa["output"]["dense"])
        ln(lp + "attention.output.LayerNorm", sa["output"]["ln"])
        if "cross_attn" in layer:
            ca = layer["cross_attn"]
            dense(lp + "crossattention.self.query", ca["query"])
            dense(lp + "crossattention.self.key", ca["key"])
            dense(lp + "crossattention.self.value", ca["value"])
            dense(lp + "crossattention.output.dense", ca["output"]["dense"])
            ln(lp + "crossattention.output.LayerNorm", ca["output"]["ln"])
        dense(lp + "intermediate_query.dense", layer["ffn"]["intermediate"])
        dense(lp + "output_query.dense", layer["ffn"]["output"]["dense"])
        ln(lp + "output_query.LayerNorm", layer["ffn"]["output"]["ln"])
    return out


def export_blip2(params: PyTree, cfg) -> StateDict:
    """Full Blip2T5 pytree -> reference-named .pth state dict (the
    ``pruned_checkpoint/`` artifact consumers of the reference expect,
    evaluate_blip.py:438-447). Inverse of convert_blip2 — the round trip is
    bit-exact in f32 (tests/test_checkpoint.py; tools/ckpt_drill.py runs it
    at XL shapes on device)."""
    out: StateDict = export_eva_vit(
        params["visual_encoder"], cfg.vit, "visual_encoder.")
    out["ln_vision.weight"] = np.asarray(params["ln_vision"]["scale"], np.float32)
    out["ln_vision.bias"] = np.asarray(params["ln_vision"]["bias"], np.float32)
    out["query_tokens"] = np.asarray(params["query_tokens"], np.float32)
    out.update(export_qformer(params["qformer"], cfg.qformer))
    out["t5_proj.weight"] = np.asarray(params["t5_proj"]["kernel"], np.float32).T
    out["t5_proj.bias"] = np.asarray(params["t5_proj"]["bias"], np.float32)
    for k, v in export_t5(params["t5_model"], cfg.t5).items():
        out[f"t5_model.{k}"] = v
    return out


def convert_blip2(state: StateDict, cfg, dtype=jnp.float32,
                  vit_dtype=None, t5_dtype=None) -> PyTree:
    """Full Blip2T5 checkpoint -> composition pytree. Accepts the reference's
    top-level naming (visual_encoder.*, Qformer.bert.*, query_tokens,
    t5_proj.*, t5_model.*, ln_vision.*)."""
    t5_state = {k[len("t5_model."):]: v for k, v in state.items()
                if k.startswith("t5_model.")}
    return {
        "visual_encoder": convert_eva_vit(
            state, cfg.vit, "visual_encoder.", vit_dtype or dtype),
        "ln_vision": {"scale": jnp.asarray(state["ln_vision.weight"], dtype),
                      "bias": jnp.asarray(state["ln_vision.bias"], dtype)},
        "query_tokens": jnp.asarray(state["query_tokens"], dtype),
        "qformer": convert_qformer(state, cfg.qformer, "Qformer.bert.", dtype),
        "t5_proj": {"kernel": jnp.asarray(state["t5_proj.weight"].T, dtype),
                    "bias": jnp.asarray(state["t5_proj.bias"], dtype)},
        "t5_model": convert_t5(t5_state, cfg.t5, t5_dtype or dtype),
    }


def convert_opt(state: StateDict, cfg, prefix: str = "model.decoder.",
                dtype=jnp.float32) -> PyTree:
    """HF OPT state_dict -> models/opt.py pytree (pre-LN, tied lm_head)."""
    L = cfg.num_layers
    p = prefix + "layers.{i}."

    def attn(k):
        return {
            "kernel": _stack_t(state, p + f"self_attn.{k}_proj.weight", L),
            "bias": _stack(state, p + f"self_attn.{k}_proj.bias", L),
        }

    out = {
        "embed_tokens": state[prefix + "embed_tokens.weight"],
        "embed_positions": state[prefix + "embed_positions.weight"],
        "layers": {
            "ln1": {"scale": _stack(state, p + "self_attn_layer_norm.weight", L),
                    "bias": _stack(state, p + "self_attn_layer_norm.bias", L)},
            "attn": {"q": attn("q"), "k": attn("k"), "v": attn("v"),
                     "o": {"kernel": _stack_t(state, p + "self_attn.out_proj.weight", L),
                           "bias": _stack(state, p + "self_attn.out_proj.bias", L)}},
            "ln2": {"scale": _stack(state, p + "final_layer_norm.weight", L),
                    "bias": _stack(state, p + "final_layer_norm.bias", L)},
            "mlp": {
                "fc1": {"kernel": _stack_t(state, p + "fc1.weight", L),
                        "bias": _stack(state, p + "fc1.bias", L)},
                "fc2": {"kernel": _stack_t(state, p + "fc2.weight", L),
                        "bias": _stack(state, p + "fc2.bias", L)},
            },
        },
        "final_ln": {"scale": state[prefix + "final_layer_norm.weight"],
                     "bias": state[prefix + "final_layer_norm.bias"]},
    }
    return _cast(out, dtype)


def convert_bert_stack(state: StateDict, cfg, prefix: str,
                       dtype=jnp.float32) -> PyTree:
    """BLIP med-BERT tower (``text_decoder.bert.`` / ``text_encoder.bert.``)
    -> models/bert.py pytree. Handles cross-attention when present."""
    L = cfg.num_layers
    p = prefix + "encoder.layer.{i}."

    def dense(sub):
        return {"kernel": _stack_t(state, p + sub + ".weight", L),
                "bias": _stack(state, p + sub + ".bias", L)}

    def ln(sub):
        return {"scale": _stack(state, p + sub + ".weight", L),
                "bias": _stack(state, p + sub + ".bias", L)}

    blocks = {
        "attn": {
            "query": dense("attention.self.query"),
            "key": dense("attention.self.key"),
            "value": dense("attention.self.value"),
            "out": dense("attention.output.dense"),
            "ln": ln("attention.output.LayerNorm"),
        },
        "ffn": {
            "intermediate": dense("intermediate.dense"),
            "out": dense("output.dense"),
            "ln": ln("output.LayerNorm"),
        },
    }
    if cfg.add_cross_attention:
        blocks["cross"] = {
            "query": dense("crossattention.self.query"),
            "key": dense("crossattention.self.key"),
            "value": dense("crossattention.self.value"),
            "out": dense("crossattention.output.dense"),
            "ln": ln("crossattention.output.LayerNorm"),
        }
    out = {
        "embeddings": {
            "word": state[prefix + "embeddings.word_embeddings.weight"],
            "position": state[prefix + "embeddings.position_embeddings.weight"],
            "ln": {"scale": state[prefix + "embeddings.LayerNorm.weight"],
                   "bias": state[prefix + "embeddings.LayerNorm.bias"]},
        },
        "blocks": blocks,
    }
    cls_prefix = prefix.replace("bert.", "cls.")
    if cls_prefix + "predictions.transform.dense.weight" in state:
        out["cls"] = {
            "transform": {
                "kernel": state[cls_prefix + "predictions.transform.dense.weight"].T,
                "bias": state[cls_prefix + "predictions.transform.dense.bias"],
            },
            "transform_ln": {
                "scale": state[cls_prefix + "predictions.transform.LayerNorm.weight"],
                "bias": state[cls_prefix + "predictions.transform.LayerNorm.bias"],
            },
            "decoder_bias": state[cls_prefix + "predictions.bias"],
        }
    return _cast(out, dtype)


def remap_eva_clip_to_blip2(state: StateDict) -> StateDict:
    """``visual.`` -> ``visual_encoder.`` cross-model key remap
    (wanda_pruner.py:570-585)."""
    return {re.sub(r"^visual\.", "visual_encoder.", k): v for k, v in state.items()}


def export_bert_stack(params: PyTree, cfg, prefix: str) -> StateDict:
    """Inverse of convert_bert_stack (BLIP med-BERT key naming)."""
    out: StateDict = {}
    e = params["embeddings"]
    out[prefix + "embeddings.word_embeddings.weight"] = np.asarray(
        e["word"], np.float32)
    out[prefix + "embeddings.position_embeddings.weight"] = np.asarray(
        e["position"], np.float32)
    out[prefix + "embeddings.LayerNorm.weight"] = np.asarray(
        e["ln"]["scale"], np.float32)
    out[prefix + "embeddings.LayerNorm.bias"] = np.asarray(
        e["ln"]["bias"], np.float32)
    b = params["blocks"]

    def dense(i, sub, p):
        out[f"{prefix}encoder.layer.{i}.{sub}.weight"] = np.asarray(
            p["kernel"][i], np.float32).T
        out[f"{prefix}encoder.layer.{i}.{sub}.bias"] = np.asarray(
            p["bias"][i], np.float32)

    def ln(i, sub, p):
        out[f"{prefix}encoder.layer.{i}.{sub}.weight"] = np.asarray(
            p["scale"][i], np.float32)
        out[f"{prefix}encoder.layer.{i}.{sub}.bias"] = np.asarray(
            p["bias"][i], np.float32)

    for i in range(cfg.num_layers):
        dense(i, "attention.self.query", b["attn"]["query"])
        dense(i, "attention.self.key", b["attn"]["key"])
        dense(i, "attention.self.value", b["attn"]["value"])
        dense(i, "attention.output.dense", b["attn"]["out"])
        ln(i, "attention.output.LayerNorm", b["attn"]["ln"])
        if "cross" in b and "query1" not in b["cross"]:
            dense(i, "crossattention.self.query", b["cross"]["query"])
            dense(i, "crossattention.self.key", b["cross"]["key"])
            dense(i, "crossattention.self.value", b["cross"]["value"])
            dense(i, "crossattention.output.dense", b["cross"]["out"])
            ln(i, "crossattention.output.LayerNorm", b["cross"]["ln"])
        elif "cross" in b:  # NLVR twin streams (nlvr_encoder.py:262-268)
            cp = b["cross"]
            dense(i, "crossattention.self0.query", cp["query"])
            dense(i, "crossattention.self0.key", cp["key"])
            dense(i, "crossattention.self0.value", cp["value"])
            dense(i, "crossattention.self1.query", cp["query1"])
            dense(i, "crossattention.self1.key", cp["key1"])
            dense(i, "crossattention.self1.value", cp["value1"])
            dense(i, "crossattention.output.dense0", cp["out"])
            dense(i, "crossattention.output.dense1", cp["out1"])
            ln(i, "crossattention.output.LayerNorm", cp["ln"])
            if float(np.asarray(cp["merge_on"][i]).reshape(())) > 0:
                # merge_layer modules only exist for layers >= 6 in the
                # reference; averaged layers have no keys to emit
                dense(i, "crossattention.output.merge_layer", cp["merge"])
        dense(i, "intermediate.dense", b["ffn"]["intermediate"])
        dense(i, "output.dense", b["ffn"]["out"])
        ln(i, "output.LayerNorm", b["ffn"]["ln"])
    if "cls" in params:
        cls_prefix = prefix.replace("bert.", "cls.")
        c = params["cls"]
        out[cls_prefix + "predictions.transform.dense.weight"] = np.asarray(
            c["transform"]["kernel"], np.float32).T
        out[cls_prefix + "predictions.transform.dense.bias"] = np.asarray(
            c["transform"]["bias"], np.float32)
        out[cls_prefix + "predictions.transform.LayerNorm.weight"] = np.asarray(
            c["transform_ln"]["scale"], np.float32)
        out[cls_prefix + "predictions.transform.LayerNorm.bias"] = np.asarray(
            c["transform_ln"]["bias"], np.float32)
        out[cls_prefix + "predictions.bias"] = np.asarray(
            c["decoder_bias"], np.float32)
        # tied decoder (med.py BertLMPredictionHead: decoder.weight is the
        # word embedding; HF state_dicts carry it explicitly)
        out[cls_prefix + "predictions.decoder.weight"] = np.asarray(
            e["word"], np.float32)
        out[cls_prefix + "predictions.decoder.bias"] = np.asarray(
            c["decoder_bias"], np.float32)
    return out


def _convert_nlvr_text(state: StateDict, cfg, prefix: str,
                       dtype=jnp.float32) -> PyTree:
    """NLVR twin-cross text tower (nlvr_encoder.py). Handles both trained
    NLVR checkpoints (self0/self1/dense0/dense1/merge_layer keys) and BASE
    BLIP checkpoints, where blip_nlvr.load_checkpoint (:388-398) duplicates
    the single-stream crossattention keys into both twins."""
    st = dict(state)
    for k in list(st):
        if ".crossattention.self." in k:
            st.setdefault(k.replace(".self.", ".self0."), st[k])
            st.setdefault(k.replace(".self.", ".self1."), st[k])
        elif ".crossattention.output.dense." in k:
            st.setdefault(k.replace(".dense.", ".dense0."), st[k])
            st.setdefault(k.replace(".dense.", ".dense1."), st[k])
    # alias stream0 onto the single-stream names convert_bert_stack reads
    for k in list(st):
        if ".crossattention.self0." in k:
            st.setdefault(k.replace(".self0.", ".self."), st[k])
        elif ".crossattention.output.dense0." in k:
            st.setdefault(k.replace(".dense0.", ".dense."), st[k])
    out = convert_bert_stack(st, cfg, prefix, dtype)
    L = cfg.num_layers
    p = prefix + "encoder.layer.{i}."
    cp = out["blocks"]["cross"]

    def dense(sub):
        return _cast({"kernel": _stack_t(st, p + sub + ".weight", L),
                      "bias": _stack(st, p + sub + ".bias", L)}, dtype)

    cp["query1"] = dense("crossattention.self1.query")
    cp["key1"] = dense("crossattention.self1.key")
    cp["value1"] = dense("crossattention.self1.value")
    cp["out1"] = dense("crossattention.output.dense1")
    # merge_layer exists only for layers >= 6 (nlvr_encoder.py:240-243);
    # averaged layers zero-fill (never used: merge_on gates them off)
    d = cfg.hidden_size
    mk, mb = [], []
    for i in range(L):
        wkey = f"{prefix}encoder.layer.{i}.crossattention.output.merge_layer.weight"
        if wkey in st:
            mk.append(np.asarray(st[wkey], np.float32).T)
            mb.append(np.asarray(
                st[wkey.replace(".weight", ".bias")], np.float32))
        else:
            mk.append(np.zeros((2 * d, d), np.float32))
            mb.append(np.zeros((d,), np.float32))
    cp["merge"] = _cast({"kernel": np.stack(mk), "bias": np.stack(mb)}, dtype)
    cp["merge_on"] = jnp.asarray(
        (np.arange(L) >= min(6, L - 1)).astype(np.float32)[:, None], dtype)
    return out


def _linear(state: StateDict, name: str, dtype) -> PyTree:
    return {"kernel": jnp.asarray(state[f"{name}.weight"].T, dtype),
            "bias": jnp.asarray(state[f"{name}.bias"], dtype)}


def convert_blip1(state: StateDict, cfg, kind: str, init: PyTree,
                  dtype=jnp.float32) -> PyTree:
    """UPop BLIP torch checkpoint -> task-model pytree.

    Mirrors the reference loaders (``UPop/models/blip.py:439``
    load_checkpoint + per-task variants): ``load_state_dict(strict=False)``
    semantics — components present in the checkpoint are imported, components
    the checkpoint lacks (e.g. a base caption checkpoint feeding the
    retrieval model's itm_head, or NLVR's cls_head) keep their values from
    ``init``. Momentum (*_m) shadows and ``temp`` are eval-time EMA state the
    functional rebuild does not carry.

    Key layouts per kind:
      blip_caption   visual_encoder.* + text_decoder.bert.* (+ cls)
      blip_vqa       + text_encoder.* (BertModel, NO .bert. segment)
      blip_nlvr      text_encoder.* twin cross (self0/self1/dense0/dense1/
                     merge_layer for layers >= 6) + cls_head.{0,2}
      blip_retrieval text_encoder.* + vision_proj/text_proj/itm_head
    """
    import jax as _jax

    out = _jax.tree_util.tree_map(lambda x: x, init)
    out["visual_encoder"] = convert_eva_vit(
        state, cfg.vit, "visual_encoder.", dtype)

    def graft_cls(tree, converted):
        # BertModel towers have no cls head in the checkpoint; keep init's
        # (unused by the encoder forward) so the pytree structure is stable
        if "cls" not in converted and "cls" in tree:
            converted["cls"] = tree["cls"]
        return converted

    from ecoflap_tpu.models import bert as bert_mod

    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False})
    if kind == "blip_caption":
        out["text_decoder"] = convert_bert_stack(
            state, cfg.text, "text_decoder.bert.", dtype)
    elif kind == "blip_vqa":
        out["text_encoder"] = graft_cls(out["text_encoder"], convert_bert_stack(
            state, enc_cfg, "text_encoder.", dtype))
        out["text_decoder"] = convert_bert_stack(
            state, cfg.text, "text_decoder.bert.", dtype)
    elif kind == "blip_nlvr":
        out["text_encoder"] = graft_cls(
            out["text_encoder"],
            _convert_nlvr_text(state, enc_cfg, "text_encoder.", dtype))
        if "cls_head.0.weight" in state:
            out["cls_head"] = {"dense": _linear(state, "cls_head.0", dtype),
                               "out": _linear(state, "cls_head.2", dtype)}
    elif kind == "blip_retrieval":
        out["text_encoder"] = graft_cls(out["text_encoder"], convert_bert_stack(
            state, enc_cfg, "text_encoder.", dtype))
        for head in ("vision_proj", "text_proj", "itm_head"):
            if f"{head}.weight" in state:
                out[head] = _linear(state, head, dtype)
    else:
        raise ValueError(f"unknown BLIP-1 kind {kind!r}")
    if kind in ("blip_caption", "blip_vqa"):
        for head in ("vision_proj", "text_proj"):
            if f"{head}.weight" in state and head in out:
                out[head] = _linear(state, head, dtype)
    return out


def export_blip1(params: PyTree, cfg, kind: str) -> StateDict:
    """Task-model pytree -> reference-named torch state dict (the UPop
    ``--pretrained``-compatible artifact; inverse of convert_blip1)."""
    from ecoflap_tpu.models import bert as bert_mod

    out = export_eva_vit(params["visual_encoder"], cfg.vit, "visual_encoder.")
    enc_cfg = bert_mod.BertConfig(**{**cfg.text.__dict__, "causal": False})
    if kind == "blip_caption":
        out.update(export_bert_stack(params["text_decoder"], cfg.text,
                                     "text_decoder.bert."))
    elif kind == "blip_vqa":
        enc = dict(params["text_encoder"])
        enc.pop("cls", None)  # BertModel: no prediction head in checkpoints
        out.update(export_bert_stack(enc, enc_cfg, "text_encoder."))
        out.update(export_bert_stack(params["text_decoder"], cfg.text,
                                     "text_decoder.bert."))
    elif kind == "blip_nlvr":
        enc = dict(params["text_encoder"])
        enc.pop("cls", None)
        out.update(export_bert_stack(enc, enc_cfg, "text_encoder."))
        out["cls_head.0.weight"] = np.asarray(
            params["cls_head"]["dense"]["kernel"], np.float32).T
        out["cls_head.0.bias"] = np.asarray(
            params["cls_head"]["dense"]["bias"], np.float32)
        out["cls_head.2.weight"] = np.asarray(
            params["cls_head"]["out"]["kernel"], np.float32).T
        out["cls_head.2.bias"] = np.asarray(
            params["cls_head"]["out"]["bias"], np.float32)
    elif kind == "blip_retrieval":
        enc = dict(params["text_encoder"])
        enc.pop("cls", None)
        out.update(export_bert_stack(enc, enc_cfg, "text_encoder."))
        for head in ("vision_proj", "text_proj", "itm_head"):
            out[f"{head}.weight"] = np.asarray(
                params[head]["kernel"], np.float32).T
            out[f"{head}.bias"] = np.asarray(params[head]["bias"], np.float32)
    else:
        raise ValueError(f"unknown BLIP-1 kind {kind!r}")
    if kind == "blip_caption":
        for head in ("vision_proj", "text_proj"):
            if head in params:
                out[f"{head}.weight"] = np.asarray(
                    params[head]["kernel"], np.float32).T
                out[f"{head}.bias"] = np.asarray(
                    params[head]["bias"], np.float32)
    return out


# ---------------------------------------------------------------------------
# BLIP2-OPT composite (blip2_opt.py:55-94 attribute names)
# ---------------------------------------------------------------------------

def convert_blip2_opt(state: StateDict, cfg, dtype=jnp.float32,
                      vit_dtype=None, opt_dtype=None) -> PyTree:
    """Full Blip2OPT checkpoint -> composition pytree. Reference top-level
    naming: visual_encoder.*, ln_vision.*, query_tokens, Qformer.bert.*,
    opt_proj.*, opt_model.model.decoder.* (lm_head is tied to embed_tokens
    and ignored on import)."""
    return {
        "visual_encoder": convert_eva_vit(
            state, cfg.vit, "visual_encoder.", vit_dtype or dtype),
        "ln_vision": {"scale": jnp.asarray(state["ln_vision.weight"], dtype),
                      "bias": jnp.asarray(state["ln_vision.bias"], dtype)},
        "query_tokens": jnp.asarray(state["query_tokens"], dtype),
        "qformer": convert_qformer(state, cfg.qformer, "Qformer.bert.", dtype),
        "opt_proj": _linear(state, "opt_proj", dtype),
        "opt_model": convert_opt(state, cfg.opt, "opt_model.model.decoder.",
                                 opt_dtype or dtype),
    }


def export_opt(params: PyTree, cfg, prefix: str = "model.decoder.") -> StateDict:
    """Inverse of convert_opt (HF OPT decoder naming; lm_head emitted tied)."""
    out: StateDict = {
        prefix + "embed_tokens.weight": np.asarray(
            params["embed_tokens"], np.float32),
        prefix + "embed_positions.weight": np.asarray(
            params["embed_positions"], np.float32),
        prefix + "final_layer_norm.weight": np.asarray(
            params["final_ln"]["scale"], np.float32),
        prefix + "final_layer_norm.bias": np.asarray(
            params["final_ln"]["bias"], np.float32),
    }
    b = params["layers"]
    for i in range(cfg.num_layers):
        p = f"{prefix}layers.{i}."
        out[p + "self_attn_layer_norm.weight"] = np.asarray(
            b["ln1"]["scale"][i], np.float32)
        out[p + "self_attn_layer_norm.bias"] = np.asarray(
            b["ln1"]["bias"][i], np.float32)
        for k in ("q", "k", "v"):
            out[p + f"self_attn.{k}_proj.weight"] = np.asarray(
                b["attn"][k]["kernel"][i], np.float32).T
            out[p + f"self_attn.{k}_proj.bias"] = np.asarray(
                b["attn"][k]["bias"][i], np.float32)
        out[p + "self_attn.out_proj.weight"] = np.asarray(
            b["attn"]["o"]["kernel"][i], np.float32).T
        out[p + "self_attn.out_proj.bias"] = np.asarray(
            b["attn"]["o"]["bias"][i], np.float32)
        out[p + "final_layer_norm.weight"] = np.asarray(
            b["ln2"]["scale"][i], np.float32)
        out[p + "final_layer_norm.bias"] = np.asarray(
            b["ln2"]["bias"][i], np.float32)
        for k in ("fc1", "fc2"):
            out[p + f"{k}.weight"] = np.asarray(
                b["mlp"][k]["kernel"][i], np.float32).T
            out[p + f"{k}.bias"] = np.asarray(
                b["mlp"][k]["bias"][i], np.float32)
    return out


def export_blip2_opt(params: PyTree, cfg) -> StateDict:
    """Inverse of convert_blip2_opt (reference pruned_checkpoint contract)."""
    out = export_eva_vit(params["visual_encoder"], cfg.vit, "visual_encoder.")
    out["ln_vision.weight"] = np.asarray(params["ln_vision"]["scale"], np.float32)
    out["ln_vision.bias"] = np.asarray(params["ln_vision"]["bias"], np.float32)
    out["query_tokens"] = np.asarray(params["query_tokens"], np.float32)
    out.update(export_qformer(params["qformer"], cfg.qformer))
    out["opt_proj.weight"] = np.asarray(
        params["opt_proj"]["kernel"], np.float32).T
    out["opt_proj.bias"] = np.asarray(params["opt_proj"]["bias"], np.float32)
    out.update(export_opt(params["opt_model"], cfg.opt,
                          "opt_model.model.decoder."))
    out["opt_model.lm_head.weight"] = np.asarray(
        params["opt_model"]["embed_tokens"], np.float32)  # tied (OPT default)
    return out


# ---------------------------------------------------------------------------
# ConvNeXt (LLaMA/image_classifiers/models/convnext.py FB naming)
# ---------------------------------------------------------------------------

def convert_convnext(state: StateDict, cfg, dtype=jnp.float32) -> PyTree:
    """FB/timm ConvNeXt state_dict -> models/classifiers.py pytree.

    Key layout (convnext.py:76-104): downsample_layers.0 = [stem conv 4x4,
    LN]; downsample_layers.i>=1 = [LN, conv 2x2]; stages.{s}.{b}.{dwconv,
    norm, pwconv1, pwconv2, gamma}; final norm + head. Convs flatten to the
    extract_patches matmul layout ((C, ph, pw) order); the depthwise 7x7
    becomes (7, 7, C)."""
    stages = []
    for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        p = f"stages.{si}.{{i}}."

        def dense(sub, d=depth, pp=p):
            return {"kernel": _stack_t(state, pp + sub + ".weight", d),
                    "bias": _stack(state, pp + sub + ".bias", d)}

        dw = np.stack([
            np.transpose(state[p.format(i=i) + "dwconv.weight"][:, 0],
                         (1, 2, 0))
            for i in range(depth)
        ])  # torch (C,1,7,7) -> (7,7,C)
        blocks = {
            "dwconv": {"kernel": dw,
                       "bias": _stack(state, p + "dwconv.bias", depth)},
            "norm": {"scale": _stack(state, p + "norm.weight", depth),
                     "bias": _stack(state, p + "norm.bias", depth)},
            "pwconv1": dense("pwconv1"),
            "pwconv2": dense("pwconv2"),
            "gamma": _stack(state, p + "gamma", depth),
        }
        dp = f"downsample_layers.{si}."
        if si == 0:
            conv = state[dp + "0.weight"]  # (D, 3, 4, 4)
            down = {
                "conv": {"kernel": conv.reshape(conv.shape[0], -1).T,
                         "bias": state[dp + "0.bias"]},
                "norm": {"scale": state[dp + "1.weight"],
                         "bias": state[dp + "1.bias"]},
            }
        else:
            conv = state[dp + "1.weight"]  # (D, prev, 2, 2)
            down = {
                "norm": {"scale": state[dp + "0.weight"],
                         "bias": state[dp + "0.bias"]},
                "conv": {"kernel": conv.reshape(conv.shape[0], -1).T,
                         "bias": state[dp + "1.bias"]},
            }
        stages.append({"downsample": down, "blocks": blocks})
    out = {
        "stages": stages,
        "norm": {"scale": state["norm.weight"], "bias": state["norm.bias"]},
        "head": {"kernel": state["head.weight"].T, "bias": state["head.bias"]},
    }
    return _cast(out, dtype)


def export_convnext(params: PyTree, cfg) -> StateDict:
    """Inverse of convert_convnext."""
    out: StateDict = {
        "norm.weight": np.asarray(params["norm"]["scale"], np.float32),
        "norm.bias": np.asarray(params["norm"]["bias"], np.float32),
        "head.weight": np.asarray(params["head"]["kernel"], np.float32).T,
        "head.bias": np.asarray(params["head"]["bias"], np.float32),
    }
    for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        st = params["stages"][si]
        dp = f"downsample_layers.{si}."
        down = st["downsample"]
        if si == 0:
            k = np.asarray(down["conv"]["kernel"], np.float32)
            out[dp + "0.weight"] = k.T.reshape(cfg.dims[0], 3, 4, 4)
            out[dp + "0.bias"] = np.asarray(down["conv"]["bias"], np.float32)
            out[dp + "1.weight"] = np.asarray(down["norm"]["scale"], np.float32)
            out[dp + "1.bias"] = np.asarray(down["norm"]["bias"], np.float32)
        else:
            out[dp + "0.weight"] = np.asarray(down["norm"]["scale"], np.float32)
            out[dp + "0.bias"] = np.asarray(down["norm"]["bias"], np.float32)
            k = np.asarray(down["conv"]["kernel"], np.float32)
            out[dp + "1.weight"] = k.T.reshape(dim, cfg.dims[si - 1], 2, 2)
            out[dp + "1.bias"] = np.asarray(down["conv"]["bias"], np.float32)
        b = st["blocks"]
        for i in range(depth):
            p = f"stages.{si}.{i}."
            out[p + "dwconv.weight"] = np.transpose(
                np.asarray(b["dwconv"]["kernel"][i], np.float32),
                (2, 0, 1))[:, None]
            out[p + "dwconv.bias"] = np.asarray(b["dwconv"]["bias"][i], np.float32)
            out[p + "norm.weight"] = np.asarray(b["norm"]["scale"][i], np.float32)
            out[p + "norm.bias"] = np.asarray(b["norm"]["bias"][i], np.float32)
            for sub in ("pwconv1", "pwconv2"):
                out[p + sub + ".weight"] = np.asarray(
                    b[sub]["kernel"][i], np.float32).T
                out[p + sub + ".bias"] = np.asarray(
                    b[sub]["bias"][i], np.float32)
            out[p + "gamma"] = np.asarray(b["gamma"][i], np.float32)
    return out
