"""Converter matrix for the round-5 additions: UPop BLIP (all four task
models), the BLIP2-OPT composite, and ConvNeXt.

Naming ground truth: UPop/models/blip.py:439 (load_checkpoint),
blip_nlvr.py:372-400 (twin-stream key duplication),
LAVIS blip2_opt.py:55-94 (composite attribute names),
LLaMA/image_classifiers/models/convnext.py:27-104 (FB naming).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.core.pytree import flatten_named
from ecoflap_tpu.models import blip1
from ecoflap_tpu.utils import checkpoint as ckpt


def _assert_tree_close(a, b, skip=()):
    fa, fb = flatten_named(a), flatten_named(b)
    assert set(fa) == set(fb)
    for k in fa:
        if any(s in k for s in skip):
            continue
        np.testing.assert_allclose(np.asarray(fa[k], np.float32),
                                   np.asarray(fb[k], np.float32),
                                   rtol=1e-6, err_msg=k)


INITS = {
    "blip_caption": blip1.init_params,
    "blip_vqa": blip1.init_vqa_params,
    "blip_nlvr": blip1.init_nlvr_params,
    "blip_retrieval": blip1.init_retrieval_params,
}


@pytest.mark.parametrize("kind", sorted(INITS))
def test_blip1_roundtrip(kind):
    cfg = blip1.tiny_config()
    params = INITS[kind](cfg, jax.random.PRNGKey(0))
    state = ckpt.export_blip1(params, cfg, kind)
    fresh = INITS[kind](cfg, jax.random.PRNGKey(1))
    back = ckpt.convert_blip1(state, cfg, kind, fresh)
    # BertModel towers carry no prediction head in checkpoints, so the
    # (unused) text_encoder.cls stays at the fresh init (strict=False);
    # NLVR merge_layer modules only exist for merged layers in the
    # reference — averaged layers' (unused) merge slots zero-fill on import
    skip = ("text_encoder.cls",)
    if kind == "blip_nlvr":
        skip += ("cross.merge",)
    _assert_tree_close(params, back, skip=skip)
    if kind == "blip_nlvr":
        cp = back["text_encoder"]["blocks"]["cross"]
        flags = np.asarray(cp["merge_on"]).reshape(-1)
        orig = np.asarray(
            params["text_encoder"]["blocks"]["cross"]["merge"]["kernel"])
        got = np.asarray(cp["merge"]["kernel"])
        for i, f in enumerate(flags):
            if f > 0:  # merged layers round-trip exactly
                np.testing.assert_allclose(got[i], orig[i], rtol=1e-6)
            else:  # averaged layers have no reference keys -> zero-filled
                assert not got[i].any()


def test_blip1_reference_key_naming():
    cfg = blip1.tiny_config()

    cap = ckpt.export_blip1(
        blip1.init_params(cfg, jax.random.PRNGKey(0)), cfg, "blip_caption")
    for k in [
        "visual_encoder.blocks.0.attn.qkv.weight",
        "visual_encoder.blocks.0.attn.qkv.bias",  # timm full bias, not EVA
        "text_decoder.bert.encoder.layer.0.attention.self.query.weight",
        "text_decoder.bert.encoder.layer.1.crossattention.output.dense.weight",
        "text_decoder.cls.predictions.transform.dense.weight",
        "text_decoder.cls.predictions.decoder.weight",
        "text_decoder.bert.embeddings.word_embeddings.weight",
        "vision_proj.weight", "text_proj.weight",
    ]:
        assert k in cap, k

    nlvr = ckpt.export_blip1(
        blip1.init_nlvr_params(cfg, jax.random.PRNGKey(0)), cfg, "blip_nlvr")
    for k in [
        "text_encoder.encoder.layer.0.crossattention.self0.query.weight",
        "text_encoder.encoder.layer.0.crossattention.self1.value.weight",
        "text_encoder.encoder.layer.0.crossattention.output.dense0.weight",
        "text_encoder.encoder.layer.0.crossattention.output.dense1.weight",
        "cls_head.0.weight", "cls_head.2.weight",
    ]:
        assert k in nlvr, k
    # BertModel tower: no .bert. segment, no prediction head
    assert not any(".bert." in k or "predictions" in k for k in nlvr)
    # tiny L=2: layer 0 averages (no merge module), layer 1 merges
    assert ("text_encoder.encoder.layer.0.crossattention.output."
            "merge_layer.weight") not in nlvr
    assert ("text_encoder.encoder.layer.1.crossattention.output."
            "merge_layer.weight") in nlvr

    ret = ckpt.export_blip1(
        blip1.init_retrieval_params(cfg, jax.random.PRNGKey(0)), cfg,
        "blip_retrieval")
    for k in ["itm_head.weight", "vision_proj.weight", "text_proj.weight",
              "text_encoder.encoder.layer.0.crossattention.self.query.weight"]:
        assert k in ret, k


def test_blip1_base_checkpoint_into_nlvr():
    """Loading a BASE (caption-layout) checkpoint into the NLVR model must
    duplicate the single-stream cross weights into both twins
    (blip_nlvr.py load_checkpoint:388-398) and keep the cls_head init
    (strict=False: head missing from the checkpoint)."""
    cfg = blip1.tiny_config()
    cap_params = blip1.init_params(cfg, jax.random.PRNGKey(0))
    state = ckpt.export_blip1(cap_params, cfg, "blip_caption")
    # NLVR loads the base tower under text_encoder.* (BLIP_NLVR init copies
    # the pretrain text encoder); emulate the published nlvr base ckpt by
    # renaming the decoder tower
    state = {k.replace("text_decoder.bert.", "text_encoder.")
             .replace("text_decoder.cls.", "text_encoder_cls_dropped."): v
             for k, v in state.items()}
    init = blip1.init_nlvr_params(cfg, jax.random.PRNGKey(1))
    out = ckpt.convert_blip1(state, cfg, "blip_nlvr", init)
    cp = out["text_encoder"]["blocks"]["cross"]
    np.testing.assert_allclose(np.asarray(cp["query"]["kernel"]),
                               np.asarray(cp["query1"]["kernel"]))
    np.testing.assert_allclose(np.asarray(cp["out"]["kernel"]),
                               np.asarray(cp["out1"]["kernel"]))
    # head kept from init (strict=False)
    np.testing.assert_allclose(
        np.asarray(out["cls_head"]["dense"]["kernel"]),
        np.asarray(init["cls_head"]["dense"]["kernel"]))
    # the imported model runs
    rng = np.random.default_rng(0)
    n, s, img = 2, 6, cfg.vit.img_size
    b = {
        "image0": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "image1": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, s)), jnp.int32),
        "text_mask": jnp.ones((n, s), jnp.int32),
    }
    logits = blip1.nlvr_forward(cfg, out, b)
    assert logits.shape == (n, 2)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_zoo_blip1_ckpt_path(tmp_path):
    """--ckpt through load_model: base caption .pth -> blip_caption params."""
    from ecoflap_tpu.models import zoo

    cfg = blip1.tiny_config()
    params = blip1.init_params(cfg, jax.random.PRNGKey(0))
    state = ckpt.export_blip1(params, cfg, "blip_caption")
    path = str(tmp_path / "blip_base.pth")
    ckpt.save_torch_checkpoint(state, path)
    bundle = zoo.load_model("blip_caption", "tiny", ckpt=path,
                            dtype=jnp.float32)
    _assert_tree_close(params, bundle.params)


def test_blip2_opt_roundtrip_and_keys(tmp_path):
    from ecoflap_tpu.models import blip2_opt, zoo

    cfg = blip2_opt.tiny_config()
    params = blip2_opt.init_params(cfg, jax.random.PRNGKey(0))
    state = ckpt.export_blip2_opt(params, cfg)
    for k in [
        "visual_encoder.blocks.0.attn.qkv.weight",
        "visual_encoder.blocks.0.attn.q_bias",
        "ln_vision.weight", "query_tokens",
        "Qformer.bert.encoder.layer.0.attention.self.query.weight",
        "opt_proj.weight",
        "opt_model.model.decoder.embed_tokens.weight",
        "opt_model.model.decoder.layers.0.self_attn.q_proj.weight",
        "opt_model.model.decoder.layers.0.fc1.weight",
        "opt_model.lm_head.weight",
    ]:
        assert k in state, k
    back = ckpt.convert_blip2_opt(state, cfg)
    _assert_tree_close(params, back)

    path = str(tmp_path / "blip2_opt.pth")
    ckpt.save_torch_checkpoint(state, path)
    bundle = zoo.load_model("blip2_opt", "tiny", ckpt=path, dtype=jnp.float32)
    _assert_tree_close(params, bundle.params)


def test_convnext_roundtrip_and_keys():
    from ecoflap_tpu.models import classifiers

    cfg = classifiers.tiny_config()
    params = classifiers.init_params(cfg, jax.random.PRNGKey(0))
    state = ckpt.export_convnext(params, cfg)
    for k in [
        "downsample_layers.0.0.weight",  # stem conv
        "downsample_layers.0.1.weight",  # stem LN
        "downsample_layers.1.0.weight",  # LN before 2x2 conv
        "downsample_layers.1.1.weight",
        "stages.0.0.dwconv.weight", "stages.0.0.norm.weight",
        "stages.0.0.pwconv1.weight", "stages.0.0.pwconv2.weight",
        "stages.0.0.gamma",
        "norm.weight", "head.weight",
    ]:
        assert k in state, k
    assert state["stages.0.0.dwconv.weight"].shape == (
        cfg.dims[0], 1, 7, 7)
    assert state["downsample_layers.0.0.weight"].shape == (
        cfg.dims[0], 3, 4, 4)
    back = ckpt.convert_convnext(state, cfg)
    _assert_tree_close(params, back)


def test_convnext_forward_matches_torch():
    """The imported weights must compute the reference function: compare our
    forward against an equivalent torch ConvNeXt built from the same
    state_dict (architecture per convnext.py:14-123 — dwconv7 -> LN ->
    pwconv1 -> GELU -> pwconv2 -> gamma, stem conv4x4+LN, LN+conv2x2
    downsample, GAP -> LN -> head)."""
    import torch
    import torch.nn as nn

    from ecoflap_tpu.models import classifiers

    cfg = classifiers.tiny_config()
    params = classifiers.init_params(cfg, jax.random.PRNGKey(2))
    state = ckpt.export_convnext(params, cfg)

    class TorchBlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = nn.LayerNorm(dim, eps=cfg.ln_eps)
            self.pwconv1 = nn.Linear(dim, 4 * dim)
            self.pwconv2 = nn.Linear(4 * dim, dim)
            self.gamma = nn.Parameter(torch.ones(dim))

        def forward(self, x):  # x: NCHW
            inp = x
            x = self.dwconv(x).permute(0, 2, 3, 1)
            x = self.norm(x)
            x = self.pwconv2(torch.nn.functional.gelu(self.pwconv1(x)))
            x = (self.gamma * x).permute(0, 3, 1, 2)
            return inp + x

    class TorchConvNeXt(nn.Module):
        def __init__(self):
            super().__init__()
            self.downsample_layers = nn.ModuleList()
            stem = nn.Sequential(
                nn.Conv2d(3, cfg.dims[0], 4, stride=4),
                TorchLN(cfg.dims[0]))
            self.downsample_layers.append(stem)
            for i in range(1, len(cfg.dims)):
                self.downsample_layers.append(nn.Sequential(
                    TorchLN(cfg.dims[i - 1]),
                    nn.Conv2d(cfg.dims[i - 1], cfg.dims[i], 2, stride=2)))
            self.stages = nn.ModuleList(
                nn.Sequential(*[TorchBlock(d) for _ in range(n)])
                for n, d in zip(cfg.depths, cfg.dims))
            self.norm = nn.LayerNorm(cfg.dims[-1], eps=cfg.ln_eps)
            self.head = nn.Linear(cfg.dims[-1], cfg.num_classes)

        def forward(self, x):
            for down, stage in zip(self.downsample_layers, self.stages):
                x = stage(down(x))
            return self.head(self.norm(x.mean([-2, -1])))

    class TorchLN(nn.Module):  # channels-first LN wrapper
        def __init__(self, dim):
            super().__init__()
            self.ln = nn.LayerNorm(dim, eps=cfg.ln_eps)

        def forward(self, x):
            return self.ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    tm = TorchConvNeXt()
    remap = {}
    for k, v in state.items():
        tk = k
        if ".dwconv." in k or ".norm." in k or ".pwconv" in k or k.endswith("gamma"):
            if k.startswith("stages."):
                pass  # stages.{s}.{b}.X matches nn.Sequential indexing
        if k.startswith("downsample_layers.") and ".1." in k and not k.startswith("downsample_layers.0"):
            tk = k.replace(".0.weight", ".0.ln.weight").replace(
                ".0.bias", ".0.ln.bias")
        if k.startswith("downsample_layers.0.1."):
            tk = k.replace("downsample_layers.0.1.",
                           "downsample_layers.0.1.ln.")
        elif k.startswith("downsample_layers.") and k.split(".")[2] == "0" \
                and not k.startswith("downsample_layers.0."):
            tk = k.replace(".0.weight", ".0.ln.weight").replace(
                ".0.bias", ".0.ln.bias")
        remap[tk] = torch.from_numpy(np.asarray(v))
    missing, unexpected = tm.load_state_dict(remap, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    ours = np.asarray(classifiers.forward(cfg, params, jnp.asarray(img)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
