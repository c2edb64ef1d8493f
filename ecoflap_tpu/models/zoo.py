"""Model zoo: registry-registered families + ``load_model_and_preprocess``.

The reference's headline public API is one call
(``lavis.models.load_model_and_preprocess(name, model_type, is_eval,
device)``, LAVIS/lavis/models/__init__.py:177-216): look the model class up
in the registry (``registry.get_model_class(arch)``, models/__init__.py:91),
build it ``from_config`` at the requested ``model_type``, and return it with
the matching ``{"train": ..., "eval": ...}`` vis/text processors from the
model's default YAML.

TPU-native equivalent: models are functional (config dataclass + params
pytree), so the registry maps each name to a *loader function* returning a
:class:`ModelBundle` — cfg, params, and the family's :class:`ModelAdapter`
factory (the pruning seam). Processors come back in the reference's
train/eval dict contract. ``is_eval`` is accepted for signature parity; a
functional model has no train/eval mode, only the transforms differ.

Model types mirror the reference registry names where they exist
(``pretrain_flant5xl``, ``ViT-B-16``, ``EVA-CLIP-g``, ...) and add the
rebuild's scale ladder (``tiny`` / ``small`` everywhere).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.core.registry import registry

PyTree = Any


@dataclass
class ModelBundle:
    """What ``load_model`` returns: a functional model ready for the
    pruning core (``make_adapter()`` -> ``load_pruner``) or the eval CLI."""

    name: str
    model_type: str
    cfg: Any
    params: PyTree
    adapter_factory: Callable[[Any, PyTree], Any]
    extras: Dict[str, Any] = field(default_factory=dict)

    def make_adapter(self, **kw):
        return self.adapter_factory(self.cfg, self.params, **kw)


def _init(init_fn, cfg, seed, dtype):
    """One jitted init program (eager per-leaf RNG churns ~3x param bytes
    through the axon cumulative allocator — cli/prune.py:_jit_init)."""
    return jax.jit(lambda k: init_fn(cfg, k, dtype=dtype))(
        jax.random.PRNGKey(seed))


def _auto_dtype(model_type: str, dtype):
    if dtype is not None:
        return dtype
    return jnp.float32 if model_type == "tiny" else jnp.bfloat16


def _resolve(table: Dict[str, Callable[[], Any]], name: str, model_type: str):
    if model_type not in table:
        raise KeyError(
            f"{name}: unknown model_type {model_type!r} "
            f"(available: {sorted(table)})")
    return table[model_type]()


# ---------------------------------------------------------------------------
# family loaders (lazy imports: registering the zoo must not import jax
# model code the caller never touches)
# ---------------------------------------------------------------------------

def load_blip2_t5(model_type: str = "pretrain_flant5xl", *, dtype=None,
                  ckpt: Optional[str] = None, seed: int = 0) -> ModelBundle:
    from ecoflap_tpu.models import blip2
    from ecoflap_tpu.models import t5 as t5_mod

    def _xxl():
        c = blip2.blip2_flant5xl()
        return type(c)(vit=c.vit, t5=t5_mod.flan_t5_xxl(), qformer=c.qformer)

    table = {
        "pretrain_flant5xl": blip2.blip2_flant5xl,
        "caption_coco_flant5xl": blip2.blip2_flant5xl,
        "pretrain_flant5xxl": _xxl,
        "small": blip2.blip2_small,
        "tiny": blip2.tiny_config,
    }
    cfg = _resolve(table, "blip2_t5", model_type)
    dt = _auto_dtype(model_type, dtype)
    if ckpt:
        from ecoflap_tpu.utils import checkpoint as ck

        params = ck.convert_blip2(ck.load_torch_checkpoint(ckpt), cfg,
                                  dtype=dt)
    else:
        params = _init(blip2.init_params, cfg, seed, dt)
    return ModelBundle("blip2_t5", model_type, cfg, params, blip2.make_adapter,
                       extras={"generate": blip2.generate})


def load_t5(model_type: str = "flant5xl", *, dtype=None,
            ckpt: Optional[str] = None, seed: int = 0) -> ModelBundle:
    from ecoflap_tpu.models import t5 as t5_mod

    table = {
        "flant5xl": t5_mod.flan_t5_xl,
        "flant5xxl": t5_mod.flan_t5_xxl,
        "flant5base": t5_mod.flan_t5_base,
        "small": t5_mod.flan_t5_base,
        "tiny": t5_mod.tiny_config,
    }
    cfg = _resolve(table, "t5", model_type)
    dt = _auto_dtype(model_type, dtype)
    if ckpt:
        from ecoflap_tpu.utils import checkpoint as ck

        params = ck.convert_t5(ck.load_torch_checkpoint(ckpt), cfg, dt)
    else:
        params = _init(t5_mod.init_params, cfg, seed, dt)
    return ModelBundle("t5", model_type, cfg, params, t5_mod.make_adapter)


def _load_clip(name: str, model_type: str, dtype, ckpt, seed) -> ModelBundle:
    from ecoflap_tpu.models import clip as clip_mod

    eva = name == "eva_clip"
    table = {
        ("EVA-CLIP-g" if eva else "ViT-B-16"):
            (clip_mod.eva_clip_g if eva else clip_mod.vit_b16),
        "small": lambda: clip_mod.small_config(eva=eva),
        "tiny": lambda: clip_mod.tiny_config(eva=eva),
    }
    cfg = _resolve(table, name, model_type)
    dt = _auto_dtype(model_type, dtype)
    if ckpt:
        from ecoflap_tpu.utils import checkpoint as ck

        params = ck.convert_clip(ck.load_torch_checkpoint(ckpt), cfg, dtype=dt)
    else:
        params = _init(clip_mod.init_params, cfg, seed, dt)
    return ModelBundle(name, model_type, cfg, params, clip_mod.make_adapter)


def load_clip(model_type: str = "ViT-B-16", *, dtype=None,
              ckpt: Optional[str] = None, seed: int = 0) -> ModelBundle:
    return _load_clip("clip", model_type, dtype, ckpt, seed)


def load_eva_clip(model_type: str = "EVA-CLIP-g", *, dtype=None,
                  ckpt: Optional[str] = None, seed: int = 0) -> ModelBundle:
    return _load_clip("eva_clip", model_type, dtype, ckpt, seed)


def _load_blip1(kind: str, model_type: str, dtype, ckpt, seed) -> ModelBundle:
    """UPop BLIP family: blip_caption / blip_vqa / blip_nlvr /
    blip_retrieval share the config; init + adapter differ by task head."""
    from ecoflap_tpu.models import blip1

    table = {
        "base_coco": blip1.blip_base,
        "base": blip1.blip_base,
        "small": blip1.blip_base,  # blip_base IS ViT-B scale
        "tiny": blip1.tiny_config,
    }
    cfg = _resolve(table, kind, model_type)
    dt = _auto_dtype(model_type, dtype)
    init_fns = {
        "blip_caption": (blip1.init_params, blip1.make_adapter),
        "blip_vqa": (blip1.init_vqa_params, blip1.make_vqa_adapter),
        "blip_nlvr": (blip1.init_nlvr_params, blip1.make_nlvr_adapter),
        "blip_retrieval": (blip1.init_retrieval_params,
                           blip1.make_retrieval_adapter),
    }
    init_fn, adapter_factory = init_fns[kind]
    params = _init(init_fn, cfg, seed, dt)
    if ckpt:
        # strict=False semantics (UPop/models/blip.py:439 load_checkpoint):
        # checkpoint tensors override; components the .pth lacks (task heads
        # when loading the base caption checkpoint) keep their init
        from ecoflap_tpu.utils import checkpoint as ck

        params = ck.convert_blip1(
            ck.load_torch_checkpoint(ckpt), cfg, kind, params, dtype=dt)
    return ModelBundle(kind, model_type, cfg, params, adapter_factory)


def load_blip_caption(model_type: str = "base_coco", *, dtype=None,
                      ckpt=None, seed: int = 0) -> ModelBundle:
    return _load_blip1("blip_caption", model_type, dtype, ckpt, seed)


def load_blip_vqa(model_type: str = "base", *, dtype=None,
                  ckpt=None, seed: int = 0) -> ModelBundle:
    return _load_blip1("blip_vqa", model_type, dtype, ckpt, seed)


def load_blip_nlvr(model_type: str = "base", *, dtype=None,
                   ckpt=None, seed: int = 0) -> ModelBundle:
    return _load_blip1("blip_nlvr", model_type, dtype, ckpt, seed)


def load_blip_retrieval(model_type: str = "base", *, dtype=None,
                        ckpt=None, seed: int = 0) -> ModelBundle:
    return _load_blip1("blip_retrieval", model_type, dtype, ckpt, seed)


def load_blip2_opt(model_type: str = "pretrain_opt2.7b", *, dtype=None,
                   ckpt: Optional[str] = None, seed: int = 0) -> ModelBundle:
    from ecoflap_tpu.models import blip2_opt

    table = {
        "pretrain_opt2.7b": blip2_opt.blip2_opt2_7b,
        "caption_coco_opt2.7b": blip2_opt.blip2_opt2_7b,
        "tiny": blip2_opt.tiny_config,
    }
    cfg = _resolve(table, "blip2_opt", model_type)
    dt = _auto_dtype(model_type, dtype)
    if ckpt:
        from ecoflap_tpu.utils import checkpoint as ck

        params = ck.convert_blip2_opt(ck.load_torch_checkpoint(ckpt), cfg,
                                      dtype=dt)
    else:
        params = _init(blip2_opt.init_params, cfg, seed, dt)
    return ModelBundle("blip2_opt", model_type, cfg, params,
                       blip2_opt.make_adapter,
                       extras={"generate": blip2_opt.generate})


def load_llama(model_type: str = "7b", *, dtype=None,
               ckpt: Optional[str] = None, seed: int = 0) -> ModelBundle:
    from ecoflap_tpu.models import llama

    table = {
        "7b": llama.llama_7b,
        "open_llama_3b": llama.open_llama_3b,
        "small": llama.open_llama_3b,
        "tiny": llama.tiny_config,
    }
    cfg = _resolve(table, "llama", model_type)
    dt = _auto_dtype(model_type, dtype)
    if ckpt:
        from ecoflap_tpu.utils import checkpoint as ck

        params = ck.convert_llama(ck.load_torch_checkpoint(ckpt), cfg, dt)
    else:
        params = _init(llama.init_params, cfg, seed, dt)
    return ModelBundle("llama", model_type, cfg, params, llama.make_adapter)


def load_classifier(name: str):
    def _load(model_type: str = "full", *, dtype=None,
              ckpt: Optional[str] = None, seed: int = 0) -> ModelBundle:
        from ecoflap_tpu.models import classifiers

        cfg, init_fn, fwd, img, ncls = classifiers.build(name, model_type)
        dt = _auto_dtype(model_type, dtype)
        if ckpt:
            from ecoflap_tpu.utils import checkpoint as ck

            state = ck.load_torch_checkpoint(ckpt)
            params = (ck.convert_eva_vit(state, cfg, dtype=dt)
                      if name == "deit"
                      else ck.convert_convnext(state, cfg, dtype=dt))
        else:
            params = _init(init_fn, cfg, seed, dt)
        factory = (classifiers.make_vit_classifier_adapter if name == "deit"
                   else classifiers.make_convnext_adapter)
        return ModelBundle(name, model_type, cfg, params, factory,
                           extras={"forward": fwd, "img_size": img,
                                   "num_classes": ncls})

    return _load


_LOADERS: Dict[str, Callable[..., ModelBundle]] = {
    "blip2_t5": load_blip2_t5,
    "t5": load_t5,
    "clip": load_clip,
    "eva_clip": load_eva_clip,
    "blip_caption": load_blip_caption,
    "blip_vqa": load_blip_vqa,
    "blip_nlvr": load_blip_nlvr,
    "blip_retrieval": load_blip_retrieval,
    "blip2_opt": load_blip2_opt,
    "llama": load_llama,
    "deit": load_classifier("deit"),
    "convnext": load_classifier("convnext"),
}

for _name, _fn in _LOADERS.items():
    registry.register("model", _name, _fn, force=True)


# ---------------------------------------------------------------------------
# processors per family (the reference's per-model default-YAML preprocess
# trees, e.g. blip2_pretrain_flant5xl.yaml -> blip_image_eval/blip_caption)
# ---------------------------------------------------------------------------

def _processors(name: str, cfg) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    from ecoflap_tpu.data.processors import (
        BlipImageTrainProcessor,
        CaptionProcessor,
        ImageEvalProcessor,
        ImageTrainProcessor,
        QuestionProcessor,
    )

    def _img_size():
        for attr in ("vit", "visual", "eva_visual"):
            sub = getattr(cfg, attr, None)
            if sub is not None:
                return sub.img_size
        return getattr(cfg, "img_size", 224)

    if name in ("clip", "eva_clip"):
        s = _img_size()
        eval_p = ImageEvalProcessor(image_size=s)
        # the reference's clip_image_eval serves both splits (no train-time
        # CLIP transform on the ECoFLaP path, clip_processors.py:19-62)
        return ({"train": eval_p, "eval": eval_p},
                {"train": str, "eval": str})
    if name in ("llama", "t5"):
        return ({"train": None, "eval": None}, {"train": str, "eval": str})
    if name in ("deit", "convnext"):
        s = _img_size()
        return ({"train": ImageTrainProcessor(image_size=s),
                 "eval": ImageEvalProcessor(image_size=s)},
                {"train": str, "eval": str})
    s = _img_size()
    txt = (QuestionProcessor() if name == "blip_vqa" else CaptionProcessor())
    train_cls = (BlipImageTrainProcessor if name.startswith("blip_")
                 else ImageTrainProcessor)  # blip2_image_train: no RandAug
    return ({"train": train_cls(image_size=s),
             "eval": ImageEvalProcessor(image_size=s)},
            {"train": txt, "eval": txt})


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def load_model(name: str, model_type: Optional[str] = None, *, dtype=None,
               ckpt: Optional[str] = None, seed: int = 0) -> ModelBundle:
    """Reference ``load_model`` (models/__init__.py:91-130): registry lookup
    + from_config at ``model_type``."""
    loader = registry.get_model_class(name)  # raises with the known list
    kw = dict(dtype=dtype, ckpt=ckpt, seed=seed)
    return loader(model_type, **kw) if model_type else loader(**kw)


def load_model_and_preprocess(name: str, model_type: Optional[str] = None,
                              is_eval: bool = True, *, dtype=None,
                              ckpt: Optional[str] = None, seed: int = 0):
    """Reference contract (models/__init__.py:177-216):
    ``(model, vis_processors, txt_processors)`` with processors keyed
    ``train``/``eval``. ``is_eval`` accepted for signature parity (a
    functional model has no module mode)."""
    del is_eval
    bundle = load_model(name, model_type, dtype=dtype, ckpt=ckpt, seed=seed)
    vis, txt = _processors(name, bundle.cfg)
    return bundle, vis, txt
