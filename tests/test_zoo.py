"""load_model_and_preprocess — the reference's one-call public API
(LAVIS/lavis/models/__init__.py:91-216): registry model lookup, model_type
dispatch, {"train","eval"} processor contract, and the bundle's adapter
feeding straight into load_pruner."""

import numpy as np
import pytest

from ecoflap_tpu.core.registry import registry
from ecoflap_tpu.models import ModelBundle, load_model, load_model_and_preprocess


def test_registry_has_model_kind():
    import ecoflap_tpu.models  # noqa: F401 — registration side effect

    for name in ("blip2_t5", "t5", "clip", "eva_clip", "llama",
                 "blip_caption", "blip_vqa", "blip_nlvr", "blip_retrieval",
                 "blip2_opt", "deit", "convnext"):
        assert registry.get_model_class(name) is not None, name


def test_load_model_tiny_bundles():
    for name, model_type in [("blip2_t5", "tiny"), ("t5", "tiny"),
                             ("clip", "tiny"), ("llama", "tiny")]:
        b = load_model(name, model_type)
        assert isinstance(b, ModelBundle)
        adapter = b.make_adapter()
        assert adapter.stacks and adapter.params is b.params


def test_unknown_name_and_type_fail_loudly():
    with pytest.raises(KeyError, match="not registered"):
        load_model("nope")
    with pytest.raises(KeyError, match="unknown model_type"):
        load_model("t5", "flant5-27b")


def test_processor_contract():
    bundle, vis, txt = load_model_and_preprocess("blip2_t5", "tiny")
    assert set(vis) == {"train", "eval"} and set(txt) == {"train", "eval"}
    img = (np.random.default_rng(0).random(
        (bundle.cfg.vit.img_size + 4, bundle.cfg.vit.img_size + 4, 3))
        * 255).astype(np.uint8)
    out = vis["eval"](img)
    assert out.shape == (bundle.cfg.vit.img_size, bundle.cfg.vit.img_size, 3)
    assert txt["eval"]("A Dog.") == "a dog"

    _, vis_c, txt_c = load_model_and_preprocess("clip", "tiny")
    # clip has no train-time transform on the ECoFLaP path
    assert vis_c["train"] is vis_c["eval"]
    # blip_question keeps '?' (pre_question strips only [.!"()*#:;~])
    _, _, txt_v = load_model_and_preprocess("blip_vqa", "tiny")
    assert txt_v["eval"]("Is it: a dog?") == "is it a dog?"


def test_bundle_drives_load_pruner():
    """The zoo output is pruning-ready: bundle -> adapter -> load_pruner
    (reference flow load_model_and_preprocess -> load_pruner,
    compression/__init__.py:29-46)."""
    import jax

    from ecoflap_tpu.pruning.loader import load_pruner

    bundle = load_model("t5", "tiny")
    adapter = bundle.make_adapter()
    rng = np.random.default_rng(0)
    n, seq = 4, 8
    v = bundle.cfg.vocab_size
    batch = {
        "input_ids": rng.integers(2, v, size=(n, seq)),
        "attn_mask": np.ones((n, seq), np.int32),
        "labels": rng.integers(2, v, size=(n, seq)),
    }
    batch = {k: jax.numpy.asarray(np.asarray(val)) for k, val in batch.items()}
    pruner = load_pruner(
        "t5_wanda_pruner", adapter, batch, 2,
        {"prune_spec": f"{bundle.cfg.num_layers}-0.5-1.0-1.0"})
    new_params, sparsity_dict = pruner.prune()
    assert abs(pruner.check_sparsity() - 0.5) < 0.05


def test_retrieval_adapter_itm_loss():
    """blip_retrieval: ITM-CE calibration loss (UPop wanda_pruner.py:721-750
    retrieval branch) — finite per-sample losses, prunable stacks, and the
    text stack streams the bidirectional ITM path."""
    import jax

    bundle = load_model("blip_retrieval", "tiny")
    adapter = bundle.make_adapter()
    cfg = bundle.cfg
    rng = np.random.default_rng(1)
    n, seq = 2, 6
    batch = {
        "image": jax.numpy.asarray(
            rng.normal(size=(n, cfg.vit.img_size, cfg.vit.img_size, 3)),
            jax.numpy.float32),
        "caption_ids": jax.numpy.asarray(
            rng.integers(4, cfg.text.vocab_size, size=(n, seq)),
            jax.numpy.int32),
        "caption_mask": jax.numpy.ones((n, seq), jax.numpy.int32),
    }
    loss = adapter.loss_fn(bundle.params, batch)
    assert loss.shape == (n,) and bool(np.isfinite(np.asarray(loss)).all())
    # plan loss (cached image embeds) matches the full ITM loss
    plans = adapter.build_mezo_plans(bundle.params, batch)
    assert plans and plans[0].match("text_encoder.encoder.layer.0")
    plan_loss = plans[0].loss_fn(bundle.params, plans[0].data)
    np.testing.assert_allclose(np.asarray(plan_loss), np.asarray(loss),
                               rtol=2e-5, atol=2e-5)
    # the text stack streams end-to-end (prepare + per-block forward)
    stack = [s for s in adapter.stacks if "text_encoder" in s.name][0]
    x, cache = stack.prepare_inputs(bundle.params, batch)
    bp = stack.get_block(bundle.params, 0)
    y, stats = stack.block_forward(bp, x, cache, "wanda")
    assert y.shape == x.shape and stats
