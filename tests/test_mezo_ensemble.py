"""Lane-ensemble MeZO scoring (plans.py make_lane_scorer) vs serial scoring.

The ensemble scores every target of a block in ONE vmapped program; sampling
uses the SAME per-(target, batch, noise) PRNG keys as the serial donated
in-place path, so per-target scores must match up to vmap/matmul reduction
order. Reference semantics under test: fresh-z-per-microbatch accumulation
(layer_single_base_pruner.py:488-561).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import blip2
from ecoflap_tpu.pruning.mezo import mezo_leaf_scores


def _batch(cfg, n=8, src=6, tgt=5, seed=0):
    rng = np.random.default_rng(seed)
    img = cfg.vit.img_size
    labels = rng.integers(2, cfg.t5.vocab_size, size=(n, tgt))
    return {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_input_ids": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, src)), jnp.int32),
        "text_input_mask": jnp.ones((n, src), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }


def _setup():
    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    ad = blip2.make_adapter(cfg, params)
    return cfg, params, batch, ad


@pytest.mark.parametrize("mode", ["per_batch", "shared"])
def test_ensemble_matches_serial_full_blocks(mode, monkeypatch):
    """ALL targets (full blocks across all 3 stacks, maximal lane groups):
    ensemble ON vs OFF must agree per target."""
    cfg, params, batch, ad = _setup()
    targets = ad.targets()
    plans = ad.build_mezo_plans(params, batch)
    key = jax.random.PRNGKey(7)
    kw = dict(eps=0.02, key=key, noise_mode=mode,
              eval_chunks=2 if mode == "shared" else None)

    monkeypatch.setenv("ECOFLAP_MEZO_ENSEMBLE", "1")
    fast = mezo_leaf_scores(ad.loss_fn, params, batch, 2, targets,
                            loss_plans=plans, **kw)
    monkeypatch.setenv("ECOFLAP_MEZO_ENSEMBLE", "0")
    plans = ad.build_mezo_plans(params, batch)  # fresh rolling caches
    slow = mezo_leaf_scores(ad.loss_fn, params, batch, 2, targets,
                            loss_plans=plans, **kw)
    assert set(fast) == set(slow) == {t.name for t in targets}
    for k in fast:
        f, s = float(fast[k]), float(slow[k])
        assert abs(f - s) <= 0.05 * max(abs(s), 1e-3) + 1e-4, (k, f, s)


def test_ensemble_num_noise_accumulation(monkeypatch):
    """num_noise > 1: the per-batch inner accumulation (sum of |Δ|/2ε per
    draw, then |per_batch| per microbatch) must match serial."""
    cfg, params, batch, ad = _setup()
    targets = [t for t in ad.targets()
               if t.name.startswith("visual_encoder.blocks.0.")]
    assert len(targets) >= 2
    key = jax.random.PRNGKey(3)
    kw = dict(eps=0.02, key=key, noise_mode="per_batch", num_noise=2)

    monkeypatch.setenv("ECOFLAP_MEZO_ENSEMBLE", "1")
    fast = mezo_leaf_scores(ad.loss_fn, params, batch, 2, targets,
                            loss_plans=ad.build_mezo_plans(params, batch),
                            **kw)
    monkeypatch.setenv("ECOFLAP_MEZO_ENSEMBLE", "0")
    slow = mezo_leaf_scores(ad.loss_fn, params, batch, 2, targets,
                            loss_plans=ad.build_mezo_plans(params, batch),
                            **kw)
    for k in fast:
        f, s = float(fast[k]), float(slow[k])
        assert abs(f - s) <= 0.05 * max(abs(s), 1e-3) + 1e-4, (k, f, s)


def test_ensemble_group_boundaries(monkeypatch):
    """A target list that interleaves plan-covered and uncovered targets
    must split into groups/singles without losing or reordering scores."""
    cfg, params, batch, ad = _setup()
    targets = ad.targets()
    # keep only the ViT plan: T5 targets fall back to the serial default loss
    plans = [p for p in ad.build_mezo_plans(params, batch)
             if p.match("visual_encoder.blocks.0.attn.qkv.weight")]
    picks = [t for t in targets if t.name in {
        "visual_encoder.blocks.0.attn.qkv.weight",
        "visual_encoder.blocks.0.mlp.fc1.weight",
        "t5_model.encoder.block.0.layer.0.SelfAttention.q.weight",
        "visual_encoder.blocks.1.attn.proj.weight",
    }]
    assert len(picks) == 4
    key = jax.random.PRNGKey(5)
    monkeypatch.setenv("ECOFLAP_MEZO_ENSEMBLE", "1")
    scores = mezo_leaf_scores(ad.loss_fn, params, batch, 2, picks,
                              loss_plans=plans, eps=0.02, key=key,
                              noise_mode="per_batch")
    assert set(scores) == {t.name for t in picks}
    assert all(np.isfinite(v) and v >= 0 for v in scores.values())


def test_lane_scorer_shared_suffix_semantics():
    """Direct unit check: K-lane scorer at block i == K serial evaluations
    of the plan loss with the same z (constructed by hand)."""
    from ecoflap_tpu.core.pytree import get_leaf
    from ecoflap_tpu.pruning.plans import START_KEY

    cfg, params, batch, ad = _setup()
    plan = ad.build_mezo_plans(params, batch)[0]  # ViT stack
    targets = [t for t in ad.targets()
               if t.name.startswith("visual_encoder.blocks.1.")]
    data = plan.prepare(params, targets[0].name)
    assert int(data[START_KEY]) == 1
    paths = plan.lane_paths(targets)
    scorer = plan.make_lane_scorer(paths, "per_batch")
    eps = 0.02
    keys = tuple(jax.random.fold_in(jax.random.PRNGKey(0), g)
                 for g in range(len(targets)))
    # (MB=1, N=1, K) key grid: the whole batch as one microbatch
    karr = jnp.stack([jnp.stack([jnp.stack(keys)])])
    got = np.asarray(scorer(params, data, karr, jnp.float32(eps)))

    # hand-built serial reference: perturb the stacked leaf functionally
    from ecoflap_tpu.core.pytree import set_leaf as set_leaf_fn
    want = []
    for t, k in zip(targets, keys):
        leaf = get_leaf(params, t.tree_path)
        z = jax.random.normal(k, leaf.shape[1:], jnp.float32) * eps
        lp = plan.loss_fn(
            set_leaf_fn(params, t.tree_path, leaf.at[1].add(z)), data)
        lm = plan.loss_fn(
            set_leaf_fn(params, t.tree_path, leaf.at[1].add(-z)), data)
        want.append(abs(float(jnp.mean(lp)) - float(jnp.mean(lm))) / (2 * eps))
    # divided differences amplify f32 reduction-order noise by 1/2eps:
    # loss rounding ~1e-7 -> ~3e-6/eps absolute score noise
    for g, w in zip(got, want):
        assert abs(g - w) <= 0.05 * max(abs(w), 1e-3) + 1e-4, (g, w)
