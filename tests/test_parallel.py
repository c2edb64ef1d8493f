"""Mesh/sharding: rule resolution, sharded forward == single-device forward,
masked fine-tuning keeps zeros and reduces loss — all on the 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from ecoflap_tpu.models import blip2, llama
from ecoflap_tpu.parallel.mesh import make_mesh
from ecoflap_tpu.parallel.sharding import (
    make_param_shardings,
    shard_batch,
    shard_params,
    spec_for_path,
)
from ecoflap_tpu.runners.finetune import finetune, make_sparsity_masks


def test_mesh_shapes(devices):
    mesh = make_mesh(tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_rule_resolution():
    assert spec_for_path("visual_encoder.blocks.attn.qkv.kernel") == P(None, None, "tp")
    assert spec_for_path("t5_model.encoder.blocks.attn.o.kernel") == P(None, "tp", None)
    assert spec_for_path("layers.mlp.down.kernel") == P(None, "tp", None)
    assert spec_for_path("t5_model.shared") == P(None, "tp")
    assert spec_for_path("ln_vision.scale") == P()


def test_sharded_forward_matches_single_device(devices):
    """pjit-sharded LLaMA forward must equal the unsharded result."""
    cfg = llama.tiny_config(d_model=64, d_ff=128, num_heads=8, num_kv_heads=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(8, 12)), jnp.int32)

    ref = np.asarray(llama.forward(cfg, params, ids))

    mesh = make_mesh(tp=2)
    with mesh:
        sp = shard_params(params, mesh)
        sb = shard_batch({"ids": ids}, mesh)
        out = jax.jit(lambda p, b: llama.forward(cfg, p, b["ids"]))(sp, sb)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_param_shardings_cover_tree(devices):
    cfg = blip2.tiny_config()
    params = blip2.init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(tp=2)
    sh = make_param_shardings(params, mesh)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(
        sh, is_leaf=lambda x: hasattr(x, "spec")
    )
    assert len(flat_p) == len(flat_s)


def test_masked_finetune_preserves_zeros_and_learns(devices):
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    # fake-prune: zero half of the q-projection kernel
    k = params["layers"]["attn"]["q"]["kernel"]
    mask = jax.random.bernoulli(jax.random.PRNGKey(1), 0.5, k.shape)
    params["layers"]["attn"]["q"]["kernel"] = jnp.where(mask, 0.0, k)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(8, 10)), jnp.int32)

    def loss_fn(p, batch):
        return llama.per_sample_loss(cfg, p, batch["input_ids"])

    batches = [{"input_ids": ids}] * 10
    tuned, losses = finetune(
        loss_fn, params, batches, learning_rate=1e-2,
        optimizer=optax.adam(1e-2),
    )
    # pruned entries stay exactly zero through training
    kq = tuned["layers"]["attn"]["q"]["kernel"]
    assert float(jnp.sum(jnp.abs(jnp.where(mask, kq, 0.0)))) == 0.0
    # and the model actually learned
    assert losses[-1] < losses[0]


def test_pruning_under_mesh_matches_single_device(devices):
    """Full two-stage prune (MeZO coarse + Wanda fine) with params tp-sharded
    and the calibration batch dp-sharded must reproduce the single-device
    sparsity dict and pruned weights (VERDICT item 2 correctness gate)."""
    from ecoflap_tpu.pruning.pruners import WandaPruner

    cfg = llama.tiny_config(d_model=64, d_ff=128, num_heads=8, num_kv_heads=8)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(16, 12)), jnp.int32)
    batch = {"input_ids": ids}

    def run(mesh):
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        if mesh is not None:
            params = shard_params(params, mesh)
            b = shard_batch(batch, mesh)
        else:
            b = batch
        pruner = WandaPruner(
            llama.make_adapter(cfg, params), b, num_microbatches=2,
            stack_specs={"model.layers": f"{cfg.num_layers}-0.5-1.0-1.0"},
            sparsity_ratio_granularity="block",
            score_method="MEZO-GradOnly_sum", num_data_first_stage=16,
            max_sparsity_per_layer=0.6, verbose=False,
        )
        if mesh is not None:
            with mesh:
                pruned, sdict = pruner.prune()
        else:
            pruned, sdict = pruner.prune()
        return jax.device_get(pruned), sdict

    ref_params, ref_dict = run(None)
    mesh = make_mesh(tp=2)
    sh_params, sh_dict = run(mesh)

    assert set(ref_dict) == set(sh_dict)
    for k in ref_dict:
        assert abs(ref_dict[k] - sh_dict[k]) < 1e-4, k
    from ecoflap_tpu.core.pytree import flatten_named

    ref_flat, sh_flat = flatten_named(ref_params), flatten_named(sh_params)
    for ka in ref_flat:
        a, b = ref_flat[ka], sh_flat[ka]
        # masks may flip on float near-ties under different reduction
        # orders; demand near-total agreement, not bit equality
        agree = np.mean(np.asarray(a == b))
        assert agree > 0.999, (ka, agree)


def test_finetune_under_mesh(devices):
    """One sharded masked train step executes over (dp=4, tp=2)."""
    cfg = llama.tiny_config(d_model=64, d_ff=128, num_heads=8, num_kv_heads=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(tp=2)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(8, 12)), jnp.int32)

    def loss_fn(p, batch):
        return llama.per_sample_loss(cfg, p, batch["input_ids"])

    with mesh:
        sp = shard_params(params, mesh)
        sb = shard_batch({"input_ids": ids}, mesh)
        tuned, losses = finetune(
            loss_fn, sp, [sb] * 3, optimizer=optax.adam(1e-2))
    assert len(losses) == 3 and np.isfinite(losses).all()
