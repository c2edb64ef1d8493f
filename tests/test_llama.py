"""LLaMA: causality, RoPE shift behaviour, ppl, pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import llama
from ecoflap_tpu.pruning.pruners import WandaPruner


@pytest.fixture(scope="module")
def model():
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_per_leaf_init_matches_whole_tree(model):
    """per_leaf=True (the bounded-temporaries host init for --host_stream 7B
    runs) must produce the same params: same keys, same ops, only the jit
    granularity differs (XLA's fused normal*std rounds differently from the
    eager path at the last ulp — everything agrees to ~1e-7 rel)."""
    cfg, params = model
    per_leaf = llama.init_params(cfg, jax.random.PRNGKey(0), per_leaf=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8),
        params, per_leaf)


def batch(cfg, n=4, s=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(
            rng.integers(2, cfg.vocab_size, size=(n, s)), jnp.int32)
    }


def test_causality(model):
    cfg, params = model
    ids = batch(cfg)["input_ids"]
    lg1 = llama.forward(cfg, params, ids)
    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % cfg.vocab_size)
    lg2 = llama.forward(cfg, params, ids2)
    np.testing.assert_allclose(
        np.asarray(lg1[:, :-1]), np.asarray(lg2[:, :-1]), rtol=1e-4, atol=1e-4
    )


def test_gqa_matches_mha_when_grouped():
    """num_kv_heads=num_heads/2 runs and produces the right shapes."""
    cfg = llama.tiny_config(num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    lg = llama.forward(cfg, params, batch(cfg)["input_ids"])
    assert lg.shape == (4, 10, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(lg)))


def test_perplexity_of_repeated_token_is_low(model):
    """A stream the model can fit trivially after pruning sanity: ppl finite
    and ppl(random) > 1."""
    cfg, params = model
    rng = np.random.default_rng(2)
    stream = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(64,)), jnp.int32)
    ppl = llama.perplexity(cfg, params, stream, seqlen=16, batch_size=2)
    assert np.isfinite(ppl) and ppl > 1.0


def test_ecoflap_zero_prune(model):
    """LLaMA ECoFLaP flags (scripts/ecoflap_zero.sh): block granularity,
    GradOnly MeZO, max 0.7, wanda local @0.6."""
    cfg, params = model
    adapter = llama.make_adapter(cfg, params)
    b = batch(cfg, n=8)
    # NB spec fields are KEEP ratios (base_pruner.py:75-81): 0.4 keep = 0.6 sp
    pruner = WandaPruner(
        adapter, b, num_microbatches=2,
        prune_spec=f"{cfg.num_layers}-0.4-1.0-1.0",
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=0.7,
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert "model.layers.0.self_attn.q_proj.weight" in sd
    assert "model.layers.1.mlp.down_proj.weight" in sd
    assert max(sd.values()) <= 0.7 + 1e-6
    assert 0.45 <= pruner.check_sparsity() <= 0.75
