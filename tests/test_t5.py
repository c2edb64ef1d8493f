"""FlanT5: rel-pos buckets, masks/causality, loss, stacks, pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.models import t5
from ecoflap_tpu.pruning.pruners import SparseGPTPruner, WandaPruner


@pytest.fixture(scope="module")
def tiny():
    cfg = t5.tiny_config()
    params = t5.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def batch(n=4, src=10, tgt=6, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, vocab, size=(n, src))
    mask = np.ones((n, src), np.int32)
    mask[:, -2:] = 0  # padded tail
    labels = rng.integers(2, vocab, size=(n, tgt))
    labels[:, -1] = -100  # ignored position
    return {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attn_mask": jnp.asarray(mask, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }


def test_bucket_matches_hf_reference():
    """Spot-check the bucketing function against hand-computed HF values."""
    # bidirectional, 8 buckets, max_distance 16
    rp = jnp.array([[-3, -1, 0, 1, 5, 15]])
    out = np.asarray(
        t5.relative_position_bucket(rp, True, 8, 16)
    )[0]
    # HF torch reference produces: neg->[0..4), pos offset by 4
    assert out[2] == 0  # distance 0
    assert out[3] >= 4  # positive side offset
    assert out[1] < 4 and out[1] > 0
    # monotone in |distance| on each side
    assert out[5] >= out[4] >= out[3]


def test_encoder_respects_pad_mask(tiny):
    cfg, params = tiny
    b = batch()
    enc1 = t5.encode(cfg, params, b["input_ids"], b["attn_mask"])
    ids2 = b["input_ids"].at[:, -1].set((b["input_ids"][:, -1] + 1) % cfg.vocab_size)
    enc2 = t5.encode(cfg, params, ids2, b["attn_mask"])
    # padded positions don't influence unpadded outputs
    np.testing.assert_allclose(
        np.asarray(enc1[:, :-2]), np.asarray(enc2[:, :-2]), rtol=1e-5, atol=1e-5
    )


def test_decoder_causality(tiny):
    cfg, params = tiny
    b = batch()
    enc = t5.encode(cfg, params, b["input_ids"], b["attn_mask"])
    dec_in = t5.shift_right(cfg, b["labels"])
    lg1 = t5.decode(cfg, params, enc, b["attn_mask"], dec_in)
    dec_in2 = dec_in.at[:, -1].set((dec_in[:, -1] + 1) % cfg.vocab_size)
    lg2 = t5.decode(cfg, params, enc, b["attn_mask"], dec_in2)
    np.testing.assert_allclose(
        np.asarray(lg1[:, :-1]), np.asarray(lg2[:, :-1]), rtol=1e-4, atol=1e-4
    )


def test_loss_ignores_minus_100(tiny):
    cfg, params = tiny
    b = batch()
    l1 = t5.per_sample_loss(cfg, params, b["input_ids"], b["attn_mask"], b["labels"])
    labels2 = b["labels"].at[:, -1].set(5)  # was -100; changing it to a real
    labels2 = labels2.at[:, -1].set(-100)  # back to ignored w/ same dec input
    l2 = t5.per_sample_loss(cfg, params, b["input_ids"], b["attn_mask"], labels2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)
    assert l1.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(l1)))


def test_stack_stats_and_keys(tiny):
    cfg, params = tiny
    enc = t5.make_encoder_stack(cfg, prefix="")
    x, cache = enc.prepare_inputs(params, batch())
    bp = enc.get_block(params, 0)
    _, stats = enc.block_forward(bp, x, cache, collect="wanda")
    assert set(stats) == set(t5.ENCODER_LINEARS)
    assert enc.weight_key(3, "layer.0.SelfAttention.q") == (
        "encoder.block.3.layer.0.SelfAttention.q.weight"
    )
    w = enc.weight_get(bp, "layer.0.SelfAttention.q")
    assert w.shape == (cfg.inner_dim, cfg.d_model)  # torch layout

    dec = t5.make_decoder_stack(cfg, prefix="")
    x, cache = dec.prepare_inputs(params, batch())
    bp = dec.get_block(params, 0)
    _, stats = dec.block_forward(bp, x, cache, collect="hessian")
    assert set(stats) == set(t5.DECODER_LINEARS)
    assert stats["layer.2.DenseReluDense.wo"].shape == (cfg.d_ff, cfg.d_ff)


def test_wanda_prune_t5(tiny):
    cfg, params = tiny
    adapter = t5.make_adapter(cfg, params)
    pruner = WandaPruner(
        adapter, batch(8), num_microbatches=2,
        prune_spec=f"{cfg.num_layers}-0.5-1.0-1.0",
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=0.8,
        score_method="MEZO-GradOnly_avg",
        num_data_first_stage=4,
        verbose=False,
    )
    _, sd = pruner.prune()
    assert "encoder.block.0.layer.0.SelfAttention.q.weight" in sd
    assert "decoder.block.1.layer.1.EncDecAttention.v.weight" in sd
    assert 0.35 <= pruner.check_sparsity() <= 0.65


def test_sparsegpt_prune_t5_reduces_loss_vs_random(tiny):
    """SparseGPT @0.5 should hurt the calibration loss less than pruning the
    same fraction at random — a behavioural sanity check of the OBS sweep.
    (32 samples: at 8 the margin was luck-of-the-seed on this tiny model.)"""
    cfg, params = tiny
    b = batch(32)

    adapter = t5.make_adapter(cfg, params)
    dense_loss = float(jnp.mean(adapter.loss_fn(params, b)))

    pruner = SparseGPTPruner(
        adapter, b, num_microbatches=2,
        prune_spec=f"{cfg.num_layers}-0.5-1.0-1.0", verbose=False,
    )
    pruned, _ = pruner.prune()
    sgpt_loss = float(jnp.mean(adapter.loss_fn(pruned, b)))

    key = jax.random.PRNGKey(1)
    rand = params
    for st in adapter.stacks:
        for i in range(st.num_blocks):
            bp = st.get_block(rand, i)
            for ln in st.linear_names:
                w = st.weight_get(bp, ln)
                key, k2 = jax.random.split(key)
                mask = jax.random.bernoulli(k2, 0.5, w.shape)
                bp = st.weight_set(bp, ln, jnp.where(mask, 0.0, w))
            rand = st.set_block(rand, i, bp)
    rand_loss = float(jnp.mean(adapter.loss_fn(rand, b)))

    assert abs(sgpt_loss - dense_loss) < abs(rand_loss - dense_loss)
