"""Wanda math vs torch oracles implementing the reference ops
(wanda_pruner.py:71-84, 260-277, 541-556)."""

import numpy as np
import pytest
import torch

from ecoflap_tpu.pruning import wanda

import jax.numpy as jnp


def torch_scaler_row(batches):
    """WrappedGPT.add_batch oracle: running column-norm mean over batches."""
    scaler_row = None
    nsamples = 0
    for x in batches:
        x = torch.as_tensor(x)
        tmp = x.shape[0]
        if scaler_row is None:
            scaler_row = torch.zeros(x.shape[-1])
        flat = x.reshape(-1, x.shape[-1]).t().float()
        scaler_row *= nsamples / (nsamples + tmp)
        nsamples += tmp
        scaler_row += torch.norm(flat, p=2, dim=1) ** 2 / nsamples
    return scaler_row.numpy()


def test_scaler_row_matches_reference():
    rng = np.random.default_rng(0)
    batches = [rng.normal(size=(4, 7, 16)).astype(np.float32) for _ in range(3)]

    s = jnp.zeros(16, jnp.float32)
    n = jnp.zeros((), jnp.float32)
    for b in batches:
        s, n = wanda.update_scaler_row(s, n, jnp.asarray(b))

    np.testing.assert_allclose(np.asarray(s), torch_scaler_row(batches), rtol=1e-5)
    assert float(n) == 12


def test_single_big_batch_equals_streaming():
    """One stacked forward must reproduce the reference's running mean."""
    rng = np.random.default_rng(1)
    batches = [rng.normal(size=(4, 7, 16)).astype(np.float32) for _ in range(3)]
    big = np.concatenate(batches, axis=0)

    s, n = wanda.update_scaler_row(
        jnp.zeros(16, jnp.float32), jnp.zeros((), jnp.float32), jnp.asarray(big)
    )
    np.testing.assert_allclose(np.asarray(s), torch_scaler_row(batches), rtol=1e-5)


def torch_mask_per_row(metric, ratio):
    m = torch.as_tensor(np.asarray(metric))
    sort_res = torch.sort(m, dim=-1, stable=True)
    mask = torch.zeros_like(m, dtype=torch.bool)
    indices = sort_res[1][:, : int(m.shape[1] * ratio)]
    mask.scatter_(1, indices, True)
    return mask.numpy()


def torch_mask_per_tensor(metric, ratio):
    m = torch.as_tensor(np.asarray(metric))
    thres = torch.sort(m.flatten())[0][int(m.numel() * ratio)]
    return (m <= thres).numpy()


@pytest.mark.parametrize("ratio", [0.0, 0.25, 0.5, 0.73])
def test_mask_per_row_matches_reference(ratio):
    rng = np.random.default_rng(2)
    metric = rng.uniform(size=(8, 32)).astype(np.float32)
    ours = np.asarray(wanda.mask_per_row(jnp.asarray(metric), jnp.float32(ratio)))
    np.testing.assert_array_equal(ours, torch_mask_per_row(metric, ratio))


def test_mask_per_row_with_ties():
    metric = np.zeros((4, 16), np.float32)  # all ties: stable order decides
    ours = np.asarray(wanda.mask_per_row(jnp.asarray(metric), jnp.float32(0.5)))
    np.testing.assert_array_equal(ours, torch_mask_per_row(metric, 0.5))
    assert ours.sum() == 4 * 8


@pytest.mark.parametrize("ratio", [0.25, 0.5, 0.73])
def test_mask_per_tensor_matches_reference(ratio):
    rng = np.random.default_rng(3)
    metric = rng.uniform(size=(8, 32)).astype(np.float32)
    ours = np.asarray(wanda.mask_per_tensor(jnp.asarray(metric), jnp.float32(ratio)))
    np.testing.assert_array_equal(ours, torch_mask_per_tensor(metric, ratio))


def test_mask_n_m():
    rng = np.random.default_rng(4)
    metric = rng.uniform(size=(4, 16)).astype(np.float32)
    mask = np.asarray(wanda.mask_n_m(jnp.asarray(metric), 2, 4))
    assert mask.shape == (4, 16)
    grouped = mask.reshape(4, 4, 4)
    assert (grouped.sum(-1) == 2).all()
    # pruned entries are the smallest in each group
    mg = metric.reshape(4, 4, 4)
    for r in range(4):
        for g in range(4):
            pruned_vals = mg[r, g][grouped[r, g]]
            kept_vals = mg[r, g][~grouped[r, g]]
            assert pruned_vals.max() <= kept_vals.min()


def test_wanda_prune_weight_end_to_end():
    rng = np.random.default_rng(5)
    w = rng.normal(size=(16, 32)).astype(np.float32)
    scaler = rng.uniform(0.1, 2.0, size=32).astype(np.float32)

    out = np.asarray(
        wanda.wanda_prune_weight(
            jnp.asarray(w), jnp.asarray(scaler), jnp.float32(0.5), per_row=True
        )
    )
    # exactly half of each row zeroed
    assert ((out == 0).sum(axis=1) >= 16).all()
    # surviving weights unchanged
    np.testing.assert_array_equal(out[out != 0], w[out != 0])

    # metric ordering respected: per row, pruned metric <= kept metric
    metric = np.abs(w) * np.sqrt(scaler)[None, :]
    for r in range(16):
        pruned = metric[r][out[r] == 0]
        kept = metric[r][out[r] != 0]
        if len(pruned) and len(kept):
            assert pruned.max() <= kept.min() + 1e-6
