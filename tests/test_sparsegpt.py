"""SparseGPT OBS sweep vs a torch oracle implementing the reference
``fasterprune`` (sparsegpt_pruner.py:84-218) on well-conditioned inputs."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ecoflap_tpu.pruning import sparsegpt


def torch_fasterprune(w, h, sparsity, blocksize=128, percdamp=0.01):
    """Reference-spec oracle (unstructured path, no pathological numerics)."""
    W = torch.as_tensor(np.asarray(w)).clone().float()
    H = torch.as_tensor(np.asarray(h)).clone().float()
    rows, columns = W.shape

    dead = torch.diag(H) == 0
    H[dead, dead] = 1
    W[:, dead] = 0

    damp = percdamp * torch.mean(torch.diag(H))
    diag = torch.arange(columns)
    while True:
        try:
            L = torch.linalg.cholesky(H)
            if not torch.isnan(L).any():
                H = L
                break
            H[diag, diag] += damp
        except Exception:
            H[diag, diag] += damp
    H = torch.cholesky_inverse(H)
    damp = percdamp * torch.mean(torch.diag(H).abs())
    while True:
        try:
            U = torch.linalg.cholesky(H, upper=True)
            if not torch.isnan(U).any():
                H = U
                break
            H[diag, diag] += damp
        except Exception:
            H[diag, diag] += damp
    Hinv = H

    for i1 in range(0, columns, blocksize):
        i2 = min(i1 + blocksize, columns)
        count = i2 - i1
        W1 = W[:, i1:i2].clone()
        Q1 = torch.zeros_like(W1)
        Err1 = torch.zeros_like(W1)
        Hinv1 = Hinv[i1:i2, i1:i2]

        tmp = W1**2 / (torch.diag(Hinv1).reshape((1, -1))) ** 2
        thresh = torch.sort(tmp.flatten())[0][int(tmp.numel() * sparsity)]
        mask1 = tmp <= thresh

        for i in range(count):
            w_col = W1[:, i]
            d = Hinv1[i, i]
            q = w_col.clone()
            q[mask1[:, i]] = 0
            Q1[:, i] = q
            err1 = (w_col - q) / d
            W1[:, i:] -= err1.unsqueeze(1).matmul(Hinv1[i, i:].unsqueeze(0))
            Err1[:, i] = err1

        W[:, i1:i2] = Q1
        W[:, i2:] -= Err1.matmul(Hinv[i1:i2, i2:])

    return W.numpy()


def make_hessian(rng, dim, n=256):
    x = rng.normal(size=(n, dim)).astype(np.float32)
    return (2.0 / n) * (x.T @ x)


@pytest.mark.parametrize("rows,cols,blocksize", [(8, 16, 8), (16, 32, 16), (12, 20, 8)])
def test_matches_reference_oracle(rows, cols, blocksize):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(rows, cols)).astype(np.float32)
    h = make_hessian(rng, cols)

    ours = np.asarray(
        sparsegpt.sparsegpt_prune_weight(
            jnp.asarray(w), jnp.asarray(h), jnp.float32(0.5), blocksize=blocksize
        )
    )
    ref = torch_fasterprune(w, h, 0.5, blocksize=blocksize)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_dead_columns_zeroed():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(8, 16)).astype(np.float32)
    h = make_hessian(rng, 16)
    h[3, :] = 0
    h[:, 3] = 0

    out = np.asarray(
        sparsegpt.sparsegpt_prune_weight(jnp.asarray(w), jnp.asarray(h), jnp.float32(0.3))
    )
    assert (out[:, 3] == 0).all()


def test_obs_beats_naive_masking():
    """Error propagation must reduce ‖XW_prunedᵀ − XWᵀ‖ vs plain zeroing."""
    rng = np.random.default_rng(2)
    n, dim, rows = 512, 32, 16
    x = rng.normal(size=(n, dim)).astype(np.float32)
    w = rng.normal(size=(rows, dim)).astype(np.float32)
    h = (2.0 / n) * (x.T @ x)

    pruned = np.asarray(
        sparsegpt.sparsegpt_prune_weight(
            jnp.asarray(w), jnp.asarray(h), jnp.float32(0.5), blocksize=dim
        )
    )
    sal = w**2  # naive magnitude mask at same per-tensor sparsity
    thr = np.sort(sal.flatten())[int(sal.size * 0.5)]
    naive = np.where(sal <= thr, 0.0, w)

    err_obs = np.linalg.norm(x @ pruned.T - x @ w.T)
    err_naive = np.linalg.norm(x @ naive.T - x @ w.T)
    assert err_obs < err_naive


def test_hessian_accumulation_matches_reference():
    rng = np.random.default_rng(3)
    batches = [rng.normal(size=(4, 5, 8)).astype(np.float32) for _ in range(3)]

    # torch oracle (SparseGPT.add_batch)
    H = torch.zeros(8, 8)
    ns = 0
    for b in batches:
        t = torch.as_tensor(b)
        tmp = t.shape[0]
        flat = t.reshape(-1, 8).t()
        H *= ns / (ns + tmp)
        ns += tmp
        flat = np.sqrt(2 / ns) * flat.float()
        H += flat.matmul(flat.t())

    h = jnp.zeros((8, 8), jnp.float32)
    n = jnp.zeros((), jnp.float32)
    for b in batches:
        h, n = sparsegpt.accumulate_hessian(h, n, jnp.asarray(b))

    np.testing.assert_allclose(np.asarray(h), H.numpy(), rtol=1e-4, atol=1e-5)


def test_nm_structured():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(8, 16)).astype(np.float32)
    h = make_hessian(rng, 16)
    out = np.asarray(
        sparsegpt.sparsegpt_prune_weight(
            jnp.asarray(w), jnp.asarray(h), jnp.float32(0.0),
            blocksize=16, prune_n=2, prune_m=4,
        )
    )
    zeros_per_group = (out.reshape(8, 4, 4) == 0).sum(-1)
    assert (zeros_per_group >= 2).all()
