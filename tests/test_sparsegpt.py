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


def test_group_sweep_matches_serial():
    """sparsegpt_prune_weight_group: K batched lanes == K serial sweeps
    (per-lane, up to batched-matmul reduction order)."""
    import numpy as np

    from ecoflap_tpu.pruning.sparsegpt import (
        sparsegpt_prune_weight,
        sparsegpt_prune_weight_group,
    )

    rng = np.random.default_rng(0)
    k, rows, cols = 4, 24, 40
    ws = jnp.asarray(rng.normal(size=(k, rows, cols)), jnp.float32)
    xs = rng.normal(size=(k, 64, cols))
    hs = jnp.asarray(np.einsum("kni,knj->kij", xs, xs) / 64, jnp.float32)
    sps = jnp.asarray([0.3, 0.5, 0.6, 0.45], jnp.float32)

    grouped = sparsegpt_prune_weight_group(ws, hs, sps, blocksize=16)
    for i in range(k):
        serial = sparsegpt_prune_weight(ws[i], hs[i], sps[i], blocksize=16)
        g = np.asarray(grouped[i])
        s = np.asarray(serial)
        # identical masks; values match to reduction-order noise
        np.testing.assert_array_equal(g == 0, s == 0)
        np.testing.assert_allclose(g, s, rtol=2e-4, atol=2e-5)


def test_group_sweep_inf_clamp_and_nm():
    """Group path keeps the exact quantile inf-clamp (lax.map keeps the
    cond a real branch) and supports n:m group masks."""
    import numpy as np

    from ecoflap_tpu.pruning.sparsegpt import (
        sparsegpt_prune_weight,
        sparsegpt_prune_weight_group,
    )

    rng = np.random.default_rng(1)
    k, rows, cols = 2, 8, 16
    ws = jnp.asarray(rng.normal(size=(k, rows, cols)), jnp.float32)
    xs = rng.normal(size=(k, 32, cols))
    hs = np.einsum("kni,knj->kij", xs, xs) / 32
    hs[0, 0, 1] = np.inf  # lane 0 exercises the quantile clamp
    hs = jnp.asarray(hs, jnp.float32)
    sps = jnp.asarray([0.5, 0.5], jnp.float32)

    grouped = sparsegpt_prune_weight_group(ws, hs, sps, blocksize=8)
    for i in range(k):
        serial = sparsegpt_prune_weight(ws[i], hs[i], sps[i], blocksize=8)
        np.testing.assert_allclose(np.asarray(grouped[i]), np.asarray(serial),
                                   rtol=2e-4, atol=2e-5)

    g24 = sparsegpt_prune_weight_group(ws, hs, sps, blocksize=8,
                                       prune_n=2, prune_m=4)
    arr = np.asarray(g24)
    assert arr.shape == (k, rows, cols)
    # exact 2:4 pattern per m-group
    zero_per_group = (arr.reshape(k, rows, cols // 4, 4) == 0).sum(-1)
    assert (zero_per_group == 2).all()


def test_engine_group_path_matches_serial_stack():
    """prune_stack_sparsegpt with the grouped sweep (default) produces the
    same masks as ECOFLAP_SPARSEGPT_GROUP=0 on a real stack."""
    import os

    import jax
    import numpy as np

    from ecoflap_tpu.models import llama
    from ecoflap_tpu.pruning.engine import prune_stack_sparsegpt

    cfg = llama.tiny_config()
    rng = np.random.default_rng(0)
    batch = {"input_ids": jnp.asarray(
        rng.integers(2, cfg.vocab_size, size=(4, 12)), jnp.int32)}

    def run(group):
        os.environ["ECOFLAP_SPARSEGPT_GROUP"] = group
        try:
            params = llama.init_params(cfg, jax.random.PRNGKey(0))
            ad = llama.make_adapter(cfg, params)
            stack = ad.stacks[0]
            ratios = {stack.weight_key(i, ln): 0.5
                      for i in range(stack.num_blocks)
                      for ln in stack.linear_names}
            return prune_stack_sparsegpt(
                stack, params, batch, ratios, num_chunks=1, verbose=False,
                fuse_block_step=True)
        finally:
            os.environ.pop("ECOFLAP_SPARSEGPT_GROUP", None)

    a = run("1")
    b = run("0")
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    for x, y in zip(fa, fb):
        xm = np.asarray(x) == 0
        ym = np.asarray(y) == 0
        assert (xm == ym).mean() > 0.999  # identical masks (ties aside)


def test_scanned_block_loop_matches_unrolled():
    """cols % blocksize == 0 routes through the scanned sweep (one body,
    masked full-width cross-block matmul); values must match the unrolled
    remainder path and the grouped scan must match both."""
    import numpy as np

    from ecoflap_tpu.pruning.sparsegpt import (
        sparsegpt_prune_weight,
        sparsegpt_prune_weight_group,
    )

    rng = np.random.default_rng(2)
    rows, cols, bsz = 24, 64, 16  # divisible -> scan path
    w = jnp.asarray(rng.normal(size=(rows, cols)), jnp.float32)
    x = rng.normal(size=(96, cols))
    h = jnp.asarray(x.T @ x / 96, jnp.float32)

    scanned = sparsegpt_prune_weight(w, h, jnp.float32(0.5), blocksize=bsz)
    # blocksize 17 forces the unrolled remainder path on the same matrix;
    # different block partitions give different sweeps, so instead compare
    # scan vs unrolled at the SAME partition by padding trick: use bsz=13
    # (64 % 13 != 0) only to assert the fallback still runs; the scan-vs-
    # unrolled value check uses the group-vs-serial pair below.
    fallback = sparsegpt_prune_weight(w, h, jnp.float32(0.5), blocksize=13)
    assert np.isfinite(np.asarray(fallback)).all()

    grouped = sparsegpt_prune_weight_group(
        w[None], h[None], jnp.asarray([0.5], jnp.float32), blocksize=bsz)[0]
    np.testing.assert_array_equal(
        np.asarray(scanned) == 0, np.asarray(grouped) == 0)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(grouped),
                               rtol=2e-4, atol=2e-5)


def test_scan_vs_unrolled_same_partition():
    """Direct scan-vs-unrolled equivalence at the SAME block partition:
    monkeypatch-force the unrolled branch by an off-by-remainder pad."""
    import numpy as np

    from ecoflap_tpu.pruning import sparsegpt as sg

    rng = np.random.default_rng(3)
    rows, cols, bsz = 16, 48, 16
    w = jnp.asarray(rng.normal(size=(rows, cols)), jnp.float32)
    x = rng.normal(size=(64, cols))
    h = jnp.asarray(x.T @ x / 64, jnp.float32)

    scanned = sg.sparsegpt_prune_weight(w, h, jnp.float32(0.4), blocksize=bsz)

    # hand-run the unrolled path (copied semantics: slice, sweep, propagate)
    hinv_u, dead = sg.prepare_hinv(h)
    wf = jnp.where(dead[None, :], 0.0, w.astype(jnp.float32))
    from ecoflap_tpu.pruning.select import threshold_mask_per_tensor

    for i1 in range(0, cols, bsz):
        i2 = i1 + bsz
        w_blk = wf[:, i1:i2]
        hinv_blk = hinv_u[i1:i2, i1:i2]
        sal = w_blk**2 / (jnp.diag(hinv_blk)[None, :] ** 2)
        idx = jnp.clip(jnp.floor(sal.size * 0.4).astype(jnp.int32),
                       0, sal.size - 1)
        mask = threshold_mask_per_tensor(sal, idx)
        q1, err1 = sg._sweep_block(w_blk, hinv_blk, mask, 0, 0)
        wf = wf.at[:, i1:i2].set(q1)
        if i2 < cols:
            wf = wf.at[:, i2:].add(-jnp.dot(err1, hinv_u[i1:i2, i2:]))

    np.testing.assert_array_equal(np.asarray(scanned) == 0,
                                  np.asarray(wf) == 0)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(wf),
                               rtol=2e-4, atol=2e-5)
