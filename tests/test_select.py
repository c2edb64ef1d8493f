"""Sort-free selection (pruning/select.py) vs sort-based oracles, incl. ties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.pruning.select import (
    _bits,
    kth_smallest_bits,
    kth_smallest_bits_global,
    smallest_k_mask_per_row,
    threshold_mask_per_tensor,
)


def _rand(shape, ties=False, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random(shape).astype(np.float32)
    if ties:  # quantize hard so ties are everywhere
        x = np.round(x * 8) / 8
    return jnp.asarray(x)


@pytest.mark.parametrize("ties", [False, True])
def test_kth_smallest_matches_sort(ties):
    x = _rand((5, 257), ties)
    bits = _bits(x)
    for k in [0, 1, 128, 255, 256]:
        got = kth_smallest_bits(bits, k)
        want = jnp.sort(bits, axis=1)[:, k]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("ties", [False, True])
def test_per_tensor_threshold_matches_sort(ties):
    x = _rand((37, 119), ties)
    for ratio in [0.0, 0.3, 0.5, 0.97]:
        idx = int(np.floor(x.size * ratio))
        idx = min(max(idx, 0), x.size - 1)
        got = np.asarray(threshold_mask_per_tensor(x, idx))
        thres = np.sort(np.asarray(x).reshape(-1))[idx]
        want = np.asarray(x) <= thres
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ties", [False, True])
def test_per_row_mask_matches_stable_argsort(ties):
    x = _rand((31, 64), ties, seed=3)
    for ratio in [0.0, 0.25, 0.5, 0.9]:
        k = int(np.floor(64 * ratio))
        got = np.asarray(smallest_k_mask_per_row(x, k))
        order = np.argsort(np.asarray(x), axis=1, kind="stable")
        rank = np.argsort(order, axis=1, kind="stable")
        want = rank < k
        np.testing.assert_array_equal(got, want, err_msg=f"ratio {ratio}")
        assert got.sum() == 31 * k  # exactly k per row even with ties


def test_per_row_vector_k():
    x = _rand((4, 16), ties=True, seed=5)
    k = jnp.asarray([0, 3, 8, 16 - 1], jnp.int32)
    got = np.asarray(smallest_k_mask_per_row(x, k))
    assert list(got.sum(axis=1)) == [0, 3, 8, 15]


@pytest.mark.parametrize("ties", [False, True])
def test_global_kth_matches_concat_sort(ties):
    leaves = [_bits(_rand((13, 7), ties, seed=s)).reshape(-1)
              for s in range(4)]
    cat = np.sort(np.concatenate([np.asarray(l) for l in leaves]))
    for k in [0, 10, 200, cat.size - 1]:
        got = int(kth_smallest_bits_global(tuple(leaves), k))
        assert got == cat[k], k
