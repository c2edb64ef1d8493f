"""Pallas ops. The PRNG primitives are stubbed (zeros) in CPU interpret mode,
so statistical checks run only on real TPU (ECOFLAP_TPU_TESTS=1); structural
checks (shapes, dtypes, compile) run everywhere via interpret mode."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecoflap_tpu.ops.perturb import perturb

ON_TPU = os.environ.get("ECOFLAP_TPU_TESTS") == "1"


def test_perturb_compiles_and_preserves_shape_dtype():
    from jax.experimental.pallas import tpu as pltpu

    w = jnp.zeros((300, 600), jnp.bfloat16)  # ragged tiles
    with pltpu.force_tpu_interpret_mode():
        out = perturb(w, 3, 1e-2)
    assert out.shape == w.shape and out.dtype == w.dtype


@pytest.mark.skipif(not ON_TPU, reason="PRNG stubbed off-TPU")
def test_perturb_antithetic_and_gaussian_tpu():
    w = jnp.zeros((256, 512), jnp.float32)
    plus = np.asarray(perturb(w, 7, 1e-3))
    minus = np.asarray(perturb(w, 7, -1e-3))
    np.testing.assert_array_equal(plus, -minus)
    again = np.asarray(perturb(w, 7, 1e-3))
    np.testing.assert_array_equal(plus, again)
    other = np.asarray(perturb(w, 8, 1e-3))
    assert np.abs(plus - other).max() > 0

    z = plus / 1e-3
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - 1.0) < 0.02
    assert 0.29 < (np.abs(z) > 1.0).mean() < 0.35  # ~0.317 for N(0,1)


def test_perturb_block_inplace_structure():
    from jax.experimental.pallas import tpu as pltpu

    from ecoflap_tpu.ops.perturb import perturb_block_inplace

    leaf = jnp.zeros((4, 304, 640), jnp.bfloat16)  # exact tiles
    with pltpu.force_tpu_interpret_mode():
        out = perturb_block_inplace(leaf, 2, 3, 1e-2)
    assert out.shape == leaf.shape and out.dtype == leaf.dtype

    from ecoflap_tpu.ops.perturb import supports_block_inplace

    assert supports_block_inplace((39, 1408, 4224))   # EVA-ViT qkv
    assert supports_block_inplace((24, 5120, 2048))   # FlanT5-XL wo
    assert not supports_block_inplace((4, 300, 600))  # ragged
    assert not supports_block_inplace((300, 600))     # 2-D


@pytest.mark.skipif(not ON_TPU, reason="PRNG stubbed off-TPU")
def test_perturb_block_inplace_tpu():
    from ecoflap_tpu.ops.perturb import perturb_block_inplace

    def fresh():
        return jnp.ones((3, 256, 512), jnp.float32)

    plus = np.asarray(perturb_block_inplace(fresh(), 1, 7, 1e-3))
    # untouched blocks stay bit-identical
    np.testing.assert_array_equal(plus[0], np.ones((256, 512), np.float32))
    np.testing.assert_array_equal(plus[2], np.ones((256, 512), np.float32))
    # perturbed block is gaussian around 1 and antithetic-exact
    z = (plus[1] - 1.0) / 1e-3
    assert abs(z.mean()) < 0.02 and abs(z.std() - 1.0) < 0.02
    minus = np.asarray(perturb_block_inplace(fresh(), 1, 7, -1e-3))
    np.testing.assert_allclose(plus[1] - 1.0, -(minus[1] - 1.0), rtol=0, atol=0)
    # +eps, -2eps, +eps restores to ~one ulp
    leaf = fresh()
    leaf = perturb_block_inplace(leaf, 1, 7, 1e-3)
    leaf = perturb_block_inplace(leaf, 1, 7, -2e-3)
    leaf = perturb_block_inplace(leaf, 1, 7, 1e-3)
    np.testing.assert_allclose(np.asarray(leaf), np.ones((3, 256, 512)),
                               rtol=0, atol=1e-6)
