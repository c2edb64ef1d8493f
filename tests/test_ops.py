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
