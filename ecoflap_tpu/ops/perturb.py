"""Pallas kernel: fused Gaussian perturbation for MeZO scoring.

The reference perturbs with ``torch.normal`` into a fresh tensor then adds
in place (zo_perturb_parameters, layer_single_base_pruner.py:473-486). The
plain-JAX equivalent costs three HBM passes over the weight (noise write,
noise read, weight read+write). This kernel generates the noise ON-CHIP from
the Pallas PRNG (Box-Muller over ``prng_random_bits``) and fuses the add:
one read + one write of the weight, zero noise traffic.

The noise stream is keyed by (seed, grid position) and is deterministic, so
``perturb(w, seed, +eps)`` and ``perturb(w, seed, -eps)`` produce exactly
opposite perturbations — the antithetic pair MeZO needs — without storing z.
The distribution differs bitwise from ``jax.random.normal`` (different PRNG);
the MeZO estimator only needs i.i.d. N(0,1), so this is a documented,
semantics-preserving deviation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 256
_TILE_C = 512


def _perturb_kernel(seed_ref, scale_ref, w_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # unique stream per tile
    pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)
    shape = w_ref.shape
    # Box-Muller: two uniform draws -> one standard normal
    bits1 = pltpu.prng_random_bits(shape)
    bits2 = pltpu.prng_random_bits(shape)
    # >>8 keeps 24 bits, so the int32 round-trip is exact (the Mosaic
    # lowering has no direct uint32->float32 cast)
    u1 = (pltpu.bitcast(bits1, jnp.uint32) >> 8).astype(jnp.int32).astype(
        jnp.float32) * (1.0 / (1 << 24))
    u2 = (pltpu.bitcast(bits2, jnp.uint32) >> 8).astype(jnp.int32).astype(
        jnp.float32) * (1.0 / (1 << 24))
    u1 = jnp.maximum(u1, 1e-7)  # avoid log(0)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    z = r * jnp.cos(2.0 * jnp.pi * u2)
    out_ref[:] = (
        w_ref[:].astype(jnp.float32) + scale_ref[0] * z
    ).astype(out_ref.dtype)


def _perturb_block_kernel(idx_ref, seed_ref, scale_ref, w_ref, out_ref):
    """One (1, TILE_R, TILE_C) tile of stacked leaf block ``idx_ref[0]``."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)
    bits1 = pltpu.prng_random_bits(w_ref.shape)
    bits2 = pltpu.prng_random_bits(w_ref.shape)
    # >>8 keeps 24 bits, so the int32 round-trip is exact (the Mosaic
    # lowering has no direct uint32->float32 cast)
    u1 = (pltpu.bitcast(bits1, jnp.uint32) >> 8).astype(jnp.int32).astype(
        jnp.float32) * (1.0 / (1 << 24))
    u2 = (pltpu.bitcast(bits2, jnp.uint32) >> 8).astype(jnp.int32).astype(
        jnp.float32) * (1.0 / (1 << 24))
    u1 = jnp.maximum(u1, 1e-7)
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    out_ref[:] = (
        w_ref[:].astype(jnp.float32) + scale_ref[0] * z
    ).astype(out_ref.dtype)


def _exact_tile(dim: int, cap: int, step: int) -> int:
    """Largest multiple of ``step`` <= cap that divides ``dim`` exactly —
    aliased outputs can't tolerate padded (ragged) tiles. 0 = none."""
    for t in range(min(cap, dim) - min(cap, dim) % step, 0, -step):
        if dim % t == 0:
            return t
    return 0


def supports_block_inplace(shape) -> bool:
    """3-D stacked leaf whose slice dims admit exact (sublane, lane) tiles."""
    if len(shape) != 3:
        return False
    return _exact_tile(shape[1], _TILE_R, 16) > 0 and _exact_tile(
        shape[2], _TILE_C, 128) > 0


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("interpret",))
def perturb_block_inplace(
    leaf: jax.Array,
    idx: jax.Array,
    seed: jax.Array,
    scale: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """leaf[idx] += scale·z on a stacked (L, r, c) leaf, IN PLACE.

    The leaf buffer is donated and aliased straight through the kernel
    (``input_output_aliases``): the grid touches only block ``idx``'s tiles,
    every other block's bytes never move — one read + one write of the
    perturbed slice, zero noise traffic, zero reallocation against the
    device's cumulative-allocation budget. Same (seed) -> same z, giving the
    exact MeZO antithetic cycle (+eps, -2eps, +eps restores to one ulp)."""
    _, r, c = leaf.shape
    tr, tc = _exact_tile(r, _TILE_R, 16), _exact_tile(c, _TILE_C, 128)
    assert tr and tc, (
        f"slice {(r, c)} has no exact tiling; gate on supports_block_inplace"
    )
    grid = (r // tr, c // tc)
    idx = jnp.asarray(idx, jnp.int32).reshape(1)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    scale = jnp.asarray(scale, jnp.float32).reshape(1)
    return pl.pallas_call(
        _perturb_block_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tr, tc),
                             lambda i, j, idx_ref: (idx_ref[0], i, j)),
            ],
            out_specs=pl.BlockSpec((1, tr, tc),
                                   lambda i, j, idx_ref: (idx_ref[0], i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct(leaf.shape, leaf.dtype),
        input_output_aliases={3: 0},  # after the 3 scalar operands
        interpret=interpret,
    )(idx, seed, scale, leaf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def perturb(
    w: jax.Array, seed: jax.Array, scale: jax.Array, interpret: bool = False
) -> jax.Array:
    """w + scale·z with z ~ N(0,1) generated on-chip. 2-D weights only.

    Same (seed) -> same z, so ``perturb(w, s, eps)`` / ``perturb(w, s, -eps)``
    are the MeZO antithetic pair. ``scale`` is ±eps.
    """
    r, c = w.shape
    grid = (pl.cdiv(r, _TILE_R), pl.cdiv(c, _TILE_C))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    scale = jnp.asarray(scale, jnp.float32).reshape(1)
    return pl.pallas_call(
        _perturb_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_R, _TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_R, _TILE_C), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(w.shape, w.dtype),
        interpret=interpret,
    )(seed, scale, w)
