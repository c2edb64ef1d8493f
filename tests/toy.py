"""Tiny residual-MLP toy model + adapter used by scorer/engine/pruner tests.

Stacked-block storage (the TPU-native layout): one (L, in, out) leaf per
linear kind; block i is a slice. Mirrors the adapter contract real models use.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecoflap_tpu.core.pytree import get_leaf, set_leaf
from ecoflap_tpu.models.layers import collect_stats
from ecoflap_tpu.pruning.adapter import ModelAdapter, StackSpec


def make_toy_params(num_blocks=2, dim=8, hidden=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    scale = 1.0 / np.sqrt(dim)
    return {
        "blocks": {
            "fc1": {"kernel": jnp.asarray(
                rng.normal(size=(num_blocks, dim, hidden)) * scale, dtype)},
            "fc2": {"kernel": jnp.asarray(
                rng.normal(size=(num_blocks, hidden, dim)) * scale, dtype)},
        }
    }


def _block_forward(bp, x, cache, collect=None):
    stats: Dict[str, jax.Array] = {}
    collect_stats(stats, "fc1", x, collect)
    h = jax.nn.relu(x @ bp["fc1"]["kernel"])
    collect_stats(stats, "fc2", h, collect)
    return x + h @ bp["fc2"]["kernel"], stats


def forward(params, x):
    n = params["blocks"]["fc1"]["kernel"].shape[0]
    for i in range(n):
        bp = {
            "fc1": {"kernel": params["blocks"]["fc1"]["kernel"][i]},
            "fc2": {"kernel": params["blocks"]["fc2"]["kernel"][i]},
        }
        x, _ = _block_forward(bp, x, None)
    return x


def make_toy_adapter(params=None, num_blocks=2, dim=8, hidden=16, seed=0):
    if params is None:
        params = make_toy_params(num_blocks, dim, hidden, seed)
    num_blocks = params["blocks"]["fc1"]["kernel"].shape[0]

    def prepare_inputs(p, batch):
        return batch["x"], None

    def get_block(p, i):
        return {
            "fc1": {"kernel": p["blocks"]["fc1"]["kernel"][i]},
            "fc2": {"kernel": p["blocks"]["fc2"]["kernel"][i]},
        }

    def set_block(p, i, bp):
        p = set_leaf(p, "blocks.fc1.kernel",
                     get_leaf(p, "blocks.fc1.kernel").at[i].set(bp["fc1"]["kernel"]))
        p = set_leaf(p, "blocks.fc2.kernel",
                     get_leaf(p, "blocks.fc2.kernel").at[i].set(bp["fc2"]["kernel"]))
        return p

    def weight_get(bp, local):
        return bp[local]["kernel"].T  # torch layout (out, in)

    def weight_set(bp, local, w):
        new = dict(bp)
        new[local] = {"kernel": w.T.astype(bp[local]["kernel"].dtype)}
        return new

    stack = StackSpec(
        name="toy.blocks",
        num_blocks=num_blocks,
        linear_names=("fc1", "fc2"),
        per_row_mask=True,
        prepare_inputs=prepare_inputs,
        block_forward=_block_forward,
        get_block=get_block,
        set_block=set_block,
        weight_get=weight_get,
        weight_set=weight_set,
    )

    def loss_fn(p, batch):
        out = forward(p, batch["x"])
        return jnp.sum((out - batch["y"]) ** 2, axis=-1)

    return ModelAdapter(
        name="toy",
        params=params,
        loss_fn=loss_fn,
        stacks=[stack],
        model_prefixes={"toy.blocks": "toy"},
    )


def make_toy_batch(n=16, dim=8, seed=0):
    rng = np.random.default_rng(seed + 100)
    return {
        "x": jnp.asarray(rng.normal(size=(n, dim)), jnp.float32),
        "y": jnp.asarray(rng.normal(size=(n, dim)), jnp.float32),
    }
