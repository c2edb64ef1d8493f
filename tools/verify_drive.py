#!/usr/bin/env python
"""End-to-end drive of the public pruning API (the /verify recipe).

Runs on the default device (TPU in production; --cpu forces the CPU backend).
Exercises: two-stage wanda w/ MeZO block allocation, uniform SparseGPT,
iterative global magnitude, the BLIP-2 graft entry, and error probes.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ecoflap_tpu.pruning.loader import load_pruner
from tests.toy import make_toy_adapter, make_toy_batch

results = {}
print("device:", jax.devices()[0])

# 1. two-stage wanda, MeZO block allocation
adapter = make_toy_adapter(num_blocks=3, dim=16, hidden=32)
batch = make_toy_batch(n=16, dim=16)
pruner = load_pruner(
    "blipt5_wanda_pruner", adapter, batch, 4,
    dict(prune_spec="3-0.5-1.0-1.0", sparsity_ratio_granularity="block",
         score_method="MEZO-GradOnly_sum", max_sparsity_per_layer=0.7,
         num_data_first_stage=8, verbose=False),
)
params, sd = pruner.prune()
s = pruner.check_sparsity()
assert 0.4 <= s <= 0.6, s
assert sd and max(sd.values()) <= 0.7 + 1e-6
assert any(k.startswith("toy.blocks.") for k in sd)
results["wanda_mezo_block"] = round(s, 4)

# 2. uniform sparsegpt; loss should beat random pruning
adapter2 = make_toy_adapter(num_blocks=3, dim=16, hidden=32)
dense_loss = float(jnp.mean(adapter2.loss_fn(adapter2.params, batch)))
p2 = load_pruner("blipt5_sparsegpt_pruner", adapter2, batch, 4,
                 dict(prune_spec="3-0.5-1.0-1.0", verbose=False))
params2, _ = p2.prune()
s2 = p2.check_sparsity()
sgpt_loss = float(jnp.mean(adapter2.loss_fn(params2, batch)))
assert 0.4 <= s2 <= 0.6, s2
results["sparsegpt_uniform"] = round(s2, 4)
results["loss_dense_vs_sgpt"] = [round(dense_loss, 3), round(sgpt_loss, 3)]

# 3. iterative global magnitude
adapter3 = make_toy_adapter(num_blocks=3, dim=16, hidden=32)
p3 = load_pruner("blipt5_global_mag_pruner", adapter3, batch, 4,
                 dict(prune_spec="3-0.5-1.0-1.0", is_global=True, iteration=3,
                      verbose=False))
params3, _ = p3.prune()
zeros = sum(int(jnp.sum(x == 0)) for x in jax.tree_util.tree_leaves(params3))
total = sum(x.size for x in jax.tree_util.tree_leaves(params3))
assert 0.4 <= zeros / total <= 0.6
results["global_mag_iter3"] = round(zeros / total, 4)

# 4. probes
try:
    load_pruner("nope_pruner", adapter, batch, 4, {})
    raise SystemExit("expected KeyError")
except KeyError as e:
    assert "blipt5_wanda_pruner" in str(e)
try:
    from ecoflap_tpu.core.spec import parse_prune_spec
    parse_prune_spec("badspec")
    raise SystemExit("expected ValueError")
except ValueError:
    pass
try:
    load_pruner("blipt5_wanda_pruner", adapter, batch, 4,
                dict(prune_spec="3-0.5-1.0-1.0",
                     sparsity_ratio_granularity="block",
                     max_sparsity_per_layer=0.3, verbose=False)).prune()
    raise SystemExit("expected AssertionError")
except AssertionError:
    pass
results["probes"] = "ok"

# 5. flash-attention kernel parity (TPU only — Pallas path)
if jax.default_backend() == "tpu":
    from ecoflap_tpu.ops.attention import mha

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qh = jax.random.normal(ks[0], (1, 4, 2048, 128), jnp.bfloat16)
    kh = jax.random.normal(ks[1], (1, 4, 2048, 128), jnp.bfloat16)
    vh = jax.random.normal(ks[2], (1, 4, 2048, 128), jnp.bfloat16)
    o_f = np.asarray(mha(qh, kh, vh, sm_scale=128**-0.5, causal=True,
                         mode="flash"), np.float32)
    o_n = np.asarray(mha(qh, kh, vh, sm_scale=128**-0.5, causal=True,
                         mode="naive"), np.float32)
    flash_err = float(np.abs(o_f - o_n).max())
    assert flash_err < 0.05, flash_err
    results["flash_attn_max_err"] = round(flash_err, 5)

# 6. graft entry + multichip dryrun (dryrun only meaningful with >1 device)
import __graft_entry__ as g

fn, (p, b) = g.entry()
loss = float(jax.jit(fn)(p, b))
assert np.isfinite(loss)
results["graft_entry_loss"] = round(loss, 4)
if len(jax.devices()) >= 2:
    g.dryrun_multichip(min(8, len(jax.devices())))
    results["dryrun_multichip"] = "ok"

print(json.dumps(results))
print("VERIFY PASS")
