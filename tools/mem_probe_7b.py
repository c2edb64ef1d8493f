"""AOT memory probe for the LLaMA-7B coarse-stage loss program.

Compiles (never runs) the suffix-plan chunked loss at 7B shapes on the real
device and prints XLA's memory analysis — the cheap way to find a
(num_data_first_stage, eval_chunk) point that fits the 15.75 GB chip before
committing to an hour-long run. No 13.5 GB of weights is ever allocated:
everything lowers from ShapeDtypeStructs.

Usage: python tools/mem_probe_7b.py [N1 chunk_size ...]
"""
import sys

import jax
import jax.numpy as jnp

from ecoflap_tpu.models import llama
from ecoflap_tpu.pruning.mezo import make_chunked_loss
from ecoflap_tpu.pruning.plans import CACHE_KEY, START_KEY, X_KEY, masked_suffix_scan


def probe(n1: int, chunk: int) -> None:
    cfg = llama.llama_7b()
    dtype = jnp.bfloat16
    S, D = 2048, cfg.d_model
    params_shape = jax.eval_shape(
        lambda k: llama.init_params(cfg, k, dtype=dtype), jax.random.PRNGKey(0))
    stack = llama.make_stack(cfg)

    def plan_loss(params, data):
        blocks = params["layers"]
        y = masked_suffix_scan(
            stack.block_forward, blocks, data[X_KEY], data[CACHE_KEY],
            data[START_KEY])
        return llama.loss_from_hidden(cfg, params, y, data["input_ids"])

    num_chunks = max(1, n1 // chunk)
    loss = make_chunked_loss(plan_loss, num_chunks, (START_KEY,), n1)
    data_shape = {
        "input_ids": jax.ShapeDtypeStruct((n1, S), jnp.int32),
        X_KEY: jax.ShapeDtypeStruct((n1, S, D), dtype),
        # cache = (bias=None, cos, sin): calibration windows are pure-causal
        # since llama._prepare_cache stopped building the (S, S) bias
        CACHE_KEY: (
            None,
            jax.ShapeDtypeStruct((S, cfg.head_dim), jnp.float32),
            jax.ShapeDtypeStruct((S, cfg.head_dim), jnp.float32),
        ),
        START_KEY: jax.ShapeDtypeStruct((), jnp.int32),
    }
    print(f"--- N1={n1} chunk={chunk} ({num_chunks} chunks): lowering...",
          flush=True)
    compiled = jax.jit(loss).lower(params_shape, data_shape).compile()
    m = compiled.memory_analysis()
    gb = 1 << 30
    print(f"    args {m.argument_size_in_bytes / gb:.2f} GB  "
          f"temp {m.temp_size_in_bytes / gb:.2f} GB  "
          f"out {m.output_size_in_bytes / gb:.3f} GB  "
          f"total {(m.argument_size_in_bytes + m.temp_size_in_bytes + m.output_size_in_bytes) / gb:.2f} GB",
          flush=True)


if __name__ == "__main__":
    argv = [int(a) for a in sys.argv[1:]]
    pts = list(zip(argv[::2], argv[1::2])) or [(32, 2)]
    for n1, c in pts:
        probe(n1, c)
