"""Sharding rules: regex path -> PartitionSpec over the (dp, tp) mesh.

Megatron-style 2-D tensor parallelism for every transformer in the zoo
(scaling-book recipe: pick a mesh, annotate shardings, let XLA insert the
collectives):

* column-parallel on the layer INPUT side (qkv/in_proj/fc1/wi/gate/up):
  kernel (..., in, out) sharded on ``out`` -> activations leave sharded by
  head/ffn chunk, no collective;
* row-parallel on the OUTPUT side (proj/out_proj/fc2/wo/o/down): kernel
  sharded on ``in`` -> XLA inserts one psum per block (the classic 2
  all-reduces per transformer block, riding ICI);
* embeddings/vocab heads sharded on the vocab axis; norms/biases replicated.

Rules match against the flattened pytree path (``core.pytree.flatten_named``
naming). First match wins; default is replicated.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

Rule = Tuple[str, P]

# stacked-block kernels are (L, in, out): axis 1 = in, axis 2 = out
COL = P(None, None, "tp")  # shard out
ROW = P(None, "tp", None)  # shard in

# Non-stacked 2-D kernels (in, out)
COL2 = P(None, "tp")
ROW2 = P("tp", None)

DEFAULT_RULES: List[Rule] = [
    # --- EVA ViT / generic blocks (stacked) ---
    (r".*blocks\.attn\.qkv\.kernel$", COL),
    (r".*blocks\.attn\.proj\.kernel$", ROW),
    (r".*blocks\.attn\.(q|k|v|in_proj)\.kernel$", COL),
    (r".*blocks\.attn\.(o|out_proj)\.kernel$", ROW),
    (r".*blocks\.mlp\.(fc1|c_fc|wi_0|wi_1|gate|up)\.kernel$", COL),
    (r".*blocks\.mlp\.(fc2|c_proj|wo|down)\.kernel$", ROW),
    # qkv biases follow their kernel's out axis
    (r".*blocks\.attn\.(q_bias|v_bias)$", P(None, "tp")),
    # --- T5 encoder/decoder attention (stacked) ---
    (r".*\.(self_attn|cross_attn|attn)\.(q|k|v)\.kernel$", COL),
    (r".*\.(self_attn|cross_attn|attn)\.o\.kernel$", ROW),
    # --- LLaMA layers subtree uses 'layers.' prefix ---
    (r".*layers\.attn\.(q|k|v)\.kernel$", COL),
    (r".*layers\.attn\.o\.kernel$", ROW),
    (r".*layers\.mlp\.(gate|up)\.kernel$", COL),
    (r".*layers\.mlp\.down\.kernel$", ROW),
    # --- embeddings / heads ---
    (r".*(shared|embed_tokens|token_embedding)$", COL2),
    (r".*lm_head\.kernel$", COL2),
    (r".*patch_embed\.kernel$", COL2),
    (r".*head\.kernel$", P(None, None)),
]


def spec_for_path(
    path: str, rules: Sequence[Rule] = DEFAULT_RULES
) -> P:
    for pat, spec in rules:
        if re.match(pat, path):
            return spec
    return P()


def _fit_spec(spec: P, ndim: int, shape, mesh: Mesh) -> P:
    """Drop axes the array doesn't have / can't divide; keep XLA happy."""
    parts = list(spec) + [None] * (ndim - len(spec))
    parts = parts[:ndim]
    out = []
    for i, p in enumerate(parts):
        if p is None:
            out.append(None)
            continue
        size = mesh.shape[p]
        out.append(p if shape[i] % size == 0 else None)
    return P(*out)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def make_param_shardings(
    params: PyTree,
    mesh: Mesh,
    rules: Sequence[Rule] = DEFAULT_RULES,
) -> PyTree:
    """Pytree of NamedShardings matching ``params``' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(
            mesh,
            _fit_spec(spec_for_path(_path_str(path), rules), v.ndim, v.shape, mesh),
        ),
        params,
    )


def shard_params(
    params: PyTree, mesh: Mesh, rules: Sequence[Rule] = DEFAULT_RULES
) -> PyTree:
    """Device-put params with the rule-derived shardings."""
    sh = make_param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def shard_batch(batch: PyTree, mesh: Mesh) -> PyTree:
    """Shard every leaf's leading axis over dp (replicate if indivisible)."""
    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % mesh.shape["dp"] == 0:
            return jax.device_put(x, NamedSharding(mesh, P("dp")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)
