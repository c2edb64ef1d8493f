"""Layer-streaming fine-stage engine: one calibration pass per stack.

Functional rebuild of the reference's per-block loop
(``T5LayerWandaPruner._prune`` wanda_pruner.py:217-290, ``VITLayerWandaPruner.
_prune`` :499-568, SparseGPT variants sparsegpt_pruner.py:468-543):

  capture block-0 inputs -> per block: collect per-linear activation stats ->
  compute masks / OBS-sweep at the block's assigned ratio -> write pruned
  weights -> re-forward the block with pruned weights to produce the next
  block's inputs.

The Catcher-module / forward-hook machinery disappears: ``prepare_inputs``
returns the stacked calibration activations directly and ``block_forward``
collects stats inline (XLA fuses the Σx² / XᵀX accumulation into the forward
matmuls). All samples ride in ONE batched forward per block per pass — the
reference's per-sample Python loop (wanda_pruner.py:250-253) becomes a single
MXU-shaped call. Matching the reference, the block is re-forwarded *after*
pruning so downstream blocks calibrate against the pruned upstream
(wanda_pruner.py:281-285).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from ecoflap_tpu.pruning.adapter import StackSpec
from ecoflap_tpu.pruning.sparsegpt import (
    sparsegpt_prune_weight,
    sparsegpt_prune_weight_group,
)
from ecoflap_tpu.pruning.wanda import (
    apply_mask,
    mask_n_m,
    mask_per_row,
    mask_per_tensor,
    wanda_metric,
)

PyTree = Any


def _num_sequences(x: jax.Array) -> int:
    return x.shape[0]


def chunked_prepare(
    prepare_inputs: Callable,
    params: PyTree,
    batch: Any,
    num_chunks: int,
):
    """Run a stack's ``prepare_inputs`` over the calibration batch in
    sequential chunks and reassemble (x, cache).

    prepare_inputs can contain a full upstream tower forward (e.g. the T5
    decoder stack's prepare runs ViT + Q-Former + T5 encoder, blip2.py
    dec_prepare); at 128 samples the ViT attention scores alone are ~5 GB
    f32, so the batch must stream. Cache reassembly heuristic: a mapped leaf
    of shape (C, mb, ...) is batch-dependent iff its second dim == mb —
    those concat to (B, ...); anything else is shared and takes chunk 0.
    """
    if num_chunks <= 1:
        return prepare_inputs(params, batch)
    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    assert b % num_chunks == 0, (b, num_chunks)
    mb = b // num_chunks
    chunks = jax.tree_util.tree_map(
        lambda a: a.reshape(num_chunks, mb, *a.shape[1:]), batch
    )

    def one(mb_batch):
        return prepare_inputs(params, mb_batch)

    x, cache = jax.lax.map(one, chunks)
    # x's per-chunk batch may differ from mb (e.g. NLVR doubles images)
    bx = x.shape[1]
    x = x.reshape(num_chunks * bx, *x.shape[2:])

    def fix(a):
        if a.ndim >= 2 and a.shape[1] in (mb, bx):
            return a.reshape(num_chunks * a.shape[1], *a.shape[2:])
        return a[0]

    cache = jax.tree_util.tree_map(fix, cache)
    return x, cache


def chunked_block_apply(
    block_forward: Callable,
    bp: PyTree,
    x: jax.Array,
    cache: Any,
    collect: Optional[str],
    num_chunks: int,
):
    """Run one block over the calibration batch in ``num_chunks`` sequential
    chunks (lax.scan), summing activation statistics across chunks.

    Keeps the live activation set at single-chunk scale — the full-batch
    attention scores of a 257-token ViT at 128 samples alone are ~5 GB f32,
    which OOMs a 16 GB chip next to 8 GB of bf16 params. Cache leaves whose
    leading dim equals the batch are chunked; shared leaves (position biases)
    broadcast.

    ``collect="hessian_bf16"`` accumulates f32 across chunks (exactly like
    "hessian") and casts the FINAL stats to bf16 on output — one rounding,
    half the Hessian bytes leaving the program (the per-block stat outputs
    count against the axon tunnel's cumulative-allocation budget)."""
    out_bf16 = collect == "hessian_bf16"
    if out_bf16:
        collect = "hessian"

    def finish(stats):
        if out_bf16:
            return jax.tree_util.tree_map(
                lambda s: s.astype(jnp.bfloat16), stats)
        return stats

    if num_chunks <= 1:
        y, stats = block_forward(bp, x, cache, collect=collect)
        return y, finish(stats)
    b = x.shape[0]
    assert b % num_chunks == 0, (b, num_chunks)
    xc = x.reshape(num_chunks, b // num_chunks, *x.shape[1:])

    def sel(a, i):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == b:
            return a.reshape(num_chunks, b // num_chunks, *a.shape[1:])[i]
        return a

    cache0 = jax.tree_util.tree_map(lambda a: sel(a, 0), cache)
    _, stats_shapes = jax.eval_shape(
        lambda bp_, x_, c_: block_forward(bp_, x_, c_, collect=collect),
        bp, xc[0], cache0,
    )
    init_stats = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), stats_shapes
    )

    def body(stats_acc, i):
        mb_cache = jax.tree_util.tree_map(lambda a: sel(a, i), cache)
        y, stats = block_forward(bp, xc[i], mb_cache, collect=collect)
        stats_acc = jax.tree_util.tree_map(jnp.add, stats_acc, stats)
        return stats_acc, y

    stats, ys = jax.lax.scan(body, init_stats, jnp.arange(num_chunks))
    return ys.reshape(b, *ys.shape[2:]), finish(stats)


class FinePrograms:
    """One stack's fine-stage programs + optional AOT compile overlap.

    ``warm_async`` lowers+compiles the fused step against ABSTRACT inputs in
    a daemon thread — started at prune() begin, every stack's ~2-min XL
    fused-program compile overlaps the coarse stage and the earlier stacks'
    execution instead of serializing at each stack's block 0 (the round-5
    solo bench measured 108/108/125 s of per-stack compile dominating the
    375 s SparseGPT preset). ``fused`` joins the warm thread and calls the
    AOT executable (donation is preserved through lower/compile); any
    signature mismatch falls back to the plain jit path.
    """

    def __init__(self, fused_step, prune_leaf, groups):
        self.fused_step = fused_step
        self.prune_leaf = prune_leaf
        self.groups = groups
        self._aot = None
        self._thread = None
        self.used_aot = False

    def warm_async(self, blocks_abs, x_abs, cache_abs, ratio_names) -> None:
        import threading

        def _go():
            try:
                args = (
                    blocks_abs, x_abs, cache_abs,
                    jax.ShapeDtypeStruct((), jnp.float32),
                    {ln: jax.ShapeDtypeStruct((), jnp.float32)
                     for ln in ratio_names},
                    jax.ShapeDtypeStruct((), jnp.int32),
                )
                self._aot = self.fused_step.lower(*args).compile()
            except Exception:
                self._aot = None

        self._thread = threading.Thread(target=_go, daemon=True)
        self._thread.start()

    def fused(self, *args):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._aot is not None:
            try:
                out = self._aot(*args)
                self.used_aot = True
                return out
            except Exception:
                self._aot = None  # signature drift: recompile via jit once
        return self.fused_step(*args)


def make_wanda_prune_fn(per_row_mask: bool, prune_n: int, prune_m: int):
    """(w_f32, col_sq_sum, n_seq, ratio) -> pruned w (wanda_metric + the
    reference's per-row/per-tensor mask)."""

    def prune_weight(w, col_sq_sum, n_seq, ratio):
        metric = wanda_metric(w, col_sq_sum.astype(jnp.float32) / n_seq)
        if prune_n != 0:
            mask = mask_n_m(metric, prune_n, prune_m)
        elif per_row_mask:
            mask = mask_per_row(metric, ratio)
        else:
            mask = mask_per_tensor(metric, ratio)
        return apply_mask(w, mask)

    return prune_weight


def make_sparsegpt_prune_fns(blocksize: int, percdamp: float,
                             prune_n: int, prune_m: int):
    """(serial, grouped-or-None) OBS sweep fns; group gated by
    ECOFLAP_SPARSEGPT_GROUP."""

    def prune_weight(w, xtx, n_seq, ratio):
        # upcast BEFORE scaling: bf16-stored Hessians sweep in f32
        h = (2.0 / n_seq) * xtx.astype(jnp.float32)  # SparseGPT.add_batch
        return sparsegpt_prune_weight(
            w, h, ratio, blocksize=blocksize, percdamp=percdamp,
            prune_n=prune_n, prune_m=prune_m,
        )

    def prune_weight_group(ws, xtxs, n_seq, ratios):
        # batched lanes over a block's same-shape linears (q/k/v/o,
        # wi_0/wi_1): the serial OBS column sweep is latency-bound on TPU,
        # so K lanes sweep together (VERDICT r4 weak #3). Per-lane results
        # match the serial path up to batched-matmul reduction order.
        hs = (2.0 / n_seq) * xtxs.astype(jnp.float32)
        return sparsegpt_prune_weight_group(
            ws, hs, ratios, blocksize=blocksize, percdamp=percdamp,
            prune_n=prune_n, prune_m=prune_m,
        )

    group_fn = (prune_weight_group
                if os.environ.get("ECOFLAP_SPARSEGPT_GROUP", "1") == "1"
                else None)
    return prune_weight, group_fn


def make_block_programs(
    stack: StackSpec,
    collect: str,
    prune_weight_fn: Callable,
    num_chunks: int,
    prune_weight_group_fn: Optional[Callable],
    blocks_tpl: PyTree,
):
    """(fused_step, prune_leaf, groups) for one stack's fine stage.

    ``blocks_tpl`` only supplies SHAPES (real arrays or ShapeDtypeStructs) —
    exported at module level so the XL mesh compile smoke
    (__graft_entry__._dryrun_xl_impl) can AOT-lower the exact fine-stage
    program against abstract XL-shaped inputs without running it.

    * fused_step(blocks, x, cache, n_seq, ratios, i): collect -> prune ->
      re-forward in ONE donated program (stats stay jit-internal).
    * prune_leaf(full, stat, n_seq, ratio, i): one linear's own program
      (the unfused path's memory-tight variant).
    * groups: same-kernel-shape linear groups; groups of >=2 route through
      ``prune_weight_group_fn`` (batched OBS lanes, sparsegpt.py).
    """
    from ecoflap_tpu.core.pytree import get_leaf, set_leaf

    l2p = stack.local_to_path or {}

    def _shape_groups():
        """Same-kernel-shape linear groups (distinct tree paths only:
        a shared leaf must not be swept twice)."""
        groups: Dict[Any, list] = {}
        seen_paths = set()
        for local in stack.linear_names:
            path = f"{l2p.get(local, local)}.kernel"
            if path in seen_paths:
                continue
            seen_paths.add(path)
            shape = tuple(get_leaf(blocks_tpl, path).shape[1:])
            groups.setdefault(shape, []).append(local)
        return list(groups.values())

    groups = (_shape_groups() if prune_weight_group_fn is not None
              else [[ln] for ln in stack.linear_names])

    def _prune_block_impl(blocks, stats, n_seq, ratios, i):
        new = blocks
        zeros = jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64
                          else jnp.int32)
        numel = 0
        for group in groups:
            if len(group) >= 2:
                ws = jnp.stack([
                    get_leaf(new, f"{l2p.get(ln, ln)}.kernel")[i].T
                    .astype(jnp.float32) for ln in group])
                sts = jnp.stack([stats[ln].astype(jnp.float32)
                                 for ln in group])
                rts = jnp.stack([ratios[ln] for ln in group])
                w2s = prune_weight_group_fn(ws, sts, n_seq, rts)
                for k, ln in enumerate(group):
                    path = f"{l2p.get(ln, ln)}.kernel"
                    full = get_leaf(new, path)
                    w2 = w2s[k]
                    zeros = zeros + jnp.sum(w2 == 0).astype(zeros.dtype)
                    numel += w2.size
                    new = set_leaf(
                        new, path,
                        full.at[i].set(w2.T.astype(full.dtype)))
                continue
            local = group[0]
            path = f"{l2p.get(local, local)}.kernel"
            full = get_leaf(new, path)
            w = full[i].T.astype(jnp.float32)
            w2 = prune_weight_fn(w, stats[local], n_seq, ratios[local])
            # measured sparsity accumulates IN-program: a post-prune
            # counting pass would allocate against an exhausted budget
            zeros = zeros + jnp.sum(w2 == 0).astype(zeros.dtype)
            numel += w2.size
            new = set_leaf(new, path, full.at[i].set(w2.T.astype(full.dtype)))
        return new, (zeros, numel)

    def _prune_leaf_impl(full, stat, n_seq, ratio, i):
        """One linear's sweep — its own small program. Keeps per-program
        workspace at one sweep's temps: the monolithic per-block program
        (11 OBS sweeps incl. two 5120^2 Hinv temps for the T5 decoder)
        tips the axon tunnel's allocation budget at XL scale."""
        w = full[i].T.astype(jnp.float32)
        w2 = prune_weight_fn(w, stat, n_seq, ratio)
        zeros = jnp.sum(w2 == 0).astype(jnp.int32)
        return full.at[i].set(w2.T.astype(full.dtype)), zeros

    prune_leaf = jax.jit(_prune_leaf_impl, donate_argnums=(0,))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fused_step(blocks, x, cache, n_seq, ratios, i):
        """collect -> prune -> re-forward, stats jit-internal."""
        bp = jax.tree_util.tree_map(lambda a: a[i], blocks)
        _, stats = chunked_block_apply(
            stack.block_forward, bp, x, cache, collect, num_chunks)
        new, zn = _prune_block_impl(blocks, stats, n_seq, ratios, i)
        bp2 = jax.tree_util.tree_map(lambda a: a[i], new)
        x2, _ = chunked_block_apply(
            stack.block_forward, bp2, x, cache, None, num_chunks)
        return new, x2, zn

    return FinePrograms(fused_step, prune_leaf, groups)


def _stream_prune_stack(
    stack: StackSpec,
    params: PyTree,
    batch: Any,
    collect: str,
    prune_weight_fn: Callable,  # (w_f32, stats, n_seq, ratio) -> w_pruned
    sparsity_ratio: Mapping[str, float],
    num_chunks: int,
    verbose: bool,
    counters: Optional[Dict[str, int]] = None,
    fuse_block_step: bool = False,
    consume_params: bool = False,
    prune_weight_group_fn: Optional[Callable] = None,
    programs: Optional["FinePrograms"] = None,
) -> PyTree:
    """Shared layer-streaming loop with a DONATED per-block prune program.

    ``consume_params=True`` skips the defensive stack copy and donates the
    CALLER's stacked leaves to the prune programs — the input ``params`` tree
    must not be used afterwards (its stack buffers are consumed). Saves one
    stack-sized allocation (~7.6 GB across BLIP-2 XL stacks) against the
    cumulative device budget.

    ``fuse_block_step=True`` additionally fuses stats-collection, pruning and
    the re-forward into ONE donated program per block, so the per-linear
    Hessians (SparseGPT's ~200 MB/block) never leave jit workspace —
    eliminating the last per-block allocation against the axon tunnel's
    cumulative budget. TPU-validated at XL (both methods faster and
    SparseGPT's decoder phase survives; ROUND2_NOTES.md run table) — the
    pruner default is ON (pruners.py); this low-level function keeps False
    for direct callers without stacked-storage metadata expectations.

    The per-block update donates the stack's stacked leaves to one jitted
    program (all layers of the block pruned in place), and the re-forward
    donates the activation buffer — per-block device allocation is ~zero.
    Without donation the functional block writes copy every stacked leaf per
    block (~60 GB of churn for the T5 decoder at XL scale), which exhausts
    the device allocator. The stack's leaves are copied ONCE up front so the
    caller's original tree stays valid; the donated loop then works in place
    on the copies.

    Falls back to accessor-routed (copying) updates for stacks without
    standard stacked-storage metadata.
    """
    from ecoflap_tpu.core.pytree import get_leaf, set_leaf

    prep = jax.jit(
        functools.partial(chunked_prepare, stack.prepare_inputs,
                          num_chunks=num_chunks)
    )
    fwd_collect = jax.jit(
        functools.partial(
            chunked_block_apply, stack.block_forward,
            collect=collect, num_chunks=num_chunks,
        )
    )
    # re-forward donates x: the pre-prune activations are dead afterwards
    fwd = jax.jit(
        functools.partial(
            chunked_block_apply, stack.block_forward,
            collect=None, num_chunks=num_chunks,
        ),
        donate_argnums=(1,),
    )

    import time as _time

    _t0 = _time.time()
    x, cache = prep(params, batch)
    n_seq = jnp.float32(_num_sequences(x))
    if verbose:
        x.block_until_ready()
        print(f"prepared inputs ({stack.name}) +{_time.time() - _t0:.1f}s")

    fast = stack.blocks_path is not None
    if fast:
        l2p = stack.local_to_path or {}
        if programs is None:
            programs = make_block_programs(
                stack, collect, prune_weight_fn, num_chunks,
                prune_weight_group_fn,
                get_leaf(params, stack.blocks_path),
            )
        fused_step, prune_leaf = programs.fused, programs.prune_leaf

        # Defensive copy ONCE per stack: the donated per-block program then
        # updates these copies in place, and the caller's original tree stays
        # valid (one stack-sized allocation instead of one per block).
        # consume_params donates the caller's buffers directly instead.
        blocks = get_leaf(params, stack.blocks_path)
        if not consume_params:
            blocks = jax.tree_util.tree_map(jnp.array, blocks)
        _block_walls = []  # block 0 carries the compiles; rest = steady
        for i in range(stack.num_blocks):
            if verbose:
                print(f"pruning block {i} ({stack.name}) +{_time.time() - _t0:.1f}s")
            ratios = {
                local: jnp.float32(sparsity_ratio[stack.weight_key(i, local)])
                for local in stack.linear_names
            }
            if fuse_block_step:
                blocks, x, (zeros, numel) = fused_step(
                    blocks, x, cache, n_seq, ratios, jnp.asarray(i, jnp.int32))
            else:
                bp = jax.tree_util.tree_map(lambda a: a[i], blocks)
                _, stats = fwd_collect(bp, x, cache)
                idx = jnp.asarray(i, jnp.int32)
                zeros, numel = 0, 0
                for local in stack.linear_names:
                    path = f"{l2p.get(local, local)}.kernel"
                    full = get_leaf(blocks, path)
                    full, z = prune_leaf(full, stats[local], n_seq,
                                         ratios[local], idx)
                    blocks = set_leaf(blocks, path, full)
                    zeros += int(z)
                    numel += int(full.shape[1] * full.shape[2])
                bp = jax.tree_util.tree_map(lambda a: a[i], blocks)
                x, _ = fwd(bp, x, cache)
            if counters is not None:
                counters["zeros"] = counters.get("zeros", 0) + int(zeros)
                counters["total"] = counters.get("total", 0) + int(numel)
            x.block_until_ready()  # bound dispatch depth
            _block_walls.append(_time.time())
        if counters is not None and _block_walls:
            # cold/warm attribution (BENCH cache_state): block 0 absorbs the
            # per-stack program compiles, blocks 1+ are steady-state
            t_prep = _t0
            counters[f"first_block_s::{stack.name}"] = round(
                _block_walls[0] - t_prep, 3)
            if len(_block_walls) > 1:
                counters[f"steady_block_s::{stack.name}"] = round(
                    (_block_walls[-1] - _block_walls[0])
                    / (len(_block_walls) - 1), 3)
        return set_leaf(params, stack.blocks_path, blocks)

    # fallback: accessor-routed functional updates (copying)
    prune_weight_fn = jax.jit(prune_weight_fn)
    for i in range(stack.num_blocks):
        bp = stack.get_block(params, i)
        _, stats = fwd_collect(bp, x, cache)
        for local in stack.linear_names:
            key = stack.weight_key(i, local)
            if verbose:
                print(f"pruning layer {i} name {local}")
            w = stack.weight_get(bp, local)
            ratio = jnp.asarray(sparsity_ratio[key], jnp.float32)
            w_pruned = prune_weight_fn(
                w.astype(jnp.float32), stats[local], n_seq, ratio
            ).astype(w.dtype)
            bp = stack.weight_set(bp, local, w_pruned)
        params = stack.set_block(params, i, bp)
        x, _ = fwd(bp, x, cache)
        x.block_until_ready()
    return params


def _host_stream_prune_stack(
    stack: StackSpec,
    params: PyTree,
    batch: Any,
    collect: str,
    prune_weight_fn: Callable,
    sparsity_ratio: Mapping[str, float],
    num_chunks: int,
    verbose: bool,
    counters: Optional[Dict[str, int]] = None,
) -> PyTree:
    """Host-resident-weights variant of the streaming loop: the stack's
    stacked leaves live in HOST memory (numpy) and only ONE block is on
    device at a time.

    This is the single-chip big-model mode (reference analogue: LLaMA
    ``device_map="auto"`` layer streaming, LLaMA/main.py:70-72): a 7B
    LLaMA's 13.5 GB of bf16 block weights never coexist with the
    calibration activations on the 16 GB chip — device live-set is
    2 activation buffers + one block (~200 MB) + chunk workspace. Per block:
    upload -> fused collect+prune+re-forward (block params and activations
    DONATED) -> download the pruned kernels. Upload/download traffic is one
    model's worth each way per stack pass.

    ``stack.prepare_inputs`` must not touch the stacked blocks (it computes
    embeddings/biases only — true for every adapter in models/); the blocks
    subtree is replaced by an empty container for the prepare program so the
    host copies are never bulk-transferred.
    """
    import numpy as np

    from ecoflap_tpu.core.pytree import get_leaf, set_leaf

    assert stack.blocks_path is not None, "host_stream needs stacked storage"
    l2p = stack.local_to_path or {}
    def to_host(a):
        h = np.asarray(a)
        # device->host views are read-only; the loop writes pruned kernels
        return h if h.flags.writeable else h.copy()

    blocks = get_leaf(params, stack.blocks_path)
    host_blocks = jax.tree_util.tree_map(to_host, blocks)
    del blocks
    params_light = set_leaf(params, stack.blocks_path, ())

    prep = jax.jit(
        functools.partial(chunked_prepare, stack.prepare_inputs,
                          num_chunks=num_chunks)
    )
    import time as _time

    _t0 = _time.time()
    x, cache = prep(params_light, batch)
    n_seq = jnp.float32(_num_sequences(x))
    if verbose:
        x.block_until_ready()
        print(f"prepared inputs ({stack.name}, host-stream) "
              f"+{_time.time() - _t0:.1f}s")

    kernel_paths = sorted({f"{l2p.get(l, l)}.kernel"
                           for l in stack.linear_names})

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def host_fused_step(bp, x, cache, n_seq, ratios):
        """collect -> prune -> re-forward for ONE device-resident block."""
        _, stats = chunked_block_apply(
            stack.block_forward, bp, x, cache, collect, num_chunks)
        new_bp = bp
        zeros = jnp.zeros((), jnp.int32)
        numel = 0
        for local in stack.linear_names:
            path = f"{l2p.get(local, local)}.kernel"
            w = get_leaf(new_bp, path)
            w2 = prune_weight_fn(
                w.T.astype(jnp.float32), stats[local], n_seq, ratios[local])
            zeros = zeros + jnp.sum(w2 == 0).astype(jnp.int32)
            numel += w2.size
            new_bp = set_leaf(new_bp, path, w2.T.astype(w.dtype))
        x2, _ = chunked_block_apply(
            stack.block_forward, new_bp, x, cache, None, num_chunks)
        return new_bp, x2, (zeros, numel)

    for i in range(stack.num_blocks):
        if verbose:
            print(f"pruning block {i} ({stack.name}, host-stream) "
                  f"+{_time.time() - _t0:.1f}s")
        ratios = {
            local: jnp.float32(sparsity_ratio[stack.weight_key(i, local)])
            for local in stack.linear_names
        }
        bp = jax.device_put(
            jax.tree_util.tree_map(lambda a: a[i], host_blocks))
        bp, x, (zeros, numel) = host_fused_step(bp, x, cache, n_seq, ratios)
        for path in kernel_paths:
            host_leaf = get_leaf(host_blocks, path)
            host_leaf[i] = np.asarray(get_leaf(bp, path))
        if counters is not None:
            counters["zeros"] = counters.get("zeros", 0) + int(zeros)
            counters["total"] = counters.get("total", 0) + int(numel)
        del bp
        x.block_until_ready()
    return set_leaf(params, stack.blocks_path, host_blocks)


def prune_stack_wanda(
    stack: StackSpec,
    params: PyTree,
    batch: Any,
    sparsity_ratio: Mapping[str, float],
    prune_n: int = 0,
    prune_m: int = 0,
    num_chunks: int = 1,
    verbose: bool = True,
    counters: Optional[Dict[str, int]] = None,
    fuse_block_step: bool = False,
    consume_params: bool = False,
    host_stream: bool = False,
    programs: Optional[FinePrograms] = None,
) -> PyTree:
    """Wanda-prune one stack, streaming calibration activations once."""
    prune_weight = make_wanda_prune_fn(stack.per_row_mask, prune_n, prune_m)

    if host_stream:
        return _host_stream_prune_stack(
            stack, params, batch, "wanda", prune_weight, sparsity_ratio,
            num_chunks, verbose, counters,
        )
    return _stream_prune_stack(
        stack, params, batch, "wanda", prune_weight, sparsity_ratio,
        num_chunks, verbose, counters, fuse_block_step, consume_params,
        programs=programs,
    )


def prune_stack_sparsegpt(
    stack: StackSpec,
    params: PyTree,
    batch: Any,
    sparsity_ratio: Mapping[str, float],
    blocksize: int = 128,
    percdamp: float = 0.01,
    prune_n: int = 0,
    prune_m: int = 0,
    num_chunks: int = 1,
    verbose: bool = True,
    counters: Optional[Dict[str, int]] = None,
    fuse_block_step: bool = False,
    consume_params: bool = False,
    hessian_bf16: bool = False,
    host_stream: bool = False,
    programs: Optional[FinePrograms] = None,
) -> PyTree:
    """SparseGPT-prune one stack (Hessian per linear, OBS column sweep).

    ``hessian_bf16`` stores the accumulated Gram matrices in bf16 (f32 MXU
    accumulation per chunk, bf16 cross-chunk sums) — halves the Hessian
    bytes that leave jit per block; the OBS sweep still runs in f32 after
    upcast. Mask agreement vs f32 accumulation is tested in
    tests/test_engine.py."""

    prune_weight, group_fn = make_sparsegpt_prune_fns(
        blocksize, percdamp, prune_n, prune_m)
    if host_stream:
        return _host_stream_prune_stack(
            stack, params, batch,
            "hessian_bf16" if hessian_bf16 else "hessian",
            prune_weight, sparsity_ratio, num_chunks, verbose, counters,
        )
    return _stream_prune_stack(
        stack, params, batch, "hessian_bf16" if hessian_bf16 else "hessian",
        prune_weight, sparsity_ratio,
        num_chunks, verbose, counters, fuse_block_step, consume_params,
        prune_weight_group_fn=group_fn,
        programs=programs,
    )


def check_stack_sparsity(
    stack: StackSpec, params: PyTree, verbose: bool = True
) -> float:
    """Global zero-fraction over a stack's prunable weights
    (T5LayerWandaPruner.check_sparsity, wanda_pruner.py:139-163)."""
    count = 0
    total = 0
    for i in range(stack.num_blocks):
        bp = stack.get_block(params, i)
        sub_count = 0
        sub_total = 0
        for local in stack.linear_names:
            w = stack.weight_get(bp, local)
            sub_count += int(jnp.sum(w == 0))
            sub_total += int(w.size)
        if verbose:
            print(f"layer {i} sparsity {sub_count / sub_total:.6f}")
        count += sub_count
        total += sub_total
    return count / total
