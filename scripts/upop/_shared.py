"""Shared flow for the UPop-path ECoFLaP launchers (nlvr / vqa /
retrieval_flickr — reference UPop/ecoflap_compress_nlvr.py,
ecoflap_compression_vqa.py, ecoflap_compression_retrieval_flickr.py).

All four reference launchers share the pruning config (MEZO-GradOnly_sum,
num_data_first_stage=32, max_sparsity_per_layer = p + 0.1, e.g.
ecoflap_compress_nlvr.py:242-250) and differ only in model head, batch
shape, and the task loss driving both the coarse scores and the masked
fine-tuning epochs. Each script provides those three pieces."""

import argparse
import json

import jax
import jax.numpy as jnp


def run(init_fn_name: str, adapter_fn_name: str, batch_builder,
        stack_names_fn):
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=float, default=0.5, help="target sparsity")
    ap.add_argument("--model_scale", default="tiny",
                    choices=["tiny", "small", "full"])
    ap.add_argument("--num_samples", type=int, default=32)
    ap.add_argument("--finetune_steps", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--ckpt", default=None,
                    help="UPop BLIP torch .pth (reference launchers start "
                         "from model_base_caption_capfilt_large.pth, "
                         "ecoflap_compress_caption.py:396; strict=False "
                         "semantics via convert_blip1)")
    ap.add_argument("--save_pruned", default=None,
                    help="write the pruned model as a reference-named torch "
                         ".pth (export_blip1)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    from ecoflap_tpu.models import blip1
    from ecoflap_tpu.pruning.pruners import WandaPruner
    from ecoflap_tpu.runners.finetune import finetune

    kind = {
        "make_adapter": "blip_caption",
        "make_vqa_adapter": "blip_vqa",
        "make_nlvr_adapter": "blip_nlvr",
        "make_retrieval_adapter": "blip_retrieval",
    }[adapter_fn_name]
    cfg = (blip1.tiny_config() if args.model_scale == "tiny"
           else blip1.blip_base())
    dtype = jnp.float32 if args.model_scale == "tiny" else jnp.bfloat16
    init_fn = getattr(blip1, init_fn_name)
    params = jax.jit(lambda k: init_fn(cfg, k, dtype=dtype))(
        jax.random.PRNGKey(0))
    if args.ckpt:
        from ecoflap_tpu.utils import checkpoint as ck

        params = ck.convert_blip1(ck.load_torch_checkpoint(args.ckpt), cfg,
                                  kind, params, dtype=dtype)
    adapter = getattr(blip1, adapter_fn_name)(cfg, params)

    batch = batch_builder(cfg, args.num_samples)
    keep = 1.0 - args.p
    stack_specs = {}
    for name, depth in stack_names_fn(cfg):
        stack_specs[name] = f"{depth}-{keep}-1.0-1.0"

    pruner = WandaPruner(
        adapter, batch, num_microbatches=max(1, args.num_samples // 8),
        stack_specs=stack_specs,
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=min(args.p + 0.1, 1.0),
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=min(32, args.num_samples),
        verbose=False,
    )
    params, sd = pruner.prune()
    out = {"sparsity": pruner.check_sparsity(), "groups": len(sd or {})}

    if args.finetune_steps:
        params, losses = finetune(
            adapter.loss_fn, params, [batch] * args.finetune_steps,
            optimizer=optax.adamw(1e-5, weight_decay=0.05))
        out["ft_loss_first"], out["ft_loss_last"] = losses[0], losses[-1]
    if args.save_pruned:
        from ecoflap_tpu.utils import checkpoint as ck

        ck.save_torch_checkpoint(ck.export_blip1(params, cfg, kind),
                                 args.save_pruned)
        out["pruned_checkpoint"] = args.save_pruned
    print(json.dumps(out))
