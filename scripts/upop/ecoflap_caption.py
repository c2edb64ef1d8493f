#!/usr/bin/env python
"""UPop-path BLIP captioner ECoFLaP + masked fine-tuning
(reference UPop/ecoflap_compress_caption.py:231-311: MEZO-GradOnly_sum,
num_data_first_stage 32, max sparsity = target + 0.1, then masked FT).

Demonstrates the full prune -> masked-finetune loop with the blip1 adapter.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=float, default=0.5, help="target sparsity")
    ap.add_argument("--model_scale", default="tiny", choices=["tiny", "full"])
    ap.add_argument("--num_samples", type=int, default=32)
    ap.add_argument("--finetune_steps", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    from ecoflap_tpu.models import blip1
    from ecoflap_tpu.pruning.pruners import WandaPruner
    from ecoflap_tpu.runners.finetune import finetune

    cfg = blip1.blip_base() if args.model_scale == "full" else blip1.tiny_config()
    params = blip1.init_params(
        cfg, jax.random.PRNGKey(0),
        dtype=jnp.bfloat16 if args.model_scale == "full" else jnp.float32)
    adapter = blip1.make_adapter(cfg, params)

    rng = np.random.default_rng(0)
    n = args.num_samples
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(n, cfg.vit.img_size, cfg.vit.img_size, 3)),
            jnp.float32),
        "caption_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, 16)), jnp.int32),
        "caption_mask": jnp.ones((n, 16), jnp.int32),
    }

    keep = 1.0 - args.p
    pruner = WandaPruner(
        adapter, batch, num_microbatches=max(1, n // 8),
        stack_specs={
            "visual_encoder.blocks": f"{cfg.vit.depth}-{keep}-1.0-1.0",
            "text_decoder.bert.encoder.layer":
                f"{cfg.text.num_layers}-{keep}-1.0-1.0",
        },
        sparsity_ratio_granularity="block",
        max_sparsity_per_layer=min(args.p + 0.1, 1.0),
        score_method="MEZO-GradOnly_sum",
        num_data_first_stage=min(32, n),
        verbose=False,
    )
    params, sd = pruner.prune()
    out = {"sparsity": pruner.check_sparsity(), "groups": len(sd or {})}

    if args.finetune_steps:
        params, losses = finetune(
            adapter.loss_fn, params, [batch] * args.finetune_steps,
            optimizer=optax.adamw(1e-5, weight_decay=0.05))
        out["ft_loss_first"], out["ft_loss_last"] = losses[0], losses[-1]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
