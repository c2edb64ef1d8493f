#!/usr/bin/env python
"""ECoFLaP zeroth-order + Wanda on BLIP-2 FlanT5-XL @0.5 — the headline run,
then the reference's 5-task eval chain on the pruned checkpoint.

Mirrors the reference launcher (scripts/blip2/ecoflap_zeroth.py:10-56):
prune leg = MEZO-GradOnly_sum, block granularity, max sparsity/layer 0.6,
specs 39-0.5-1.0-1.0 (ViT) / 24-0.5-1.0-1.0 (T5), 128 calib samples @ bs 8,
--save_pruned_model; eval legs = vqav2/gqa/okvqa/nocaps/ret_flickr zero-shot
on the pruned .pth (one subprocess per leg, like the reference).

Usage: python scripts/blip2/ecoflap_zeroth.py [--model_scale tiny|full]
       [--no_eval] [--eval_tasks a,b] [...]
Other args pass through to ecoflap_tpu.cli.prune.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _chain

if __name__ == "__main__":
    args = [
        "--model", "blip2_t5",
        "--pruning_method", "blipt5_wanda_pruner",
        "--vit_prune_spec", "39-0.5-1.0-1.0",
        "--t5_prune_spec", "24-0.5-1.0-1.0",
        "--sparsity_ratio_granularity", "block",
        "--score_method", "MEZO-GradOnly_sum",
        "--max_sparsity_per_layer", "0.6",
        "--num_data_first_stage", "128",
        "--num_samples", "128", "--batch_size", "8",
    ]
    argv = sys.argv[1:]
    if "--model_scale" not in argv:
        argv = ["--model_scale", "full"] + argv
    _chain.run(args, argv)
