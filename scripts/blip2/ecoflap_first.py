#!/usr/bin/env python
"""ECoFLaP first-order (GradMagAbs_sum) + Wanda on BLIP-2
(reference scripts/blip2/ecoflap_first.py:12-29).
Chains the reference 5-task eval loop on the pruned .pth (the shared
ecoflap_zeroth.py:38-56 pattern); --no_eval restores prune-only."""

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
        "--score_method", "GradMagAbs_sum",
        "--max_sparsity_per_layer", "0.6",
        "--num_data_first_stage", "128",
        "--num_samples", "128", "--batch_size", "8",
    ]
    argv = sys.argv[1:]
    if "--model_scale" not in argv:
        argv = ["--model_scale", "full"] + argv
    _chain.run(args, argv)
