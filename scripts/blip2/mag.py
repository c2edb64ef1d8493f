#!/usr/bin/env python
"""Global magnitude baseline, 3 iterations (reference scripts/blip2/mag.py).
Chains the reference 5-task eval loop on the pruned .pth (the shared
ecoflap_zeroth.py:38-56 pattern); --no_eval restores prune-only.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _chain

if __name__ == "__main__":
    args = [
        "--model", "blip2_t5",
        "--pruning_method", "blipt5_global_mag_pruner",
        "--prune_spec", "24-0.5-1.0-1.0",
        "--is_global", "--iteration", "3",
        "--num_samples", "128", "--batch_size", "8",
    ]
    argv = sys.argv[1:]
    if "--model_scale" not in argv:
        argv = ["--model_scale", "full"] + argv
    _chain.run(args, argv)
