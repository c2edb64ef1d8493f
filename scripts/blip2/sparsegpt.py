#!/usr/bin/env python
"""Uniform SparseGPT @0.5 baseline (reference scripts/blip2/sparsegpt.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from ecoflap_tpu.cli.prune import main

if __name__ == "__main__":
    main([
        "--model", "blip2_t5",
        "--pruning_method", "blipt5_sparsegpt_pruner",
        "--vit_prune_spec", "39-0.5-1.0-1.0",
        "--t5_prune_spec", "24-0.5-1.0-1.0",
        "--num_samples", "128", "--batch_size", "8",
        "--model_scale", "full",
    ] + sys.argv[1:])
