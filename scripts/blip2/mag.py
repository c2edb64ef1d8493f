#!/usr/bin/env python
"""Global magnitude baseline, 3 iterations (reference scripts/blip2/mag.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from ecoflap_tpu.cli.prune import main

if __name__ == "__main__":
    main([
        "--model", "blip2_t5",
        "--pruning_method", "blipt5_global_mag_pruner",
        "--prune_spec", "24-0.5-1.0-1.0",
        "--is_global", "--iteration", "3",
        "--num_samples", "128", "--batch_size", "8",
        "--model_scale", "full",
    ] + sys.argv[1:])
