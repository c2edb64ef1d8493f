#!/usr/bin/env python
"""ECoFLaP zeroth-order on EVA-CLIP-g visual tower @0.5, ImageNet zero-shot
(reference scripts/eva_clip/ecoflap.py:10-33: spec 40-0.5-1.0-1.0)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from ecoflap_tpu.cli.prune import main

if __name__ == "__main__":
    main([
        "--model", "eva_clip",
        "--pruning_method", "vit_wanda_pruner",
        "--prune_spec", "40-0.5-1.0-1.0",
        "--sparsity_ratio_granularity", "block",
        "--score_method", "MEZO-GradOnly_sum",
        "--max_sparsity_per_layer", "0.6",
        "--num_data_first_stage", "128",
        "--num_samples", "128", "--batch_size", "8",
        "--model_scale", "full",
    ] + sys.argv[1:])
