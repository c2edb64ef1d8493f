#!/usr/bin/env python
"""ECoFLaP zeroth-order on standalone FlanT5 with C4 calibration
(reference scripts/t5/ecoflap.py:10-31: MEZO-GradOnly_avg, spec
24-0.5-1.0-1.0)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from ecoflap_tpu.cli.prune import main

if __name__ == "__main__":
    main([
        "--model", "t5",
        "--pruning_method", "t5_wanda_pruner",
        "--prune_spec", "24-0.5-1.0-1.0",
        "--sparsity_ratio_granularity", "block",
        "--score_method", "MEZO-GradOnly_avg",
        "--max_sparsity_per_layer", "0.6",
        "--num_data_first_stage", "128",
        "--num_samples", "128", "--batch_size", "8",
        "--model_scale", "full",
    ] + sys.argv[1:])
