#!/bin/bash
# CoOp zero-shot CLIP ECoFLaP-wanda (reference scripts/coop/ecoflap_wanda.sh:
# 10-50: specs 1-0.6-1-1 (keep 0.6 = sparsity 0.4), MEZO-GradOnly_sum block,
# max sparsity/layer 0.5, over 11 datasets).
python -m ecoflap_tpu.cli.prune \
    --model clip \
    --pruning_method clip_wanda_pruner \
    --prune_spec 12-0.6-1.0-1.0 \
    --sparsity_ratio_granularity block \
    --score_method MEZO-GradOnly_sum \
    --max_sparsity_per_layer 0.5 \
    --num_data_first_stage 64 \
    --num_samples 64 --batch_size 8 \
    --model_scale full "$@"
