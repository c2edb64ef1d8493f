#!/bin/bash
# ECoFLaP zeroth-order + Wanda on LLaMA-7B @0.6 sparsity
# (reference LLaMA/scripts/ecoflap_zero.sh:1-17: --sparsity_ratio 0.6,
#  approach_for_sparsity block, GradOnly + mezo, max/layer 0.7, 32 samples).
# NB spec fields are KEEP ratios: 0.4 keep == 0.6 sparsity.
python -m ecoflap_tpu.cli.prune \
    --model llama \
    --pruning_method llama_wanda_pruner \
    --prune_spec 32-0.4-1.0-1.0 \
    --sparsity_ratio_granularity block \
    --score_method MEZO-GradOnly_sum \
    --max_sparsity_per_layer 0.7 \
    --num_data_first_stage 32 \
    --num_samples 128 --batch_size 8 --seqlen 2048 \
    --model_scale full "$@"
