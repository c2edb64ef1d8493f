#!/bin/bash
# CoOp zero-shot CLIP ECoFLaP-wanda over the reference's 11-dataset sweep
# (reference scripts/coop/ecoflap_wanda.sh:10-50: two loops — plain wanda,
# then wanda + MEZO-GradOnly_sum block coarse stage — specs 1-0.6-1-1
# (keep 0.6 = sparsity 0.4), max sparsity/layer 0.5, ViT-B/16, eval-only
# zero-shot with each dataset's CUSTOM_TEMPLATE prompt).
#
# DATA must hold one imagefolder per dataset: $DATA/<dataset>/<class>/*.jpg
# (the rebuild's data contract; the reference uses split JSONs instead).
# Optional: CKPT=path/to/openai_vit_b16.pth imports real CLIP weights.
set -e

DATA=${DATA:-/data/clip_data}
SEED=${SEED:-1}
KEEP=0.6                      # remaining_sparsity in the reference script
MAX_SPARSITY_PER_LAYER=0.5
SCALE=${SCALE:-full}
EXTRA=${EXTRA:-}
CKPT_ARG=${CKPT:+--ckpt $CKPT}

DATASETS="caltech101 dtd eurosat fgvc_aircraft food101 imagenet oxford_flowers oxford_pets stanford_cars sun397 ucf101"

run_one () {  # $1 dataset, $2 output subdir, extra prune flags in $3...
    local DATASET=$1 OUT=$2; shift 2
    mkdir -p "$OUT"
    python -m ecoflap_tpu.cli.prune \
        --model clip --model_scale "$SCALE" $CKPT_ARG \
        --pruning_method clip_wanda_pruner \
        --prune_spec "12-${KEEP}-1.0-1.0" \
        --dataset "$DATASET" --calib "$DATA/$DATASET" \
        --num_samples 64 --batch_size 16 \
        --seed "$SEED" --output_dir "$OUT" --save_pruned \
        "$@" $EXTRA
    CKPT_DIR=$(ls -d "$OUT"/pruned_* 2>/dev/null | tail -1)
    python -m ecoflap_tpu.cli.evaluate \
        --model clip --model_scale "$SCALE" --task classification \
        --dataset "$DATASET" --vis_root "$DATA/$DATASET" \
        --prompt_templates coop --checkpoint "$CKPT_DIR" \
        --output_dir "$OUT" $EXTRA
}

# loop 1: plain wanda (uniform per-layer ratio)
for DATASET in $DATASETS; do
    run_one "$DATASET" "output/ZeroshotCLIP/wanda${KEEP}_vit_b16_s${SEED}/${DATASET}"
done

# loop 2: wanda + ECoFLaP zeroth coarse stage (MEZO-GradOnly_sum, block)
for DATASET in $DATASETS; do
    run_one "$DATASET" \
        "output/ZeroshotCLIP/wanda_mezo${KEEP}_vit_b16_s${SEED}/${DATASET}" \
        --sparsity_ratio_granularity block \
        --max_sparsity_per_layer "$MAX_SPARSITY_PER_LAYER" \
        --score_method MEZO-GradOnly_sum \
        --num_data_first_stage 64
done
