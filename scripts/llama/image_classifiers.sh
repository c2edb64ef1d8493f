#!/bin/bash
# LLaMA/image_classifiers launcher parity (reference README.md:16-27):
#   python main.py --model [deit_base|convnext_tiny] --prune_metric wanda \
#       --prune_granularity row --sparsity 0.5
# Here: deit = ViT tower + classifier head (prune_deit/prune_vit),
# convnext = stage-structured pwconv pruning (prune_convnext).
# ARGS: [deit|convnext] [sparsity] [extra cli.prune flags...]
set -e
MODEL=${1:-deit}
SPARSITY=${2:-0.5}
shift 2 2>/dev/null || shift $# # remaining args pass through
KEEP=$(python -c "print(1 - $SPARSITY)")
case $MODEL in
  deit)     SPEC="12-$KEEP-1.0-1.0" ;;
  convnext) SPEC="0-$KEEP-1.0-1.0" ;;
  *) echo "unknown model $MODEL (deit|convnext)"; exit 2 ;;
esac
exec python -m ecoflap_tpu.cli.prune \
    --model "$MODEL" --model_scale full \
    --pruning_method "${MODEL}_wanda_pruner" \
    --prune_spec "$SPEC" \
    --num_samples 128 --batch_size 16 \
    "$@"
