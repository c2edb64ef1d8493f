"""Annotation-driven calibration smoke for the prune CLI.

Exercises the NON-synthetic branch of ``cli/prune.py`` — LAVIS-style caption
annotation JSON + real image files decoded by PIL through the dataset builder
and ``ImageEvalProcessor``, tokenized, stacked into the calibration batch, and
run through the full two-stage prune on the CURRENT default backend (TPU under
the axon tunnel; ``--cpu`` forces the CPU backend).

Reference path being exercised: prefix_language_pretraining.py:29-55 (the
annotation-driven calibration loader) + evaluate_blip.py's prune entry. The
zero-egress image has no downloaded vocab files, so the tokenizer is the
deterministic HashTokenizer fallback (data/calibration.py:38-74) — the rest of
the pipeline (JSON -> PIL decode -> processor resize/normalize -> batch ->
prune on device) is the real thing.

Usage: python tools/realdata_smoke.py [--cpu] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPTION_WORDS = [
    "a", "photo", "of", "dog", "cat", "running", "on", "the", "beach",
    "small", "red", "bicycle", "near", "water", "two", "people",
]


def make_fixtures(root: str, n: int = 16, img_hw: int = 24) -> str:
    """LAVIS caption-format annotations + real JPEG files under ``root``."""
    from PIL import Image

    rng = np.random.default_rng(0)
    ann = []
    for i in range(n):
        rel = f"img_{i:03d}.jpg"
        arr = (rng.random((img_hw, img_hw, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, rel), quality=90)
        words = rng.choice(CAPTION_WORDS, size=int(rng.integers(4, 9)))
        ann.append({
            "image": rel,
            "caption": " ".join(words),
            "image_id": i,
        })
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the fixture dir (prints the path)")
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="ecoflap_realdata_")
    try:
        ann_path = make_fixtures(root)
        from ecoflap_tpu.cli.prune import main as prune_main

        argv = [
            "--model", "blip2_t5", "--model_scale", "tiny",
            "--pruning_method", "blipt5_wanda_pruner",
            "--prune_spec", "2-0.5-1.0-1.0",
            "--vit_prune_spec", "3-0.5-1.0-1.0",
            "--sparsity_ratio_granularity", "block",
            "--score_method", "MEZO-GradOnly_sum",
            "--max_sparsity_per_layer", "0.6",
            "--num_data_first_stage", "16",
            "--calib", ann_path, "--vis_root", root,
            "--num_samples", "16", "--batch_size", "4",
            "--output_dir", os.path.join(root, "out"),
            "--job_id", "realdata_smoke",
        ]
        if args.cpu:
            argv += ["--platform", "cpu"]
        result = prune_main(argv)
        assert 0.40 < result["prunable_sparsity"] < 0.60, result
        import jax

        print(f"realdata smoke OK on backend={jax.default_backend()}: "
              f"sparsity {result['prunable_sparsity']} "
              f"wall {result['wall_clock_s']}s")
    finally:
        if args.keep:
            print(f"fixtures kept at {root}")
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
