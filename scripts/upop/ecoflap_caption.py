#!/usr/bin/env python
"""UPop-path BLIP captioner ECoFLaP + masked fine-tuning
(reference UPop/ecoflap_compress_caption.py:231-311: MEZO-GradOnly_sum,
num_data_first_stage 32, max sparsity = target + 0.1, then masked FT).

Accepts ``--ckpt model_base_caption_capfilt_large.pth`` (the reference's
starting checkpoint, ecoflap_compress_caption.py:396) and ``--save_pruned``
for the reference-named pruned artifact.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp
import numpy as np

import _shared


def batch_builder(cfg, n):
    rng = np.random.default_rng(0)
    s = cfg.vit.img_size
    return {
        "image": jnp.asarray(rng.normal(size=(n, s, s, 3)), jnp.float32),
        "caption_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, 16)), jnp.int32),
        "caption_mask": jnp.ones((n, 16), jnp.int32),
    }


def stack_names(cfg):
    return [("visual_encoder.blocks", cfg.vit.depth),
            ("text_decoder.bert.encoder.layer", cfg.text.num_layers)]


if __name__ == "__main__":
    _shared.run("init_params", "make_adapter", batch_builder, stack_names)
