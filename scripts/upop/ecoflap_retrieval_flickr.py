#!/usr/bin/env python
"""UPop-path BLIP-retrieval ECoFLaP + masked fine-tuning (reference
UPop/ecoflap_compression_retrieval_flickr.py:365-367 config; ITM-CE task
loss through the bidirectional cross-attending text tower)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))

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
            ("text_encoder.encoder.layer", cfg.text.num_layers)]


if __name__ == "__main__":
    _shared.run("init_retrieval_params", "make_retrieval_adapter",
                batch_builder, stack_names)
