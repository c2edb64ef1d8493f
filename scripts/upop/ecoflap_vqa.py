#!/usr/bin/env python
"""UPop-path BLIP-VQA ECoFLaP + masked fine-tuning (reference
UPop/ecoflap_compression_vqa.py:264-266 config; answer-LM task loss through
question encoder + answer decoder)."""

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
        "question_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, 12)), jnp.int32),
        "question_mask": jnp.ones((n, 12), jnp.int32),
        "answer_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, size=(n, 6)), jnp.int32),
        "answer_mask": jnp.ones((n, 6), jnp.int32),
    }


def stack_names(cfg):
    return [("visual_encoder.blocks", cfg.vit.depth),
            ("text_encoder.encoder.layer", cfg.text.num_layers),
            ("text_decoder.bert.encoder.layer", cfg.text.num_layers)]


if __name__ == "__main__":
    _shared.run("init_vqa_params", "make_vqa_adapter", batch_builder,
                stack_names)
