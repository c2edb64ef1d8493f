"""Multimodal / zero-shot classification task (accuracy).

Reference: ``MultimodalClassificationTask`` — ``model.predict`` argmax vs
label -> accuracy (LAVIS/lavis/tasks/multimodal_classification.py:24-103);
used for ImageNet zero-shot EVA-CLIP eval.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ecoflap_tpu.core.registry import registry


def accuracy(logits, labels) -> float:
    pred = np.asarray(jnp.argmax(jnp.asarray(logits), axis=-1))
    return float((pred == np.asarray(labels)).mean())


@registry.register("task", "multimodal_classification")
class ClassificationTask:
    def __init__(self, predict_fn=None):
        self.predict_fn = predict_fn  # batch -> (B, C) logits

    def evaluation(self, batches) -> Dict[str, float]:
        correct = total = 0
        for batch in batches:
            logits = self.predict_fn(batch)
            pred = np.asarray(jnp.argmax(jnp.asarray(logits), axis=-1))
            labels = np.asarray(batch["label"])
            correct += int((pred == labels).sum())
            total += len(labels)
        return {"agg_metrics": 100.0 * correct / max(total, 1)}


@registry.register("task", "image_text_pretrain")
class ImageTextPretrainTask:
    """No-op evaluation — exists to drive the calibration data path
    (image_text_pretrain.py:20)."""

    def evaluation(self, batches) -> Dict[str, float]:
        return {}


@registry.register("task", "language_modeling")
class LanguageModelingTask(ImageTextPretrainTask):
    pass
