"""Zero-shot classification prompt templates.

The reference builds the ImageNet zero-shot classifier from the standard
OpenAI CLIP prompt-template ensemble (eva_model.py:530-544 iterates
``imagenet_templates``). The full 80-template list is public (CLIP repo);
``IMAGENET_TEMPLATES_SUBSET`` is the commonly used 7-template subset that
matches full-ensemble accuracy within ~0.1pt and is 11x cheaper to encode.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

IMAGENET_TEMPLATES_SUBSET: List[str] = [
    "itap of a {}.",
    "a bad photo of the {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
]

SIMPLE_TEMPLATE = ["a photo of a {}."]


def build_prompts(
    classnames: Sequence[str],
    templates: Sequence[str] = IMAGENET_TEMPLATES_SUBSET,
) -> List[str]:
    """Class-major prompt list (C·T entries) matching
    ``clip.zero_shot_classifier``'s reshape convention."""
    out: List[str] = []
    for name in classnames:
        clean = name.replace("_", " ")
        out.extend(t.format(clean) for t in templates)
    return out


def load_classnames(path: str) -> List[str]:
    """One classname per line (ImageNet synset order)."""
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]
