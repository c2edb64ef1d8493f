"""Model zoo. ``load_model_and_preprocess`` / ``load_model`` mirror the
reference's public factory (LAVIS/lavis/models/__init__.py:91-216); family
modules (blip2, t5, clip, llama, ...) hold the functional model cores."""

from ecoflap_tpu.models.zoo import (  # noqa: F401
    ModelBundle,
    load_model,
    load_model_and_preprocess,
)
