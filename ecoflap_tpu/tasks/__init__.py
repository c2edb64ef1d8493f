"""Task registry (reference: lavis/tasks/__init__.py setup_task)."""

from ecoflap_tpu.core.registry import registry
from ecoflap_tpu.tasks import captioning, classification, lm, mmlu, retrieval, vqa  # noqa: F401


def setup_task(name: str, **kwargs):
    return registry.get("task", name)(**kwargs)
