"""``load_pruner`` — name->pruner dispatch with config kwargs.

Parity with ``lavis.compression.load_pruner``
(LAVIS/lavis/compression/__init__.py:29-46): look the class up in the pruner
registry and construct it with the model (adapter), calibration data and a
flat config dict.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

from ecoflap_tpu.core.registry import registry


def load_pruner(
    name: str,
    adapter: Any,
    data: Any,
    num_microbatches: int,
    cfg: Optional[Mapping[str, Any]] = None,
):
    # importing for registration side effects
    import ecoflap_tpu.pruning.pruners  # noqa: F401

    cls = registry.get_pruner_class(name)
    return cls(adapter=adapter, data=data, num_microbatches=num_microbatches, **(cfg or {}))
