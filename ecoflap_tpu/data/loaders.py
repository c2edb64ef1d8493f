"""Loader utilities — MultiIterLoader / IterLoader / prefetch rebuilt.

Reference (LAVIS/lavis/datasets/datasets/dataloader_utils.py:15-127):
* ``IterLoader`` — infinite epoch-resetting iterator.
* ``MultiIterLoader`` — samples among multiple loaders with given ratios.
* ``PrefetchLoader`` — CUDA-stream prefetch; on TPU the analogue is simple
  double-buffered host->device transfer (``jax.device_put`` of batch N+1
  while N computes — XLA's async dispatch gives the overlap for free, so the
  prefetcher just stays one step ahead).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence

import numpy as np


class IterLoader:
    """Infinite iterator over a re-iterable loader (epoch auto-reset)."""

    def __init__(self, loader_factory: Callable[[], Iterable]):
        self._factory = loader_factory
        self._it = iter(self._factory())
        self.epoch = 0

    def __iter__(self):
        return self

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self.epoch += 1
            self._it = iter(self._factory())
            return next(self._it)


class MultiIterLoader:
    """Sample among loaders with probabilities ``ratios``
    (dataloader_utils.py:15-56)."""

    def __init__(self, loaders: Sequence[IterLoader],
                 ratios: Optional[Sequence[float]] = None, seed: int = 0):
        if ratios is None:
            ratios = [1.0] * len(loaders)
        total = float(sum(ratios))
        self.ratios = [r / total for r in ratios]
        self.loaders = list(loaders)
        self.rng = np.random.default_rng(seed)

    def __next__(self):
        idx = int(self.rng.choice(len(self.loaders), p=self.ratios))
        return next(self.loaders[idx])

    def __iter__(self):
        return self


class PrefetchLoader:
    """Keep one device-resident batch ahead (the TPU PrefetchLoader)."""

    def __init__(self, loader: Iterable, to_device: Optional[Callable] = None):
        import jax

        self.loader = loader
        self.to_device = to_device or (
            lambda b: jax.tree_util.tree_map(jax.device_put, b)
        )

    def __iter__(self):
        it = iter(self.loader)
        try:
            nxt = self.to_device(next(it))
        except StopIteration:
            return
        for batch in it:
            cur, nxt = nxt, self.to_device(batch)  # device_put is async
            yield cur
        yield nxt
