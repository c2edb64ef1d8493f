"""Global string->object registry.

TPU-native counterpart of the reference registry
(LAVIS/lavis/common/registry.py:23-230): the same eight kinds (model, pruner,
task, builder, processor, lr_scheduler, runner, path) so the reference's
config names resolve identically, implemented as one generic class instead of
eight copy-pasted decorator methods.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    """Name-spaced string->class registry with decorator registration."""

    _KINDS = (
        "model",
        "pruner",
        "task",
        "builder",
        "processor",
        "lr_scheduler",
        "runner",
        "path",
    )

    def __init__(self) -> None:
        self._maps: Dict[str, Dict[str, Any]] = {k: {} for k in self._KINDS}

    # -- generic API ---------------------------------------------------------
    def register(self, kind: str, name: str, obj: Any = None, force: bool = False):
        if kind not in self._maps:
            raise KeyError(f"unknown registry kind {kind!r}; valid: {self._KINDS}")

        def _do(o: Any) -> Any:
            table = self._maps[kind]
            if name in table and not force and table[name] is not o:
                raise KeyError(f"{kind} {name!r} already registered to {table[name]}")
            table[name] = o
            return o

        if obj is None:  # decorator form
            return _do
        return _do(obj)

    def get(self, kind: str, name: str, default: Any = None) -> Any:
        if kind not in self._maps:
            raise KeyError(f"unknown registry kind {kind!r}")
        if name not in self._maps[kind]:
            if default is not None:
                return default
            known = sorted(self._maps[kind])
            raise KeyError(f"{kind} {name!r} not registered; known: {known}")
        return self._maps[kind][name]

    def list(self, kind: str) -> list[str]:
        return sorted(self._maps[kind])

    # -- typed helpers (parity with registry.register_* in the reference) ----
    def register_model(self, name: str, force: bool = False) -> Callable:
        return self.register("model", name, force=force)

    def register_pruner(self, name: str, force: bool = False) -> Callable:
        return self.register("pruner", name, force=force)

    def register_task(self, name: str, force: bool = False) -> Callable:
        return self.register("task", name, force=force)

    def register_builder(self, name: str, force: bool = False) -> Callable:
        return self.register("builder", name, force=force)

    def register_processor(self, name: str, force: bool = False) -> Callable:
        return self.register("processor", name, force=force)

    def register_lr_scheduler(self, name: str, force: bool = False) -> Callable:
        return self.register("lr_scheduler", name, force=force)

    def register_runner(self, name: str, force: bool = False) -> Callable:
        return self.register("runner", name, force=force)

    def register_path(self, name: str, path: str) -> None:
        self.register("path", name, obj=path, force=True)

    def get_model_class(self, name: str) -> Any:
        return self.get("model", name)

    def get_pruner_class(self, name: str) -> Any:
        return self.get("pruner", name)

    def get_task_class(self, name: str) -> Any:
        return self.get("task", name)

    def get_builder_class(self, name: str) -> Any:
        return self.get("builder", name)

    def get_processor_class(self, name: str) -> Any:
        return self.get("processor", name)

    def get_lr_scheduler_class(self, name: str) -> Any:
        return self.get("lr_scheduler", name)

    def get_runner_class(self, name: str) -> Any:
        return self.get("runner", name)

    def get_path(self, name: str, default: Optional[str] = None) -> Optional[str]:
        try:
            return self.get("path", name)
        except KeyError:
            return default


registry = Registry()
