"""Named registries.

The reference dispatches by ``eval()`` on user strings (similarity fn at
`describe_broad_neurons.py:67`, hook paths at `concept_vit/utils.py:81`, torchvision weights at
`data_utils.py:82-89`). We replace that with explicit registries: safe, introspectable, and
compatible with static jit tracing."""
from __future__ import annotations

from typing import Dict, Generic, Iterator, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, T] = {}

    def register(self, key: str, obj: T | None = None):
        """Use as decorator (``@reg.register("name")``) or direct call."""
        if obj is not None:
            self._entries[key] = obj
            return obj

        def deco(fn: T) -> T:
            self._entries[key] = fn
            return fn

        return deco

    def get(self, key: str) -> T:
        if key not in self._entries:
            raise KeyError(
                f"{self.name!r} registry has no entry {key!r}; available: {sorted(self._entries)}"
            )
        return self._entries[key]

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._entries))

    def keys(self):
        return sorted(self._entries)
