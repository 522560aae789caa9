"""Explicit name→class registries.

Replaces the reference's reflective module-walking lookup
(nnunet/training/model_restore.py:23-41 `recursive_find_python_class`) with explicit
registration: deterministic, import-cycle free, and greppable. Checkpoints and plans
still store *string names*, so reference artifacts that reference trainer/planner/
preprocessor class names resolve through these tables (with alias support for the
reference's class names).
"""
from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._table: dict[str, type] = {}

    def register(self, name: str | None = None, *, aliases: tuple[str, ...] = ()) -> Callable[[type], type]:
        def deco(cls: type) -> type:
            key = name or cls.__name__
            for k in (key, *aliases):
                if k in self._table and self._table[k] is not cls:
                    raise KeyError(f"{self.kind} registry: duplicate name {k!r}")
                self._table[k] = cls
            return cls

        return deco

    def get(self, name: str) -> type:
        if name not in self._table:
            raise KeyError(
                f"Unknown {self.kind} {name!r}. Registered: {sorted(self._table)}"
            )
        return self._table[name]

    def __contains__(self, name: str) -> bool:
        return name in self._table

    def names(self) -> list[str]:
        return sorted(self._table)


TRAINERS = Registry("trainer")
PLANNERS = Registry("planner")
PREPROCESSORS = Registry("preprocessor")
NETWORKS = Registry("network")


def resolve_trainer(name: str) -> type:
    # Import trainer modules lazily so registration side effects happen on demand.
    from multitalent_tpu.training import trainers as _t  # noqa: F401
    from multitalent_tpu.training import multitalent as _m  # noqa: F401
    from multitalent_tpu.training import warmup as _w  # noqa: F401
    from multitalent_tpu.training import cascade as _c  # noqa: F401
    from multitalent_tpu.training import variants as _v  # noqa: F401

    return TRAINERS.get(name)


def resolve_preprocessor(name: str) -> type:
    from multitalent_tpu.preprocessing import preprocessor as _p  # noqa: F401

    return PREPROCESSORS.get(name)


def resolve_planner(name: str) -> type:
    from multitalent_tpu.planning import experiment_planner as _e  # noqa: F401
    from multitalent_tpu.planning import multitalent_planner as _mp  # noqa: F401

    return PLANNERS.get(name)
