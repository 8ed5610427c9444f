"""User-extension surface: composable Dataset→Dataset pipelines.

The reference has no extension surface — algorithm choice is compile-time
(``src/main.c:55-181``, SURVEY.md §2.11).  This engine exposes one: a
``Pipeline`` of named steps (each a ``Dataset -> Dataset`` callable), so a
new vertex program or transform plugs in without touching the
superstep/checkpoint machinery, plus a registry used by ``__ray_entry__``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data as rd

Step = Callable[[rd.Dataset], rd.Dataset]


@dataclass
class Pipeline:
    """A linear composition of named Dataset transforms.

    >>> p = Pipeline([("canon", G.canonicalize), ("deg", G.undirected_degrees)])
    >>> out = p(edges)
    """

    steps: list[tuple[str, Step]]
    metrics: list[dict[str, Any]] = field(default_factory=list)

    def __call__(self, ds: rd.Dataset) -> rd.Dataset:
        import time

        self.metrics.clear()
        for name, step in self.steps:
            t0 = time.perf_counter()
            ds = step(ds)
            self.metrics.append(
                {"step": name, "define_s": time.perf_counter() - t0}
            )
        return ds

    def then(self, name: str, step: Step) -> "Pipeline":
        return Pipeline(self.steps + [(name, step)])


_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(name: str):
    """Decorator: expose a pipeline/operator in the engine registry."""

    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def registry() -> dict[str, Callable[..., Any]]:
    return dict(_REGISTRY)
