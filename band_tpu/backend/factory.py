"""Backend registry: the second-backend seam.

The reference lets backends register creators with a static factory
(band/backend_factory.h:195-203, weak-symbol registration at
backend_factory.cc:10-33) and the engine enumerates what is present.
Round 1 hard-bound the engine to the XLA executor; this registry
restores the seam without pretending a second NN backend exists today:

 * ``"xla"`` — the default: per-(subgraph, worker) jitted XLA
   executables, mesh-sharded on multi-device workers
   (backend/executor.ModelExecutor).
 * A custom backend registers an executor class with the same duck
   interface (prepare_subgraph / execute / execute_batched /
   program / input_ids / output_ids / largest_subgraph_key /
   has_subgraph / subgraph_keys / mesh_dims) and is selected per
   worker via ``WorkerSpec.backend``.

The host custom-op path intentionally stays inside ModelExecutor (it
is per-*subgraph* eager fallback, not a per-worker backend — a
subgraph with custom ops on a host worker runs op-by-op while its
siblings stay compiled).
"""

from __future__ import annotations

from typing import Callable, Dict, List

from ..errors import ConfigError

_REGISTRY: Dict[str, Callable] = {}


def register_backend(name: str, creator: Callable) -> None:
    """Register an executor creator.  ``creator(model_id, graph,
    worker_id, devices, exact=..., host=..., mesh_shape=...)`` must
    return a ModelExecutor-compatible object."""
    _REGISTRY[name.lower()] = creator


def available_backends() -> List[str]:
    return sorted(_REGISTRY)


def create_executor(name: str, *args, **kwargs):
    creator = _REGISTRY.get((name or "xla").lower())
    if creator is None:
        raise ConfigError(
            f"unknown backend {name!r}; available: {available_backends()}"
        )
    return creator(*args, **kwargs)


def _register_default() -> None:
    from .executor import ModelExecutor

    register_backend("xla", ModelExecutor)


_register_default()
