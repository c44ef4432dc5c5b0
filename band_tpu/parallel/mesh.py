"""Mesh construction + sharded/batched program execution helpers.

The multi-chip execution tier: a "mesh worker" runs a subgraph program
jitted over a jax.sharding.Mesh with weights tensor-sharded ("tp"),
request batches sharded ("dp"), and subgraph chains pipelined across
stages ("pp" at the scheduler level).  ICI collectives are inserted by
GSPMD from the shardings alone (scaling-book recipe: pick a mesh,
annotate, let XLA do the rest)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend.program import SubgraphProgram
from .sharding import batch_sharding, param_shardings


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh crosses hosts (outputs must then be gathered
    back to replicated so the driver process can materialize them)."""
    return len({
        getattr(d, "process_index", 0) for d in mesh.devices.flat
    }) > 1


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: int = 1,
    tp: int = 1,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have "
                         f"{len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


class ShardedProgram:
    """A subgraph program jitted over a mesh with batch + weight sharding.

    The single-request program (batch folded into the model's own batch
    dim of 1) is vmapped to batch B, inputs sharded on "dp", weights on
    "tp"."""

    def __init__(
        self,
        prog: SubgraphProgram,
        mesh: Mesh,
        batch_size: int = 1,
        replicate_outputs: Optional[bool] = None,
    ):
        self.prog = prog
        self.mesh = mesh
        self.batch_size = batch_size
        if replicate_outputs is None:
            # cross-host meshes gather outputs so the driver process
            # can fetch them (serving results leave from the driver)
            replicate_outputs = mesh_spans_processes(mesh)
        base = prog.make_fn()

        def single(params, inputs):
            return base(params, list(inputs))

        if batch_size > 1:
            inner = jax.vmap(single, in_axes=(None, 0))
        else:
            inner = single
        if replicate_outputs:
            rep = NamedSharding(mesh, P())

            def fn(params, inputs):
                return [
                    jax.lax.with_sharding_constraint(o, rep)
                    for o in inner(params, inputs)
                ]
        else:
            fn = inner
        p_shard = param_shardings(prog, mesh)
        in_shard = (
            [batch_sharding(mesh) for _ in prog.input_ids]
            if batch_size > 1
            else [NamedSharding(mesh, P()) for _ in prog.input_ids]
        )
        self._fn = jax.jit(
            fn,
            in_shardings=(p_shard, tuple(in_shard)),
        )
        self.params = {
            k: jax.device_put(np.asarray(v), p_shard[k])
            for k, v in prog.params.items()
        }

    def __call__(self, inputs: Sequence[np.ndarray]) -> List[jax.Array]:
        return self._fn(self.params, tuple(inputs))


def make_batched_fn(prog: SubgraphProgram, mesh: Mesh, batch: int):
    """One sharded executable for a continuous-batching window on a
    mesh worker: B per-request input tuples are stacked inside the
    program, the stacked batch axis is sharded on "dp", weights stay
    sharded on "tp", and outputs are split back per request — all in a
    single dispatch (replaces round 1's serial per-request fallback;
    the reference's nearest contract is the one-interpreter-per-subgraph
    invoke, band/backend/tfl/model_executor.cc:249-255, generalized to
    one sharded batched program).

    Returns a jitted ``fn(params, inputs_batch)``; params should be the
    (already tp-sharded) placement from the worker's single-request
    ShardedProgram so every bucket shares one copy of the weights."""
    import jax.numpy as jnp

    n_pos = len(prog.input_ids)
    dp = mesh.shape.get("dp", 1)
    # with dp>1 the stacked batch is sharded across devices, so the
    # per-device effective batch driving strategy heuristics (e.g. the
    # integral-image window-sum crossover) is batch/dp (ADVICE r2)
    base = prog.make_fn(batch_hint=max(batch // max(dp, 1), 1))
    replicate_outputs = mesh_spans_processes(mesh)

    def single(params, inputs):
        return base(params, list(inputs))

    def fn(params, inputs_batch):
        stacked = []
        for p in range(n_pos):
            s = jnp.stack([ins[p] for ins in inputs_batch])
            if dp > 1 and batch % dp == 0:
                s = jax.lax.with_sharding_constraint(
                    s,
                    NamedSharding(
                        mesh, P(*(["dp"] + [None] * (s.ndim - 1)))
                    ),
                )
            stacked.append(s)
        outs = jax.vmap(single, in_axes=(None, 0))(params, tuple(stacked))
        if replicate_outputs:
            # cross-host window: gather results to every host so the
            # driver can hand them back to requesters
            rep = NamedSharding(mesh, P())
            outs = [
                jax.lax.with_sharding_constraint(o, rep) for o in outs
            ]
        return tuple(tuple(o[b] for o in outs) for b in range(batch))

    p_shard = param_shardings(prog, mesh)
    in_shard = tuple(
        tuple(NamedSharding(mesh, P()) for _ in range(n_pos))
        for _ in range(batch)
    )
    return jax.jit(fn, in_shardings=(p_shard, in_shard))
