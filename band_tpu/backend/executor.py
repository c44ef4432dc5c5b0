"""ModelExecutor: per-(model, worker) cache of compiled subgraph
executables with device-resident weights.

TPU-native analogue of the reference's per-subgraph interpreter map
(band/backend/tfl/model_executor.h, interpreters_[key] built at
PrepareSubgraph, model_executor.cc:327-373): here PrepareSubgraph
builds a SubgraphProgram, places its params on the worker's device(s)
and caches a jitted callable; ExecuteSubgraph dispatches asynchronously
and returns device arrays.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..common import SubgraphKey
from ..errors import ExecutionError, LoweringError
from ..ir.graph import Graph
from ..ops.host_ops import has_host_impl, run_host_op
from ..ops.lowerings import LowerCtx
from ..ops.registry import get_lowering, is_supported
from .program import SubgraphProgram, build_program, prepare_params, subgraph_boundary


class ModelExecutor:
    """Holds compiled executables for one model on one worker."""

    def __init__(
        self,
        model_id: int,
        graph: Graph,
        worker_id: int,
        devices: Sequence[jax.Device],
        exact: bool = True,
        host: bool = False,
        donate_inputs: bool = False,
        mesh_shape: Sequence[int] = (),
    ):
        self.model_id = model_id
        self.graph = graph
        self.worker_id = worker_id
        self.devices = list(devices)
        self.exact = exact
        self.host = host
        self.mesh_shape = tuple(mesh_shape)
        # CPU backends lower int8 contractions to scalar code; use the
        # exact f32 nibble-split path there instead (see ops/lowerings)
        self.conv_mode = (
            "f32_split" if self.devices[0].platform == "cpu" else "int8"
        )
        self._lock = threading.Lock()
        self._programs: Dict[SubgraphKey, SubgraphProgram] = {}
        self._fns: Dict[SubgraphKey, object] = {}
        self._params: Dict[SubgraphKey, Dict[str, jax.Array]] = {}
        self._eager: Dict[SubgraphKey, bool] = {}
        self._batched: Dict[SubgraphKey, Dict[int, object]] = {}
        # (key, bucket) pairs whose executable has completed at least
        # once: a miss means the next dispatch pays an XLA compile
        # (minutes on this toolchain) — the engine exempts such
        # dispatches from the stuck-dispatch watchdog
        self._warm: set = set()
        # per-key largest warm bucket (read by Engine.ready_batch_limit
        # while a background warm-up is pending; kept as a plain dict so
        # readers never iterate the mutating set)
        self._warm_max: Dict[SubgraphKey, int] = {}
        self._meshes: Dict[SubgraphKey, object] = {}  # mesh workers only
        # cross-process serving: set by SpmdChannel.attach() on the
        # driver so every launch of a host-spanning program is announced
        # to the follower processes first (parallel/spmd.py)
        self._spmd = None
        # concurrent prepare_subgraph calls for the same key: first
        # caller builds, others wait on its event (no double compile /
        # transient double weight placement)
        self._preparing: Dict[SubgraphKey, threading.Event] = {}

    # ------------------------------------------------------------------
    def prepare_subgraph(
        self, op_indices: Sequence[int], unit_indices: Sequence[int]
    ) -> SubgraphKey:
        key = SubgraphKey(
            model_id=self.model_id,
            worker_id=self.worker_id,
            unit_indices=frozenset(unit_indices),
        )
        while True:
            with self._lock:
                if key in self._programs:
                    return key
                waiter = self._preparing.get(key)
                if waiter is None:
                    self._preparing[key] = threading.Event()
                    break
            waiter.wait(timeout=600)
        has_custom = any(
            self.graph.ops[oi].is_custom for oi in op_indices
        )
        try:
            self._prepare_locked(key, op_indices, has_custom)
        finally:
            with self._lock:
                ev = self._preparing.pop(key, None)
            if ev is not None:
                ev.set()
        return key

    def _prepare_locked(self, key, op_indices, has_custom) -> None:
        if has_custom and not self.host:
            raise LoweringError(
                "custom ops can only be prepared on host workers"
            )
        if has_custom:
            prog = self._build_custom_program(op_indices)
            eager = True
            fn = None
            params = {k: np.asarray(v) for k, v in prog.params.items()}
        elif len(self.devices) > 1:
            # mesh worker: weights tensor-sharded over the "tp" axis,
            # batches (continuous-batching windows) sharded over "dp";
            # dp x tp comes from WorkerSpec.mesh_shape (default: pure tp)
            from ..parallel.mesh import ShardedProgram, make_mesh

            prog = build_program(self.graph, op_indices, exact=self.exact,
                                 conv_mode=self.conv_mode)
            dp, tp = self.mesh_dims()
            mesh = make_mesh(self.devices, dp=dp, tp=tp)
            sp = ShardedProgram(prog, mesh, batch_size=1)
            eager = False
            fn = sp
            params = sp.params
            with self._lock:
                self._meshes[key] = mesh
        else:
            prog = build_program(self.graph, op_indices, exact=self.exact,
                                 conv_mode=self.conv_mode)
            eager = False
            fn = jax.jit(prog.make_fn())
            device = self.devices[0]
            params = {
                k: jax.device_put(v, device) for k, v in prog.params.items()
            }
        with self._lock:
            self._programs[key] = prog
            self._fns[key] = fn
            self._params[key] = params
            self._eager[key] = eager

    def _build_custom_program(self, op_indices) -> SubgraphProgram:
        op_indices = tuple(sorted(op_indices))
        inputs, outputs = subgraph_boundary(self.graph, op_indices)
        jittable = [
            oi for oi in op_indices if not self.graph.ops[oi].is_custom
        ]
        params, meta = prepare_params(self.graph, jittable, self.exact)
        # custom ops read their constant inputs (e.g. SSD anchors) as
        # plain params; prepare_params only covered the jittable ops
        for oi in op_indices:
            op = self.graph.ops[oi]
            if not op.is_custom:
                continue
            for tid in op.inputs:
                if tid < 0:
                    continue
                td = self.graph.tensor(tid)
                if td.is_constant and f"t{tid}" not in params:
                    params[f"t{tid}"] = np.ascontiguousarray(td.data)
        return SubgraphProgram(
            graph=self.graph,
            op_indices=op_indices,
            input_ids=tuple(inputs),
            output_ids=tuple(outputs),
            params=params,
            meta=meta,
            exact=self.exact,
            conv_mode=self.conv_mode,
        )

    def mesh_dims(self) -> Tuple[int, int]:
        """(dp, tp) for this worker's device group, from the config's
        mesh_shape (round 1 parsed but never consumed it): 2-D shapes
        are (dp, tp), 1-D shapes pure tp, default pure tp."""
        n = len(self.devices)
        if len(self.mesh_shape) == 2:
            return self.mesh_shape[0], self.mesh_shape[1]
        if len(self.mesh_shape) == 1:
            return max(n // self.mesh_shape[0], 1), self.mesh_shape[0]
        return 1, n

    # ------------------------------------------------------------------
    def has_subgraph(self, key: SubgraphKey) -> bool:
        return key in self._programs

    def subgraph_keys(self) -> List[SubgraphKey]:
        return list(self._programs)

    def program(self, key: SubgraphKey) -> SubgraphProgram:
        return self._programs[key]

    def input_ids(self, key: SubgraphKey) -> Tuple[int, ...]:
        return self._programs[key].input_ids

    def output_ids(self, key: SubgraphKey) -> Tuple[int, ...]:
        return self._programs[key].output_ids

    def largest_subgraph_key(self) -> Optional[SubgraphKey]:
        """Key covering the most ops (reference:
        IModelExecutor::GetLargestSubgraphKey)."""
        best, best_n = None, -1
        for key, prog in self._programs.items():
            if len(prog.op_indices) > best_n:
                best, best_n = key, len(prog.op_indices)
        return best

    # ------------------------------------------------------------------
    def execute(
        self, key: SubgraphKey, inputs: Sequence[np.ndarray]
    ) -> List[jax.Array]:
        """Dispatch the subgraph.  Returns (possibly not-yet-ready) device
        arrays; call block_until_ready on them to observe completion."""
        prog = self._programs.get(key)
        if prog is None:
            raise ExecutionError(f"subgraph {key} not prepared")
        if self._eager[key]:
            out = self._execute_eager(prog, inputs)
            # eager subgraphs compile nothing after the first run; leaving
            # them permanently cold would give every dispatch the
            # _compiling watchdog exemption — a genuinely wedged
            # retirement would go undetected (ADVICE r4)
            self._mark_warm(key, 1)
            return out
        fn = self._fns[key]
        if len(self.devices) > 1:
            # mesh path: the jitted fn has explicit in_shardings and
            # reshards host/device arrays itself; host-spanning groups
            # go through the SPMD channel (announce + sharded placement,
            # parallel/spmd.py run_window)
            if self._spmd is not None:
                out = self._spmd.run_window(self, key, [list(inputs)])[0]
                self._mark_warm(key, 1)
                return out
            args = tuple(
                v if isinstance(v, jax.Array) else np.asarray(v)
                for v in inputs
            )
            out = fn(args)
            self._mark_warm(key, 1)
            return out
        # canonicalize to committed device arrays so profiling (numpy
        # zeros) and serving (staged device inputs) share one jit cache
        # entry per subgraph
        device = self.devices[0]
        args = [
            v
            if isinstance(v, jax.Array)
            else jax.device_put(np.asarray(v), device)
            for v in inputs
        ]
        out = fn(self._params[key], args)
        self._mark_warm(key, 1)
        return out

    def _mark_warm(self, key: SubgraphKey, bucket: int) -> None:
        self._warm.add((key, bucket))
        if bucket > self._warm_max.get(key, 1):
            self._warm_max[key] = bucket

    def max_warm_bucket(self, key: SubgraphKey) -> int:
        """Largest bucket whose executable has completed at least once
        (1 if only single-request dispatches have run)."""
        return self._warm_max.get(key, 1)

    def is_warm(self, key: SubgraphKey, batch: int) -> bool:
        """Has the (key, bucket) executable completed at least once
        (i.e. the next dispatch will NOT pay an XLA compile)?"""
        bucket = 1 if batch <= 1 else 1 << (batch - 1).bit_length()
        return (key, bucket) in self._warm

    def execute_batched(
        self, key: SubgraphKey, inputs_batch: Sequence[Sequence]
    ) -> List[List[jax.Array]]:
        """Run B same-subgraph requests as one vmapped dispatch
        (continuous batching).  Returns per-request output lists."""
        B = len(inputs_batch)
        if B == 1:
            return [self.execute(key, inputs_batch[0])]
        if key not in self._programs:
            raise ExecutionError(f"subgraph {key} not prepared")
        # bucket to the next power of two (pad with the first request) so
        # at most log2(max_batch) executables exist per subgraph
        bucket = 1 << (B - 1).bit_length()
        if self._eager[key]:
            out = [self.execute(key, ins) for ins in inputs_batch]
            self._mark_warm(key, bucket)  # eager: nothing compiles
            return out
        if len(self.devices) > 1:
            # mesh worker: the whole window is ONE sharded dispatch —
            # batch on "dp", weights on "tp" (parallel/mesh.py
            # make_batched_fn); weight shards come from the prepared
            # single-request placement, shared across buckets.
            # Host-spanning groups go through the SPMD channel instead
            # (metadata announce + per-process dp-row placement).
            if self._spmd is not None:
                outs = self._spmd.run_window(
                    self, key, [list(ins) for ins in inputs_batch]
                )
                self._mark_warm(key, bucket)
                return outs
            fn = self._mesh_batched_fn(key, bucket)
            padded = list(inputs_batch) + [inputs_batch[0]] * (bucket - B)
            args = tuple(
                tuple(
                    v if isinstance(v, jax.Array) else np.asarray(v)
                    for v in ins
                )
                for ins in padded
            )
            outs = fn(self._params[key], args)
            self._mark_warm(key, bucket)
            return [list(outs[b]) for b in range(B)]
        fn = self._batched_fn(key, bucket)
        device = self.devices[0]
        padded = list(inputs_batch) + [inputs_batch[0]] * (bucket - B)
        args = tuple(
            tuple(
                v
                if isinstance(v, jax.Array)
                else jax.device_put(np.asarray(v), device)
                for v in ins
            )
            for ins in padded
        )
        outs = fn(self._params[key], args)
        self._mark_warm(key, bucket)
        return [list(outs[b]) for b in range(B)]

    def _mesh_batched_fn(self, key: SubgraphKey, batch: int):
        from ..parallel.mesh import make_batched_fn

        with self._lock:
            cache = self._batched.setdefault(key, {})
            if batch not in cache:
                cache[batch] = make_batched_fn(
                    self._programs[key], self._meshes[key], batch
                )
            return cache[batch]

    def _batched_fn(self, key: SubgraphKey, batch: int):
        """One executable per (subgraph, bucket): stacks the requests,
        vmaps the program, and splits outputs per request — all inside
        one dispatch (no per-request slice ops on the host)."""
        with self._lock:
            cache = self._batched.setdefault(key, {})
            if batch not in cache:
                base = self._programs[key].make_fn(batch_hint=batch)
                import jax.numpy as jnp

                def fn(params, inputs_batch):
                    n_pos = len(inputs_batch[0])
                    stacked = [
                        jnp.stack([ins[p] for ins in inputs_batch])
                        for p in range(n_pos)
                    ]
                    outs = jax.vmap(base, in_axes=(None, 0))(params, stacked)
                    return tuple(
                        tuple(o[b] for o in outs) for b in range(batch)
                    )

                cache[batch] = jax.jit(fn)
            return cache[batch]

    def _execute_eager(
        self, prog: SubgraphProgram, inputs: Sequence[np.ndarray]
    ) -> List[np.ndarray]:
        """Op-by-op host execution for subgraphs with custom ops.

        Pinned to this (host) worker's CPU device: eager jnp ops would
        otherwise land on the process default device (the TPU), and
        fetching TPU arrays from a worker thread hangs some transports
        (docs/dev-notes.md) — with CPU-backed arrays the np.asarray
        materialization below is safe on any thread."""
        ctx = LowerCtx(prog.graph, prog.params, prog.meta,
                       exact=prog.exact, conv_mode=prog.conv_mode)
        for tid, v in zip(prog.input_ids, inputs):
            ctx.set(tid, np.asarray(v))
        import jax.numpy as jnp

        with jax.default_device(self.devices[0]):
            for oi in prog.op_indices:
                op = prog.graph.ops[oi]
                if op.is_custom:
                    ins = [
                        np.asarray(ctx.arr(t)) for t in op.inputs if t >= 0
                    ]
                    outs = run_host_op(op.opname, prog.graph, op, ins)
                    for tid, o in zip(op.outputs, outs):
                        ctx.set(tid, jnp.asarray(o))
                else:
                    get_lowering(op.opname).trace(ctx, op)
            return [np.asarray(ctx.arr(t)) for t in prog.output_ids]
