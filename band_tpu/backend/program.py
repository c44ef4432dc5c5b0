"""Subgraph -> jittable program builder.

Given an IR graph and a set of op indices, computes the subgraph I/O
boundary, prepares host-side parameters (weight re-layouts, folded
zero-point corrections, fixed-point multipliers), and produces a pure
function ``fn(params, inputs) -> outputs`` suitable for ``jax.jit``.

This is the TPU-native analogue of the reference's per-subgraph
interpreter construction (band/backend/tfl/model_executor.cc:327-373,
``SetTargetNodes`` + AllocateTensors): instead of an interpreter per
subgraph we build an XLA executable per (subgraph, worker).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from ..errors import LoweringError
from ..ir.graph import Graph, OpNode
from ..ops.lowerings import LowerCtx
from ..ops.registry import REGISTRY, get_lowering


def subgraph_boundary(
    graph: Graph, op_indices: Sequence[int]
) -> Tuple[List[int], List[int]]:
    """Compute (input tensor ids, output tensor ids) of an op subset.

    Inputs: non-constant tensors consumed inside but not produced inside.
    Outputs: tensors produced inside that are graph outputs or are
    consumed by ops outside the subset (reference semantics:
    band/model_spec.h:43-52 GetPureInputTensors/GetOutputTensors).
    """
    ops = set(op_indices)
    produced = set()
    consumed: List[int] = []
    for oi in op_indices:
        for t in graph.ops[oi].outputs:
            produced.add(t)
    seen = set()
    for oi in sorted(op_indices):
        for t in graph.ops[oi].inputs:
            if t < 0 or t in seen:
                continue
            seen.add(t)
            td = graph.tensor(t)
            if td.is_constant or t in produced:
                continue
            consumed.append(t)
    outside_consumed = set()
    for op in graph.ops:
        if op.index in ops:
            continue
        for t in op.inputs:
            if t >= 0:
                outside_consumed.add(t)
    outputs = []
    for oi in sorted(op_indices):
        for t in graph.ops[oi].outputs:
            if (t in graph.outputs or t in outside_consumed) and t not in outputs:
                outputs.append(t)
    return consumed, outputs


def prepare_params(
    graph: Graph, op_indices: Sequence[int], exact: bool = True
) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Host-side parameter preparation for every op in the subgraph."""
    params: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    for oi in op_indices:
        op = graph.ops[oi]
        low = get_lowering(op.opname)
        if low.prepare is not None:
            out = low.prepare(graph, op, exact)
            for k, v in out.items():
                key = f"op{op.index}/{k}"
                if isinstance(v, np.ndarray):
                    params[key] = v
                else:
                    meta[key] = v
        else:
            for pos, tid in enumerate(op.inputs):
                if tid < 0 or pos in low.static_inputs:
                    continue
                td = graph.tensor(tid)
                if td.is_constant and f"t{tid}" not in params:
                    params[f"t{tid}"] = np.ascontiguousarray(td.data)
    return params, meta


@dataclass
class SubgraphProgram:
    """A prepared, traceable subgraph."""

    graph: Graph
    op_indices: Tuple[int, ...]
    input_ids: Tuple[int, ...]
    output_ids: Tuple[int, ...]
    params: Dict[str, np.ndarray]
    meta: Dict[str, Any]
    exact: bool = True
    conv_mode: str = "int8"

    @property
    def input_specs(self):
        return [
            (self.graph.tensor(t).shape, self.graph.tensor(t).dtype)
            for t in self.input_ids
        ]

    @property
    def output_specs(self):
        return [
            (self.graph.tensor(t).shape, self.graph.tensor(t).dtype)
            for t in self.output_ids
        ]

    def make_fn(self, batch_hint: int = 1):
        """Pure function (params, inputs) -> outputs for jax.jit.

        batch_hint: the vmap bucket size this fn will run under
        (continuous batching); lowerings with batch-dependent strategy
        choices read it (LowerCtx.batch_hint)."""
        graph = self.graph
        op_indices = self.op_indices
        input_ids = self.input_ids
        output_ids = self.output_ids
        meta = self.meta
        exact = self.exact
        conv_mode = self.conv_mode

        import os

        # Fusion islands (serving buckets): pin each op's lowering as
        # its own fusion unit by placing an optimization_barrier on its
        # outputs.  XLA's global fusion/layout search is unstable under
        # jaxpr changes at these program sizes — measured on ICN b32:
        # every lowering tweak re-rolled which convs absorbed which
        # ADD pipelines and introduced multi-ms relayout copies
        # (docs/performance.md round 4).  With islands, a conv fuses
        # exactly its own requant epilogue (the standalone-probe form,
        # 0.43 ms vs 0.6-1.3 in-model) and elementwise ops fuse their
        # own pipeline.  b1 keeps free-form fusion (cross-op fusion
        # wins at small batches).  BAND_FUSION_ISLANDS=0/1 overrides.
        env = os.environ.get("BAND_FUSION_ISLANDS", "")
        islands = (batch_hint >= 4) if env == "" else env == "1"

        def fn(params, inputs):
            import jax
            from jax import lax

            ctx = LowerCtx(graph, params, meta, exact=exact,
                           conv_mode=conv_mode)
            ctx.boundary_inputs = frozenset(input_ids)
            ctx.batch_hint = batch_hint
            for tid, v in zip(input_ids, inputs):
                ctx.set(tid, v)
            for oi in op_indices:
                op = graph.ops[oi]
                # named scope -> HLO op_name metadata -> device-trace
                # per-model-op attribution (tools/xprof_summary.py
                # "by graph op" section)
                with jax.named_scope(f"op{oi:03d}_{op.opname}"):
                    get_lowering(op.opname).trace(ctx, op)
                    if islands:
                        for t in op.outputs:
                            v = ctx.env.get(t) if t >= 0 else None
                            if v is not None and hasattr(v, "dtype"):
                                ctx.set(t, lax.optimization_barrier(v))
            return [ctx.arr(t) for t in output_ids]

        return fn

    def flops(self) -> int:
        """Rough MAC-based cost estimate (for scheduler priors)."""
        total = 0
        for oi in self.op_indices:
            op = self.graph.ops[oi]
            out_td = self.graph.tensor(op.outputs[0]) if op.outputs else None
            if out_td is None:
                continue
            out_elems = int(np.prod([max(s, 1) for s in out_td.shape]))
            if op.opname in ("CONV_2D", "TRANSPOSE_CONV"):
                w = self.graph.tensor(op.inputs[1])
                _, kh, kw, ci = w.shape
                total += 2 * out_elems * kh * kw * ci
            elif op.opname == "DEPTHWISE_CONV_2D":
                w = self.graph.tensor(op.inputs[1])
                total += 2 * out_elems * w.shape[1] * w.shape[2]
            elif op.opname == "FULLY_CONNECTED":
                w = self.graph.tensor(op.inputs[1])
                total += 2 * out_elems * w.shape[-1]
            else:
                total += out_elems
        return total


def build_program(
    graph: Graph,
    op_indices: Sequence[int],
    exact: bool = True,
    conv_mode: str = "int8",
) -> SubgraphProgram:
    missing = sorted(
        {
            graph.ops[oi].opname
            for oi in op_indices
            if graph.ops[oi].opname not in REGISTRY
        }
    )
    if missing:
        raise LoweringError(f"unsupported ops in subgraph: {missing}")
    op_indices = tuple(sorted(op_indices))
    inputs, outputs = subgraph_boundary(graph, op_indices)
    params, meta = prepare_params(graph, op_indices, exact)
    return SubgraphProgram(
        graph=graph,
        op_indices=op_indices,
        input_ids=tuple(inputs),
        output_ids=tuple(outputs),
        params=params,
        meta=meta,
        exact=exact,
        conv_mode=conv_mode,
    )
