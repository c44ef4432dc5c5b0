"""Sharding policies for subgraph programs over a device mesh.

Maps each prepared parameter of a SubgraphProgram to a PartitionSpec:
  * conv kernels (HWIO) shard output channels on the "tp" axis
  * depthwise kernels, per-channel bias / quant multipliers follow the
    same channel axis
  * activations flow unsharded (batch is sharded by the caller on "dp")

With these in_shardings, GSPMD partitions every conv over output
channels and inserts the reduce-scatter/all-gather collectives — the
TPU-native realization of weight-sharded execution the reference has
no analogue for (SURVEY §2.9: TP obligation)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend.program import SubgraphProgram


def _param_spec(prog: SubgraphProgram, name: str, arr: np.ndarray,
                tp_axis: Optional[str]) -> P:
    if tp_axis is None:
        return P()
    leaf = name.rsplit("/", 1)[-1]
    if leaf == "w" and arr.ndim == 4:
        # HWIO conv kernel -> shard O; depthwise [kh,kw,1,oc] likewise
        return P(None, None, None, tp_axis)
    if leaf == "w" and arr.ndim == 2:
        # FC weights [in, out] (quant) or [out, in] (float)
        return P(None, tp_axis)
    if leaf in ("bias", "qm", "shift", "mult") and arr.ndim == 1:
        if arr.shape[0] >= 8:  # don't shard scalars / tiny vectors
            return P(tp_axis)
    return P()


def param_shardings(
    prog: SubgraphProgram, mesh: Mesh, tp_axis: Optional[str] = "tp"
) -> Dict[str, NamedSharding]:
    """NamedSharding per program param.  Channel dims not divisible by
    the axis size fall back to replication (GSPMD would pad, but
    replication keeps requant params aligned with kernel shards)."""
    if tp_axis not in mesh.axis_names:
        tp_axis = None  # no tensor-parallel axis: replicate everything
    tp_size = mesh.shape[tp_axis] if tp_axis is not None else 1
    out = {}
    for name, arr in prog.params.items():
        spec = _param_spec(prog, name, np.asarray(arr), tp_axis)
        # replicate anything whose sharded dim doesn't divide
        dims = [d for d, ax in enumerate(spec) if ax is not None]
        ok = all(np.asarray(arr).shape[d] % tp_size == 0 for d in dims)
        out[name] = NamedSharding(mesh, spec if ok else P())
    return out


def batch_sharding(mesh: Mesh, dp_axis: str = "dp") -> NamedSharding:
    """Leading-axis (batch) sharding for vmapped program inputs."""
    return NamedSharding(mesh, P(dp_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
