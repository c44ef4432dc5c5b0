"""Multi-host runtime: jax.distributed bring-up + host-spanning meshes.

The reference is strictly single-process (SURVEY §5.8: no NCCL/MPI/
multi-node anything); its TPU-native replacement has two tiers:

 1. **One engine spanning hosts** (this module): every host in a TPU
    slice/pod runs the same engine binary; ``initialize()`` wires
    ``jax.distributed`` (coordinator handshake over DCN), after which
    ``jax.devices()`` is the *global* device list and ``global_mesh``
    builds (dp, tp) meshes whose "tp" rides ICI within a host and whose
    "dp" may cross hosts — GSPMD inserts ICI/DCN collectives from the
    shardings alone.  Mesh workers (WorkerSpec.device_ids over global
    ids) then execute sharded programs exactly as in the single-host
    case; nothing else in the engine changes.
 2. **Replicated engines behind a router** (band_tpu/tools/router.py):
    independent per-host engines, request-level load balancing over
    HTTP — the right tier when models fit on one host and only
    throughput must scale.

Configuration comes from the ``distributed`` block of the runtime JSON
(coordinator_address / num_processes / process_id) or, when unset,
from the standard cluster auto-detect (TPU metadata, SLURM, etc.).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import DistributedConfig

_initialized = False


def initialize(cfg: Optional[DistributedConfig] = None) -> bool:
    """Bring up jax.distributed once per process; returns True if a
    multi-process runtime is active after the call."""
    global _initialized
    cfg = cfg or DistributedConfig()
    if not cfg.enabled:
        return jax.process_count() > 1
    if _initialized:
        return jax.process_count() > 1
    kwargs = {}
    if cfg.coordinator_address:
        kwargs["coordinator_address"] = cfg.coordinator_address
        if cfg.num_processes > 0:
            kwargs["num_processes"] = cfg.num_processes
        if cfg.process_id >= 0:
            kwargs["process_id"] = cfg.process_id
        if cfg.local_device_ids is not None:
            kwargs["local_device_ids"] = list(cfg.local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1


def from_env() -> DistributedConfig:
    """DistributedConfig from BAND_TPU_COORDINATOR / _NUM_PROCESSES /
    _PROCESS_ID environment variables (per-host launcher convenience)."""
    return DistributedConfig(
        coordinator_address=os.environ.get("BAND_TPU_COORDINATOR", ""),
        num_processes=int(os.environ.get("BAND_TPU_NUM_PROCESSES", "-1")),
        process_id=int(os.environ.get("BAND_TPU_PROCESS_ID", "-1")),
    )


def global_mesh(
    dp: int = -1,
    tp: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(dp, tp) mesh over the global device list, laid out so "tp"
    stays within a host (ICI) and "dp" strides across hosts (DCN/ICI).

    dp/tp of -1 auto-size: tp = devices-per-host (the densest ICI
    domain), dp = total/tp.  The device array is ordered host-major so
    each tp row is one host's chips.
    """
    devices = list(devices) if devices is not None else jax.devices()
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    per_host = min(len(v) for v in by_proc.values())
    if tp < 0:
        tp = per_host
    if dp < 0:
        dp = len(devices) // tp
    if dp * tp > len(devices):
        raise ValueError(
            f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devices)}"
        )
    # host-major ordering: consecutive tp-groups come from one host
    ordered = [d for p in sorted(by_proc) for d in by_proc[p]]
    arr = np.asarray(ordered[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def process_span(devices: Sequence[jax.Device]) -> int:
    """Number of distinct processes (hosts) a device group touches —
    the scheduler's signal that a hop crosses DCN."""
    return len({getattr(d, "process_index", 0) for d in devices})
