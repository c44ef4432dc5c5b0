"""ctypes loader for the native planner decision core (builds on first
use; the engine falls back to the pure-Python DP when unavailable).

The call path is scheduler-hot (O(window^2) DP calls per planner pass),
so argument marshaling is minimized: every array pointer is resolved
once at model registration and passed as a raw address."""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "plan_core.cc")
_LIB = os.path.join(_DIR, "libband_plan.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    from ...native_build import atomic_build

    return atomic_build(
        ["g++", "-O2", "-shared", "-fPIC", _SRC], _LIB
    )


def load() -> Optional[ctypes.CDLL]:
    """Native planner library, built on demand; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        i = ctypes.c_int
        vp = ctypes.c_void_p
        lib.band_plan_dp.argtypes = [
            i, i, vp, vp, vp, vp, vp,  # model table
            i, vp, vp, vp,             # workers
            vp, vp,                    # link-cost table + waiting
            i, i, i, ctypes.POINTER(ctypes.c_int),
        ]
        lib.band_plan_dp.restype = ctypes.c_longlong
        _lib = lib
        return _lib


class PlanTables:
    """Flat per-model arrays the native DP consumes.

    Built once at model registration (keys sorted by begin unit, as
    band_plan_dp requires); `expected_us` is kept current by the
    LatencyEstimator's write-through binding, so scheduler-time calls
    marshal nothing but the waiting-time vector."""

    def __init__(self, num_units: int, keys, boundary_bytes: dict):
        self.keys = sorted(keys, key=lambda k: k.begin_unit)
        self.num_units = num_units
        n = len(self.keys)
        self.key_begin = np.asarray(
            [k.begin_unit for k in self.keys], np.int32
        )
        self.key_end = np.asarray([k.end_unit for k in self.keys], np.int32)
        self.key_worker = np.asarray(
            [k.worker_id for k in self.keys], np.int32
        )
        self.expected_us = np.full(n, -1, np.int64)
        self.boundary_bytes = np.asarray(
            [boundary_bytes.get(u, 0) for u in range(num_units)], np.int64
        )
        # raw addresses, resolved once (the arrays above stay referenced
        # by self for their lifetime)
        self.arg_prefix = (
            num_units, n,
            self.key_begin.ctypes.data, self.key_end.ctypes.data,
            self.key_worker.ctypes.data, self.expected_us.ctypes.data,
            self.boundary_bytes.ctypes.data,
        )


class WorkerTables:
    """Per-worker link-class facts for transfer costing."""

    def __init__(self, is_host, devices):
        self.n = len(is_host)
        self.is_host = np.asarray(is_host, np.uint8)
        self.dev = np.asarray(
            [0 if h else id(devs[0]) for h, devs in zip(is_host, devices)],
            np.int64,
        )
        self.proc = np.asarray(
            [
                0 if h else getattr(devs[0], "process_index", 0)
                for h, devs in zip(is_host, devices)
            ],
            np.int32,
        )
        self.arg = (
            self.n, self.is_host.ctypes.data, self.dev.ctypes.data,
            self.proc.ctypes.data,
        )


def plan_dp(lib, model: PlanTables, workers: WorkerTables,
            link_costs: np.ndarray, waiting_us: np.ndarray,
            start_unit: int, prev_worker: int, batch: int = 1):
    """Run the native DP; returns (first-hop SubgraphKey | None, end µs).
    `link_costs` is the engine's LinkCostTable.table (4x2 int64) — the
    same array the Python DP reads, passed by pointer.  `batch` scales
    the hop bytes (a batched window's continuation moves B x the
    boundary activations)."""
    out = ctypes.c_int(-1)
    best = lib.band_plan_dp(
        *model.arg_prefix, *workers.arg, link_costs.ctypes.data,
        waiting_us.ctypes.data,
        start_unit, prev_worker, batch, ctypes.byref(out),
    )
    if best < 0 or out.value < 0:
        return None, 0
    return model.keys[out.value], int(best)
