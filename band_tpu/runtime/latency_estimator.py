"""Per-subgraph latency database: profile-once + EMA online updates +
JSON persistence keyed by a config hash.

Reference: band/latency_estimator.{h,cc} — {profiled, moving_averaged}
per SubgraphKey (:43-46), EMA update a*new + (1-a)*old (:32-45), offline
profile load/dump keyed by config hash (:185-289)."""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

from ..common import SubgraphKey


@dataclass
class LatencyRecord:
    profiled: int = 0  # µs, from isolated profiling runs
    moving_averaged: int = 0  # µs, EMA over real invocations


def _key_str(key: SubgraphKey) -> str:
    units = ",".join(str(u) for u in sorted(key.unit_indices))
    return f"{key.model_id}:{key.worker_id}:{units}"


class LatencyEstimator:
    def __init__(
        self,
        smoothing_factor: float = 0.1,
        num_warmups: int = 1,
        num_runs: int = 1,
        profile_data_path: str = "",
        config_hash: str = "",
    ):
        self._alpha = smoothing_factor
        self._warmups = num_warmups
        self._runs = num_runs
        self._path = profile_data_path
        self._hash = config_hash
        self._db: Dict[SubgraphKey, LatencyRecord] = {}
        self._lock = threading.Lock()
        # write-through slots into the native planner's flat expected-
        # latency arrays (runtime/native.PlanTables), so scheduler-time
        # DP calls marshal nothing per key
        self._slots: Dict[SubgraphKey, list] = {}
        if self._path:
            self.load_profile(self._path)

    # ------------------------------------------------------------------
    def bind_slot(self, key: SubgraphKey, arr, idx: int) -> None:
        """Mirror this key's expected latency into arr[idx] on every
        update (arr is a shared int64 numpy array)."""
        with self._lock:
            self._slots.setdefault(key, []).append((arr, idx))
            rec = self._db.get(key)
            arr[idx] = (
                (rec.moving_averaged or rec.profiled or -1) if rec else -1
            )

    def _write_through(self, key: SubgraphKey, rec: LatencyRecord) -> None:
        for arr, idx in self._slots.get(key, ()):
            arr[idx] = rec.moving_averaged or rec.profiled or -1

    def unbind_model(self, model_id: int) -> None:
        """Drop write-through slots for an unregistered model (the
        latency records themselves persist, like the reference's profile
        DB outliving any one registration)."""
        with self._lock:
            for key in [k for k in self._slots if k.model_id == model_id]:
                del self._slots[key]

    # ------------------------------------------------------------------
    def profile(self, key: SubgraphKey, invoke: Callable[[], None]) -> int:
        """Measure `invoke` (warmups + timed runs) and record the result
        (reference: latency_estimator.cc:92-116)."""
        for _ in range(self._warmups):
            invoke()
        t0 = time.perf_counter_ns()
        for _ in range(self._runs):
            invoke()
        elapsed_us = (time.perf_counter_ns() - t0) // (self._runs * 1000)
        with self._lock:
            rec = self._db.setdefault(key, LatencyRecord())
            rec.profiled = int(elapsed_us)
            rec.moving_averaged = int(elapsed_us)
            self._write_through(key, rec)
        return int(elapsed_us)

    def update(self, key: SubgraphKey, latency_us: int) -> None:
        """EMA update from a real invocation (reference: :32-45)."""
        with self._lock:
            rec = self._db.setdefault(key, LatencyRecord())
            if rec.moving_averaged == 0:
                rec.moving_averaged = int(latency_us)
            else:
                rec.moving_averaged = int(
                    self._alpha * latency_us
                    + (1.0 - self._alpha) * rec.moving_averaged
                )
            self._write_through(key, rec)

    def override(self, key: SubgraphKey, latency_us: int) -> None:
        """Pin a key's expected latency exactly (cost-model injection
        for tests and what-if scheduling analyses)."""
        with self._lock:
            rec = self._db.setdefault(key, LatencyRecord())
            rec.profiled = int(latency_us)
            rec.moving_averaged = int(latency_us)
            self._write_through(key, rec)

    def set_profiled(self, key: SubgraphKey, latency_us: int) -> None:
        with self._lock:
            rec = self._db.setdefault(key, LatencyRecord())
            rec.profiled = int(latency_us)
            if rec.moving_averaged == 0:
                rec.moving_averaged = int(latency_us)
            self._write_through(key, rec)

    # ------------------------------------------------------------------
    def get_profiled(self, key: SubgraphKey) -> int:
        rec = self._db.get(key)
        return rec.profiled if rec else -1

    def get_expected(self, key: SubgraphKey) -> int:
        rec = self._db.get(key)
        if rec and rec.moving_averaged:
            return rec.moving_averaged
        if rec and rec.profiled:
            return rec.profiled
        return -1

    def has(self, key: SubgraphKey) -> bool:
        return key in self._db

    def get_worst_model_latency(self, model_id: int) -> int:
        """Max expected over this model's whole-model subgraphs."""
        worst = 0
        with self._lock:
            for key, rec in self._db.items():
                if key.model_id == model_id:
                    worst = max(worst, rec.moving_averaged or rec.profiled)
        return worst

    # ------------------------------------------------------------------
    def dump_profile(self, path: Optional[str] = None) -> None:
        path = path or self._path
        if not path:
            return
        with self._lock:
            payload = {
                "hash": self._hash,
                "latency": {
                    _key_str(k): {
                        "profiled": r.profiled,
                        "moving_averaged": r.moving_averaged,
                    }
                    for k, r in self._db.items()
                },
            }
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)

    def load_profile(self, path: str) -> bool:
        """Load a persisted profile; stale hashes are ignored
        (reference: latency_estimator.cc:215-221)."""
        if not os.path.exists(path):
            return False
        with open(path) as f:
            payload = json.load(f)
        if payload.get("hash") != self._hash:
            return False
        with self._lock:
            for ks, rec in payload.get("latency", {}).items():
                model_s, worker_s, units_s = ks.split(":")
                units = frozenset(
                    int(u) for u in units_s.split(",") if u != ""
                )
                key = SubgraphKey(int(model_s), int(worker_s), units)
                self._db[key] = LatencyRecord(
                    profiled=int(rec["profiled"]),
                    moving_averaged=int(rec["moving_averaged"]),
                )
                self._write_through(key, self._db[key])
        return True
