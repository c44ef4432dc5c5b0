"""Mock engine for hermetic scheduler/planner/worker tests.

The analogue of the reference's MockEngineBase fixture
(band/test/test_util.h:28-89): implements the EngineBase SPI with
scripted worker states and latency tables, no backend."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from band_tpu.common import Job, SubgraphKey
from band_tpu.runtime.engine_interface import EngineBase


class MockEngine(EngineBase):
    def __init__(
        self,
        num_workers: int = 2,
        num_units_per_model: Dict[int, int] = None,
        latency: Dict[SubgraphKey, int] = None,
    ):
        self._num_workers = num_workers
        self.num_units = num_units_per_model or {}
        self.latency = latency or {}
        # (key, bucket) -> µs for batch-aware pricing tests; falls back
        # to the batch-1 table when a bucket has no entry
        self.batch_latency: Dict[Tuple[SubgraphKey, int], int] = {}
        self.idle_workers: List[int] = list(range(num_workers))
        self.waiting: Dict[int, int] = {w: 0 for w in range(num_workers)}
        self.model_workers: Dict[int, int] = {}
        self.dispatched: List[Job] = []
        self.finished: List[Job] = []
        self.enqueued: List[Job] = []

    # --- helpers ---
    def whole_key(self, model_id: int, worker_id: int) -> SubgraphKey:
        units = frozenset(range(self.num_units.get(model_id, 1)))
        return SubgraphKey(model_id, worker_id, units)

    def set_latency(self, key: SubgraphKey, us: int) -> None:
        self.latency[key] = us

    # --- SPI ---
    def enqueue_batch(self, jobs, push_front=False):
        self.enqueued.extend(jobs)
        return [j.job_id for j in jobs]

    def enqueue_finished_job(self, job: Job) -> None:
        self.finished.append(job)

    def trigger(self) -> None:
        pass

    def dispatch(self, job: Job) -> bool:
        self.dispatched.append(job)
        return True

    def num_workers(self) -> int:
        return self._num_workers

    def get_worker_waiting_time(self):
        return dict(self.waiting)

    def get_idle_workers(self):
        return list(self.idle_workers)

    def is_worker_available(self, worker_id):
        return True

    def get_model_worker(self, model_id):
        return self.model_workers.get(model_id, 0)

    def get_largest_subgraph_key(self, model_id, worker_id):
        key = self.whole_key(model_id, worker_id)
        if key in self.latency:
            return key
        return SubgraphKey()

    def get_subgraph_candidates(self, model_id, resolved_units):
        out = []
        for key in self.latency:
            if key.model_id != model_id:
                continue
            if key.unit_indices & resolved_units:
                continue
            below = {u for u in range(min(key.unit_indices))}
            if below <= resolved_units:
                out.append(key)
        return out

    def get_subgraph_with_shortest_latency(self, job, waiting):
        best, best_end = None, 1 << 62
        for key in self.get_subgraph_candidates(
            job.model_id, job.resolved_unit_subgraphs
        ):
            expected = self.latency.get(key, 0)
            end = waiting.get(key.worker_id, 0) + expected
            if end < best_end:
                best, best_end = key, end
        return best, (best_end if best else 0)

    def is_end_of_model(self, key, resolved):
        total = self.num_units.get(key.model_id, 1)
        return len(resolved | key.unit_indices) == total

    def get_expected_latency(self, key, batch=1):
        if batch > 1:
            bucket = 1 << (batch - 1).bit_length()
            if (key, bucket) in self.batch_latency:
                return self.batch_latency[(key, bucket)]
        return self.latency.get(key, -1)

    def get_worst_latency(self, model_id):
        vals = [
            v for k, v in self.latency.items() if k.model_id == model_id
        ]
        return max(vals) if vals else 0

    def update_latency(self, key, latency_us, batch=1):
        pass

    def invoke(self, key, inputs):
        return inputs

    def try_copy_input_tensors(self, job):
        return []

    def try_copy_output_tensors(self, job, outputs):
        pass
