"""One engine spanning hosts: the SPMD serving control plane.

The reference is strictly single-process (SURVEY §5.8); the multi-host
obligation (SURVEY §2.9 "Distributed comm backend") is served here by
running ONE logical engine over a ``jax.distributed`` cluster:

 * **Driver** (process 0) runs the full engine — planner, schedulers,
   workers, request front-ends.  Mesh workers whose device group spans
   processes execute GSPMD programs whose collectives involve every
   host.
 * **Followers** (process > 0) build the *same* engine (same config,
   same models registered in the same order — registration itself is
   collective because online profiling invokes the shared sharded
   programs in lockstep) and then replay the driver's cross-process
   launches so XLA's multi-controller requirement — every process
   launches every global program in the same order — holds.

The control plane rides the same ``jax.distributed`` channel as the
compute collectives: each cross-process dispatch is announced with a
fixed-shape ``broadcast_one_to_all`` message (opcode, model, subgraph
slot, bucket) followed by the input payloads, then every process
launches the identical executable.  No extra RPC layer, no sockets —
the ordering guarantee comes from the single announce lock on the
driver and the blocking broadcast on the followers.

Single-host meshes never touch this module; the hook in
``ModelExecutor`` only engages for device groups that span processes.

Transport note: announcing requires materializing inputs on the host
(``np.asarray`` on the dispatch thread).  That is fine on directly
attached hosts; on the tunneled dev transport it would hit dev-notes
item 2, so cross-process serving there should stage replicated inputs
(StagedInput covers the single-host case today).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..tracing.logger import log_error

OP_SHUTDOWN = 0
OP_EXEC = 1
OP_EXEC_BATCHED = 2

_MSG_LEN = 5  # [opcode, model_id, key_slot, bucket, n_inputs]


def spans_processes(devices) -> bool:
    return len({
        getattr(d, "process_index", 0) for d in devices
    }) > 1


def _key_sort(key) -> Tuple:
    return (key.model_id, key.worker_id, tuple(sorted(key.unit_indices)))


class SpmdChannel:
    """Cross-process dispatch replication for one engine.

    Build on every process AFTER all models are registered (the slot
    table must be identical everywhere).  On the driver call
    ``attach()`` then serve; on followers call ``run_follower()``.
    """

    def __init__(self, engine):
        self.engine = engine
        self.lock = threading.Lock()
        self.is_driver = jax.process_index() == 0
        self._by_slot: List[Tuple[object, object]] = []  # (executor, key)
        self._slots: Dict = {}
        for mid in sorted(engine.list_models()):
            rec = engine.model_record(mid)
            for wid in sorted(rec.executors):
                ex = rec.executors[wid]
                if not spans_processes(ex.devices):
                    continue
                for key in sorted(ex.subgraph_keys(), key=_key_sort):
                    self._slots[key] = len(self._by_slot)
                    self._by_slot.append((ex, key))

    # ------------------------------------------------------------------
    def barrier(self, tag: str = "band_spmd_ready") -> None:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)

    def attach(self) -> None:
        """Driver: hook every cross-process executor so its launches
        are announced to the followers first."""
        assert self.is_driver, "attach() is driver-only"
        for ex, _ in self._by_slot:
            ex._spmd = self

    # ------------------------------------------------------------------
    # driver side (called by ModelExecutor under self.lock)
    def announce(
        self, key, bucket: int, host_inputs: List[np.ndarray]
    ) -> None:
        from jax.experimental import multihost_utils

        opcode = OP_EXEC_BATCHED if bucket > 0 else OP_EXEC
        msg = np.asarray(
            [opcode, key.model_id, self._slots[key], bucket,
             len(host_inputs)],
            np.int32,
        )
        multihost_utils.broadcast_one_to_all(msg)
        for arr in host_inputs:
            multihost_utils.broadcast_one_to_all(np.ascontiguousarray(arr))

    def shutdown_followers(self) -> None:
        """Driver: release followers from their replay loop."""
        if not self.is_driver:
            return
        from jax.experimental import multihost_utils

        with self.lock:
            multihost_utils.broadcast_one_to_all(
                np.asarray([OP_SHUTDOWN, 0, 0, 0, 0], np.int32)
            )

    # ------------------------------------------------------------------
    # follower side
    def run_follower(self) -> None:
        """Replay loop: block on the next announcement, reconstruct the
        inputs, launch the identical executable.  Returns on the
        driver's shutdown message."""
        from jax.experimental import multihost_utils

        assert not self.is_driver, "run_follower() is follower-only"
        while True:
            msg = multihost_utils.broadcast_one_to_all(
                np.zeros(_MSG_LEN, np.int32), is_source=False
            )
            opcode, _mid, slot, bucket, n_inputs = (int(v) for v in msg)
            if opcode == OP_SHUTDOWN:
                return
            ex, key = self._by_slot[slot]
            prog = ex.program(key)
            arrays = []
            for (shape, dtype) in prog.input_specs[:n_inputs]:
                shp = [max(s, 1) for s in shape]
                if opcode == OP_EXEC_BATCHED:
                    shp = [bucket] + shp
                arrays.append(
                    multihost_utils.broadcast_one_to_all(
                        np.zeros(shp, dtype), is_source=False
                    )
                )
            try:
                if opcode == OP_EXEC:
                    out = ex.execute(key, arrays)
                else:
                    ins = [
                        [a[b] for a in arrays] for b in range(bucket)
                    ]
                    out = ex.execute_batched(key, ins)
                jax.block_until_ready(out)
            except Exception:  # pragma: no cover - diagnostics only
                import traceback

                log_error(
                    "spmd follower replay failed for %s:\n%s",
                    key, traceback.format_exc(),
                )
                raise
