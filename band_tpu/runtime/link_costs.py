"""Single-source transfer-cost model for the scheduler seam.

Every latency-aware scheduler prices cross-worker hops through
``Engine.get_transfer_cost_us`` (Python DP) or the native decision core
(``runtime/native/plan_core.cc``).  Round 1 compiled the same guessed
constants into both by hand; this table is now the single source both
consume — injectable for tests, overridable from config JSON, and
measurable on the live transport at engine init.

The reference never costs its transport (an in-process memcpy,
band/engine.cc:1247-1365); on TPU a hop crosses PCIe, ICI or DCN and
mispriced links silently flip every HEFT/SEL/LSF decision (SURVEY
§5.8), so the constants must be real.

Cost model per link class: ``fixed_us + nbytes // bytes_per_us``.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import numpy as np

# link-class indices into the (4, 2) table — keep in sync with the
# switch in plan_core.cc:xfer_cost
H2D, HOST, ICI, DCN = 0, 1, 2, 3
_NAMES = {"h2d": H2D, "host": HOST, "ici": ICI, "dcn": DCN}

# conservative direct-attached-host defaults:
#   H2D  PCIe-class ~10 GB/s + launch overhead
#   HOST memcpy ~50 GB/s
#   ICI  in-slice chip<->chip ~45 GB/s + launch overhead
#   DCN  cross-host ~3 GB/s + connection latency
DEFAULTS = np.array(
    [[30, 10_000], [1, 50_000], [5, 45_000], [50, 3_000]], dtype=np.int64
)


class LinkCostTable:
    """(4, 2) int64 [link_class][fixed_us, bytes_per_us].

    The array identity is stable for the table's lifetime: the native
    planner keeps a raw pointer to it (PlanTables-style), so updates
    must write through ``table[:]``, never rebind."""

    def __init__(self, table: Optional[np.ndarray] = None):
        self.table = np.array(
            DEFAULTS if table is None else table, dtype=np.int64
        ).reshape(4, 2)

    def cost_us(self, link: int, nbytes: int) -> int:
        fixed, per = self.table[link]
        return int(fixed) + int(nbytes) // max(int(per), 1)

    def set(self, link: int, fixed_us: int, bytes_per_us: int) -> None:
        self.table[link, 0] = max(int(fixed_us), 0)
        self.table[link, 1] = max(int(bytes_per_us), 1)

    def update_from_dict(self, d: Dict) -> None:
        """{"h2d": [fixed_us, bytes_per_us], "ici": ..., ...} (config
        JSON ``link_costs`` block); unknown keys raise."""
        for name, pair in d.items():
            link = _NAMES.get(name.lower())
            if link is None:
                raise ValueError(f"unknown link class {name!r}")
            fixed, per = pair
            self.set(link, fixed, per)

    def to_dict(self) -> Dict:
        return {
            name: [int(self.table[i, 0]), int(self.table[i, 1])]
            for name, i in _NAMES.items()
        }

    def __repr__(self) -> str:
        return f"LinkCostTable({self.to_dict()})"


def _time_once(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return (time.perf_counter() - t0) * 1e6  # µs


def _best_of(fn, n: int = 3) -> float:
    return min(_time_once(fn) for _ in range(n))


def _fit(small_us: float, big_us: float, small_b: int, big_b: int):
    """(fixed_us, bytes_per_us) from a two-point probe; degenerate
    timings (big no slower than small) collapse to pure fixed cost."""
    fixed = max(small_us, 1.0)
    d_us = big_us - small_us
    if d_us <= 0:
        return int(fixed), 1 << 40  # bandwidth unobservable: ~free per byte
    return int(fixed), max(int((big_b - small_b) / d_us), 1)


def measure_dcn(
    table: Optional[LinkCostTable] = None,
    small_bytes: int = 1 << 14, big_bytes: int = 1 << 22,
) -> LinkCostTable:
    """Probe the cross-process (DCN) payload path on a live
    jax.distributed cluster and write the fit into `table`.

    Round 2 left DCN at its guessed default ("needs a peer") even when
    the 2-process tests brought up a cluster; this closes that hole:
    every process of the cluster must call this at the same point (the
    probe is a collective — ``broadcast_one_to_all`` moves the payload
    over the same channel cross-host dispatch uses).  Process 0's fit
    is broadcast so every process writes identical values."""
    import jax
    from jax.experimental import multihost_utils

    table = table or LinkCostTable()
    if jax.process_count() < 2:
        return table
    small = np.ones(small_bytes, np.uint8)
    big = np.ones(big_bytes, np.uint8)

    def bcast(arr):
        multihost_utils.broadcast_one_to_all(arr)

    bcast(small)  # warm the path (first collective pays setup)
    t_s = _best_of(lambda: bcast(small))
    t_b = _best_of(lambda: bcast(big))
    fixed, per = _fit(t_s, t_b, small_bytes, big_bytes)
    agreed = multihost_utils.broadcast_one_to_all(
        np.asarray([fixed, per], np.int64)
    )
    table.set(DCN, int(agreed[0]), int(agreed[1]))
    return table


def topology_hash() -> str:
    """Key for persisted probed tables: probing is only valid for the
    same process count / device count / platform."""
    import jax

    devs = jax.devices()
    return (
        f"p{jax.process_count()}-d{len(devs)}-"
        f"{devs[0].platform if devs else 'none'}"
    )


def save_table(table: LinkCostTable, path: str) -> None:
    """Persist a probed table keyed by topology hash (the link-cost
    analogue of the latency profile DB, reference:
    band/latency_estimator.cc:185-289)."""
    import json
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"hash": topology_hash(), "links": table.to_dict()}, f,
                  indent=1)


def load_table(path: str, table: LinkCostTable) -> bool:
    """Load a persisted probed table; stale topology hashes are
    ignored.  Returns True when the table was updated."""
    import json
    import os

    if not os.path.exists(path):
        return False
    with open(path) as f:
        payload = json.load(f)
    if payload.get("hash") != topology_hash():
        return False
    table.update_from_dict(payload.get("links", {}))
    return True


def measure(
    devices: Sequence, table: Optional[LinkCostTable] = None,
    small_bytes: int = 1 << 14, big_bytes: int = 1 << 22,
) -> LinkCostTable:
    """Probe h2d, host-memcpy and (when >=2 distinct devices) d2d link
    costs on the live transport and write them into `table`.

    Two transfer sizes separate fixed launch overhead from per-byte
    cost.  DCN is not probed single-process (jax.distributed transfers
    need a peer); its configured/default entry is kept.  Probes use
    fresh arrays and block on completion, so the numbers include the
    real dispatch round-trip the schedulers will actually pay."""
    import jax

    table = table or LinkCostTable()
    small = np.ones(small_bytes, np.uint8)
    big = np.ones(big_bytes, np.uint8)

    # host memcpy
    t_s = _best_of(lambda: small.copy())
    t_b = _best_of(lambda: big.copy())
    table.set(HOST, *_fit(t_s, t_b, small_bytes, big_bytes))

    accel = [d for d in devices if d.platform != "cpu"]
    uniq = []
    for d in accel:
        if all(d is not u for u in uniq):
            uniq.append(d)
    if uniq:
        dev = uniq[0]

        def h2d(arr):
            jax.device_put(arr, dev).block_until_ready()

        h2d(small)  # warm the transfer path once
        t_s = _best_of(lambda: h2d(small))
        t_b = _best_of(lambda: h2d(big))
        table.set(H2D, *_fit(t_s, t_b, small_bytes, big_bytes))
    if len(uniq) >= 2:
        src = jax.device_put(big, uniq[0])
        src_s = jax.device_put(small, uniq[0])
        jax.block_until_ready([src, src_s])

        def d2d(arr):
            jax.device_put(arr, uniq[1]).block_until_ready()

        d2d(src_s)
        t_s = _best_of(lambda: d2d(src_s))
        t_b = _best_of(lambda: d2d(src))
        table.set(ICI, *_fit(t_s, t_b, small_bytes, big_bytes))
    return table
