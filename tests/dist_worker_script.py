"""Subprocess worker for test_multiprocess_distributed: one simulated
host with 2 CPU devices in a 2-process jax.distributed cluster.

Exercises the real multi-host path (SURVEY §2.9 / §5.8): coordinator
handshake via band_tpu.parallel.distributed.initialize, host-major
global_mesh, a dp-sharded computation whose reduction crosses processes
(GSPMD inserts the cross-host all-reduce), and process_span (the
scheduler's DCN-hop signal).

Usage: dist_worker_script.py <coordinator> <num_processes> <process_id>
Prints one JSON line with the results for the parent test to assert.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    coord, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from band_tpu.config import DistributedConfig
    from band_tpu.parallel import distributed as D

    cfg = DistributedConfig(
        coordinator_address=coord, num_processes=n_procs, process_id=pid
    )
    multi = D.initialize(cfg)

    mesh = D.global_mesh()  # auto: tp = devices-per-host, dp = hosts
    tp_rows_single_host = all(
        len({d.process_index for d in row}) == 1
        for row in mesh.devices
    )
    span = D.process_span(list(jax.devices()))

    # dp-sharded matmul + global reduction: the sum crosses processes
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, k, n = 8, 16, 4
    rng = np.random.default_rng(0)
    x_global = rng.normal(size=(b, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)

    x_sharding = NamedSharding(mesh, P("dp", None))
    x = jax.make_array_from_callback(
        (b, k), x_sharding, lambda idx: x_global[idx]
    )

    @jax.jit
    def f(x, w):
        y = x @ w                      # dp-parallel, no comm
        return jnp.sum(y * y)          # all-reduce across dp (DCN)

    got = float(f(x, jax.device_put(w)))
    want = float(((x_global @ w) ** 2).sum())

    print(json.dumps({
        "pid": pid,
        "multi": bool(multi),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "mesh_shape": list(mesh.devices.shape),
        "tp_rows_single_host": tp_rows_single_host,
        "process_span": span,
        "value_ok": abs(got - want) < 1e-2 * max(1.0, abs(want)),
    }), flush=True)


if __name__ == "__main__":
    main()
