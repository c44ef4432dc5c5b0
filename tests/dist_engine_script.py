"""Subprocess worker for test_spmd_engine: one simulated host (2 CPU
devices) of a 2-process jax.distributed cluster running the ENGINE
itself across hosts — planner + HEFT + continuous batching on process 0
driving a mesh worker whose device group spans both processes, with
process 1 replaying the cross-process launches (parallel/spmd.py).

This is the end-to-end for SURVEY §2.9 "Distributed comm backend" /
§5.8 and BASELINE milestone #5 that round 1 stopped short of: the
*engine* (not raw ShardedPrograms) serving a model mix over a
host-spanning mesh, via the reference-schema benchmark tool.

Usage: dist_engine_script.py <coordinator> <num_processes> <process_id>
Process 0 prints the benchmark report as one JSON line.
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

DATA = "/root/reference/band/test/data"


def main() -> None:
    coord, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from band_tpu.tools.benchmark import BenchmarkConfig, run_distributed

    cfg = BenchmarkConfig.from_dict({
        "models": [
            {"graph": f"{DATA}/add.tflite", "period_ms": 5,
             "batch_size": 4, "slo_us": 1_000_000},
            # gloo-over-localhost collectives make the tp-sharded ICN
            # slow on the CPU test cluster; no SLO, light load — the
            # assertion is completion through the spanning engine, the
            # SLO stats come from the add stream
            {"graph": f"{DATA}/ICN_quant.tflite", "period_ms": 200,
             "batch_size": 1, "slo_us": -1},
        ],
        "schedulers": ["heterogeneous_earliest_finish_time"],
        "workers": [
            # host-spanning mesh worker: global devices 0,1 live on
            # process 0 and 2,3 on process 1; dp=2 x tp=2
            {"device": "tpu", "device_ids": [0, 1, 2, 3],
             "mesh_shape": [2, 2], "max_batch": 8},
            {"device": "cpu", "device_ids": [0]},
        ],
        "running_time_ms": 3000,
        "profile_num_warmups": 0,
        "profile_num_runs": 1,
        "execution_mode": "periodic",
        "distributed": {
            "coordinator_address": coord,
            "num_processes": n_procs,
            "process_id": pid,
        },
    })
    report = run_distributed(cfg)
    if report is not None:
        print("REPORT" + json.dumps(report))
    else:
        print("FOLLOWER_DONE")


if __name__ == "__main__":
    main()
