"""Two-process jax.distributed cluster on localhost: the real
multi-host bring-up path (parallel/distributed.py) exercised
end-to-end — coordinator handshake, host-major global mesh, a
cross-process all-reduce through GSPMD, and the DCN-hop signal.

The reference has no multi-node anything (SURVEY §5.8); this is the
TPU-native obligation from §2.9. Each subprocess simulates one host
with 2 CPU devices; collectives ride gloo over localhost (the same
code path rides DCN on real multi-host TPU)."""

import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SCRIPT = os.path.join(HERE, "dist_worker_script.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster():
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, coord, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err + out
        line = next(l for l in out.splitlines() if l.startswith("{"))
        r = json.loads(line)
        results[r["pid"]] = r

    assert set(results) == {0, 1}
    for r in results.values():
        assert r["multi"] is True
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2
        # auto-sized mesh: dp = hosts (2), tp = devices-per-host (2)
        assert r["mesh_shape"] == [2, 2]
        # "tp" rows must stay within one host (ICI domain)
        assert r["tp_rows_single_host"] is True
        # the global device set spans both processes (a DCN hop)
        assert r["process_span"] == 2
        # dp-sharded matmul + cross-process all-reduce is numerically
        # identical to the single-process computation
        assert r["value_ok"] is True
