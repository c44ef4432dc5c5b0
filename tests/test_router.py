"""Multi-host routing tier: two engine servers behind the router
(the local stand-in for N hosts over DCN)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.tools.router import serve_router
from band_tpu.tools.server import decode_tensor, encode_tensor, serve
from tests.conftest import has_model, model_path


def _call(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture
def cluster():
    if not has_model("add"):
        pytest.skip("reference model not available")
    cfg = lambda dev_id: (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(
            bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(dev_id,))
        )
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    servers = []
    urls = []
    for dev in (0, 1):
        es, httpd = serve(cfg(dev), port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        servers.append((es, httpd))
        urls.append(f"http://127.0.0.1:{httpd.server_address[1]}")
    router, rhttpd = serve_router(urls, port=0)
    threading.Thread(target=rhttpd.serve_forever, daemon=True).start()
    rurl = f"http://127.0.0.1:{rhttpd.server_address[1]}"
    yield rurl
    rhttpd.shutdown()
    for es, httpd in servers:
        httpd.shutdown()
        es.shutdown()


def test_router_replicates_and_balances(cluster, rng):
    status, h = _call(f"{cluster}/health")
    assert status == 200 and len(h["healthy"]) == 2

    status, reg = _call(f"{cluster}/models", "POST",
                        {"path": model_path("add")})
    assert status == 200 and reg["replicas"] == 2

    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    served = set()
    for _ in range(8):
        status, out = _call(
            f"{cluster}/request", "POST",
            {"model": "add.tflite", "inputs": [encode_tensor(x)]},
        )
        assert status == 200
        served.add(out["served_by"])
        np.testing.assert_allclose(decode_tensor(out["outputs"][0]), 3 * x,
                                   rtol=1e-5)
    # both hosts took traffic
    assert len(served) == 2

    status, stats = _call(f"{cluster}/stats")
    assert status == 200 and len(stats["backends"]) == 2


def test_router_unknown_model(cluster):
    status, resp = _call(f"{cluster}/request", "POST",
                         {"model": "nope.tflite", "inputs": []})
    assert status == 503
