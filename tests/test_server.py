"""HTTP front-end test: register + request over the wire."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.tools.server import decode_tensor, encode_tensor, serve
from tests.conftest import has_model, model_path


@pytest.fixture
def server():
    if not has_model("add"):
        pytest.skip("reference model not available")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    es, httpd = serve(cfg, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    es.shutdown()


def _call(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_round_trip(server, rng):
    status, health = _call(f"{server}/health")
    assert status == 200 and health["status"] == "ok"

    status, reg = _call(
        f"{server}/models", "POST", {"path": model_path("add")}
    )
    assert status == 200
    mid = reg["model_id"]

    status, models = _call(f"{server}/models")
    assert str(mid) in models or mid in models

    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    status, out = _call(
        f"{server}/request",
        "POST",
        {"model_id": mid, "inputs": [encode_tensor(x)], "sync": True},
    )
    assert status == 200
    y = decode_tensor(out["outputs"][0])
    np.testing.assert_allclose(y, 3 * x, rtol=1e-5)

    status, stats = _call(f"{server}/stats")
    assert status == 200
    assert stats["execution_counts"]


def _raw_post(url, raw: bytes):
    req = urllib.request.Request(url, data=raw, method="POST")
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_bad_request(server):
    # every malformed request maps to a 400 JSON error, never a 500 or
    # a dropped connection
    status, resp = _call(f"{server}/request", "POST", {"model_id": 99,
                                                       "inputs": []})
    assert status == 400 and "error" in resp

    status, resp = _raw_post(f"{server}/request", b"not json")
    assert status == 400 and "invalid JSON" in resp["error"]

    status, resp = _raw_post(f"{server}/request", b"[1, 2, 3]")
    assert status == 400 and "JSON object" in resp["error"]

    status, resp = _raw_post(
        f"{server}/request",
        b'{"model_id": 0, "inputs": [{"shape": [2], "dtype": "float32",'
        b' "data": "AAAA"}]}',
    )
    assert status == 400

    status, resp = _call(f"{server}/models", "POST",
                         {"path": "/nonexistent/model.tflite"})
    assert status == 400 and "register failed" in resp["error"]


def test_server_unregister(server, rng):
    code, out = _call(f"{server}/models", "POST",
                      {"path": model_path("add")})
    assert code == 200
    mid = out["model_id"]
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    code, out = _call(f"{server}/request", "POST",
                      {"model_id": mid, "inputs": [encode_tensor(x)]})
    assert code == 200

    code, out = _call(f"{server}/models/{mid}", "DELETE")
    assert code == 200 and out["unregistered"] == mid
    code, models = _call(f"{server}/models")
    assert str(mid) not in models and mid not in models
    # further requests and double-unregister are clean 4xx
    code, out = _call(f"{server}/request", "POST",
                      {"model_id": mid, "inputs": [encode_tensor(x)]})
    assert code == 400
    code, out = _call(f"{server}/models/{mid}", "DELETE")
    assert code == 404
    code, out = _call(f"{server}/models/notanid", "DELETE")
    assert code == 400


def test_server_quarantined_worker_fails_explicitly(rng):
    """A wedged (watchdog-quarantined) worker's jobs come back as
    explicit HTTP errors, not hangs (VERDICT r1 next-round #8)."""
    if not has_model("add"):
        pytest.skip("reference model not available")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  stuck_timeout_ms=300))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    es, httpd = serve(cfg, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    blocker = threading.Event()
    try:
        code, body = _call(base + "/models", "POST",
                           {"path": model_path("add")})
        assert code == 200
        mid = body["model_id"]
        x = encode_tensor(np.zeros((1, 8, 8, 3), np.float32))

        w0 = es.engine.workers[0]
        orig = w0._dispatch

        def wedged(jobs, *a, **kw):
            blocker.wait(30.0)
            return orig(jobs, *a, **kw)

        w0._dispatch = wedged
        # async submit, then wait: must return an explicit error status
        code, body = _call(base + "/request", "POST",
                           {"model_id": mid, "inputs": [x], "sync": False})
        assert code == 200
        jid = body["job_id"]
        code, body = _call(base + "/wait", "POST",
                           {"job_id": jid, "timeout": 15})
        assert code in (400, 504), (code, body)
        assert "error" in body
    finally:
        blocker.set()
        httpd.shutdown()
        es.shutdown()
