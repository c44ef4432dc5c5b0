"""C ABI test: build libband_tpu_c.so + the example C client, run it in a
subprocess against add.tflite, and assert the full round trip (config
builder protocol, register, sync + async + wait, end-callbacks).
Reference analogue: band/test/c/c_api_test.cc."""

import os
import shutil
import subprocess
import sys

import pytest

from tests.conftest import has_model, model_path

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
CDIR = os.path.join(REPO, "band_tpu", "c")


@pytest.fixture(scope="module")
def c_artifacts(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    out_dir = str(tmp_path_factory.mktemp("c_api"))
    from band_tpu.c.build import build

    lib = build(out_dir, quiet=True)
    exes = []
    for src, name in [("main.c", "band_c_example"),
                      ("buffer_main.c", "band_c_buffer_example")]:
        exe = os.path.join(out_dir, name)
        subprocess.run(
            [
                "g++", "-O1", os.path.join(CDIR, "example", src),
                f"-I{CDIR}", f"-L{out_dir}", "-lband_tpu_c",
                f"-Wl,-rpath,{out_dir}", "-o", exe,
            ],
            check=True,
            capture_output=True,
        )
        exes.append(exe)
    return (lib, *exes)


def _run_example(exe, *args):
    env = dict(os.environ)
    # the embedded interpreter (linked against the base python) needs the
    # repo, the venv site-packages, and the axon site dir on its path
    extra = [REPO] + [p for p in sys.path if p and os.path.isdir(p)]
    env["PYTHONPATH"] = os.pathsep.join(
        extra + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    env["BAND_TPU_PLATFORM"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    return subprocess.run(
        [exe, *args], env=env, capture_output=True, text=True, timeout=300
    )


def test_c_api_round_trip(c_artifacts):
    if not has_model("add"):
        pytest.skip("reference model not available")
    _, exe, _ = c_artifacts
    proc = _run_example(exe, model_path("add"))
    assert proc.returncode == 0, proc.stderr + proc.stdout
    out = proc.stdout
    assert "log_reporter=1" in out
    assert "num_workers=2" in out
    assert "inputs=1 outputs=1" in out
    # add.tflite computes 3*x; input filled with 2.0
    assert "sync out[0]=6.0" in out
    assert "async out[0]=6.0" in out
    assert "callbacks=2" in out
    assert "quant_type=0" in out  # add.tflite is float32
    assert "callbacks_after_unset=2" in out  # unset stops callbacks
    assert "default_engine=1 default_workers=1" in out  # cpu platform
    assert "unregistered=1 request_after_unregister_fails=1" in out
    assert "C API OK" in out


def test_c_api_quantization_getters(c_artifacts):
    """int8 model: affine quantization surfaced through the C ABI with
    the model's real scale/zero-point (reference:
    BandTensorGetQuantizationType/Params)."""
    path = os.path.join(HERE, "data", "fc_int8.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    _, exe, _ = c_artifacts
    proc = _run_example(exe, path)
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "quant_type=1" in proc.stdout
    # scale/zp of the model's input tensor
    from band_tpu.tflite.parser import parse_tflite_file

    g = parse_tflite_file(path)
    td = g.tensor(g.inputs[0])
    line = next(l for l in proc.stdout.splitlines()
                if l.startswith("quant num="))
    assert line == (
        f"quant num=1 scale0={float(td.quant.scale[0]):.6f} "
        f"zp0={int(td.quant.zero_point[0])} "
        f"dim={int(td.quant.quantized_dimension)}"
    )


def test_c_api_error_surface(c_artifacts):
    _, exe, _ = c_artifacts
    proc = _run_example(exe, "/nonexistent/model.tflite")
    assert proc.returncode == 1
    assert "register failed" in proc.stderr


def test_c_api_buffer_image_processor(c_artifacts):
    """Buffer + ImageProcessor C surface (reference: c_api_buffer.h):
    raw RGB / NV21 / strided I420 buffers, auto + explicit pipelines,
    varargs operator protocol, and feeding the result into inference."""
    if not has_model("add"):
        pytest.skip("reference model not available")
    _, _, exe = c_artifacts
    proc = _run_example(exe, model_path("add"))
    assert proc.returncode == 0, proc.stderr + proc.stdout
    out = proc.stdout
    assert "auto left=100.0 right=200.0 ok=1" in out
    assert "crop_norm=50.0 ok=1" in out
    assert "flip=70.0 ok=1" in out
    assert "rotate=70.0 ok=1" in out
    assert "nv21=130.0 ok=1" in out
    assert "yuv=130.0 ok=1" in out
    assert "sync=390.0 ok=1" in out
    assert "bad_arity=1" in out
    assert "BUFFER API OK" in out


def test_c_http_client_against_live_server(tmp_path):
    """Non-Python client proof for the network serving tier (VERDICT r1
    next-round #10): a plain-C HTTP client (c/example/http_client_main.c)
    registers a model and runs inference against a live server."""
    import shutil
    import subprocess
    import threading

    import band_tpu as bt
    from band_tpu.tools.server import serve
    from tests.conftest import has_model, model_path

    if shutil.which("gcc") is None:
        pytest.skip("no C toolchain")
    if not has_model("add"):
        pytest.skip("reference model not available")
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "band_tpu", "c", "example", "http_client_main.c",
    )
    exe = str(tmp_path / "http_client")
    subprocess.run(["gcc", "-O2", "-o", exe, src], check=True)

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
    try:
        out = subprocess.run(
            [exe, "127.0.0.1", str(port), model_path("add")],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr + out.stdout
        assert "C HTTP CLIENT OK" in out.stdout
    finally:
        httpd.shutdown()
        es.shutdown()
