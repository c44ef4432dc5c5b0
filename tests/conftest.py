"""Test configuration: force an 8-device CPU JAX platform so multi-worker
and mesh behavior is testable without TPU hardware (the analogue of the
reference's desktop 2-CPU-worker fallback, tfl_subgraph_test.cc:40-50)."""

import os

# force CPU even when the environment pins a TPU platform (the dev
# container presets JAX_PLATFORMS to the TPU plugin and the plugin
# re-pins jax_platforms at import, so the config update below is needed
# in addition to the env var)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/band/test/data"


def model_path(name: str) -> str:
    return os.path.join(REFERENCE_DATA, f"{name}.tflite")


def has_model(name: str) -> bool:
    return os.path.exists(model_path(name))


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_tfl_interpreter(path: str, **kwargs):
    """TFLite oracle with builtin kernels (no XNNPACK), or skip."""
    tf = pytest.importorskip("tensorflow")
    return tf.lite.Interpreter(
        model_path=path,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES
        ),
        **kwargs,
    )


def random_feeds(interpreter, rng):
    feeds = {}
    for d in interpreter.get_input_details():
        shape, dt = d["shape"], d["dtype"]
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            feeds[d["index"]] = rng.integers(
                info.min, info.max + 1, shape
            ).astype(dt)
        else:
            feeds[d["index"]] = rng.standard_normal(shape).astype(dt)
    return feeds
