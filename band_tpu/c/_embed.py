"""Python glue for the C ABI (band_c.cc).

The C layer keeps data as (bytes, dtype-string, dims) triples and opaque
PyObject handles; everything engine-shaped happens here so the C++ side
never touches numpy/engine internals.  Mirrors the reference's
c_api_internal wrappers (band/c/c_api_internal.h:32-76) in role.
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..common import JobStatus, RequestOption
from ..config import config_from_dict
from ..errors import DeadlineExceeded
from ..ir.model import Model
from ..runtime.engine import Engine

RawTensor = Tuple[bytes, str, List[int]]

# C-side BandStatus values
_OK, _ERROR, _DEADLINE = 0, 1, 2

_STATUS_TO_C = {
    JobStatus.SUCCESS: _OK,
    JobStatus.SLO_VIOLATION: _DEADLINE,
}


def merge_json(d: Dict, text: str) -> None:
    obj = json.loads(text)
    if not isinstance(obj, dict):
        raise ValueError("config JSON fragment must be an object")
    d.update(obj)


def set_key(d: Dict, key: str, value: str) -> None:
    parts = key.split(".")
    cur = d
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    try:
        v = json.loads(value)
    except (json.JSONDecodeError, ValueError):
        v = value
    cur[parts[-1]] = v


def build_config(d: Dict):
    return config_from_dict(dict(d))


def build_config_from_file(path: str):
    with open(path) as f:
        return config_from_dict(json.load(f))


def model_from_path(path: str) -> Model:
    return Model.from_path(path)


def model_from_buffer(data: bytes) -> Model:
    return Model.from_buffer(bytes(data))


def engine_create(cfg) -> Engine:
    return Engine.create(cfg)


def engine_shutdown(engine: Engine) -> None:
    engine.shutdown()


def register_model(engine: Engine, model: Model) -> int:
    return engine.register_model(model)


def num_workers(engine: Engine) -> int:
    return engine.num_workers()


def worker_device(engine: Engine, worker_id: int) -> int:
    spec = engine.config.workers[worker_id]
    dev = getattr(spec.device, "value", spec.device)
    return {"cpu": 0, "tpu": 1, "tpu_mesh": 2}.get(str(dev), 0)


def tensor_specs(engine: Engine, model_id: int, which: str):
    """[(dims, dtype_str, name, nbytes)] for a model's inputs/outputs."""
    g = engine.model_record(model_id).model.graph
    ids = g.inputs if which == "in" else g.outputs
    out = []
    for t in ids:
        td = g.tensor(t)
        dt = np.dtype(td.dtype)
        dims = [int(s) for s in td.shape]
        out.append((dims, dt.str if dt.kind == "V" else dt.name,
                    td.name or "", int(np.prod(dims or [1])) * dt.itemsize))
    return out


def _to_arrays(raw_inputs: Sequence[RawTensor]) -> List[np.ndarray]:
    return [
        np.frombuffer(b, dtype=np.dtype(dt)).reshape(dims)
        for b, dt, dims in raw_inputs
    ]


def _from_arrays(outs: Sequence[np.ndarray]) -> List[RawTensor]:
    return [
        (np.ascontiguousarray(o).tobytes(), np.dtype(o.dtype).name,
         [int(s) for s in o.shape])
        for o in outs
    ]


def make_option(target_worker: int, require_callback: int, slo_us: int,
                slo_scale: float) -> RequestOption:
    return RequestOption(
        target_worker=target_worker,
        require_callback=bool(require_callback),
        slo_us=slo_us,
        slo_scale=slo_scale,
    )


def request_sync(engine: Engine, model_id: int,
                 raw_inputs: Sequence[RawTensor], option: RequestOption,
                 timeout: float = 120.0):
    """Returns (status:int, outputs:[RawTensor])."""
    try:
        outs = engine.request_sync(model_id, _to_arrays(raw_inputs), option,
                                   timeout=timeout)
    except DeadlineExceeded:
        return _DEADLINE, []
    return _OK, _from_arrays(outs)


def request_async(engine: Engine, model_id: int,
                  raw_inputs: Sequence[RawTensor],
                  option: RequestOption) -> int:
    return engine.request_async(model_id, _to_arrays(raw_inputs), option)


def wait(engine: Engine, job_id: int, timeout: float = 120.0):
    """Returns (status:int, outputs:[RawTensor])."""
    try:
        outs = engine.wait(job_id, timeout=timeout)
    except DeadlineExceeded:
        return _DEADLINE, []
    return _OK, _from_arrays(outs)


def set_on_end_request(engine: Engine, c_callable) -> int:
    """Register a C trampoline; it receives (job_id, c_status)."""

    def cb(job_id: int, status: JobStatus) -> None:
        c_callable(int(job_id), _STATUS_TO_C.get(status, _ERROR))

    engine.register_callback(cb)
    return 0


def set_log_severity(level: int) -> None:
    from ..tracing.logger import Logger, LogSeverity

    Logger.get().set_verbosity(LogSeverity(level))


def set_log_reporter(c_callable) -> int:
    from ..tracing.logger import Logger

    return Logger.get().add_reporter(
        lambda sev, msg: c_callable(int(sev), str(msg))
    )


def unset_log_reporter(handle: int) -> None:
    from ..tracing.logger import Logger

    Logger.get().remove_reporter(handle)


# C-enum mapping for numpy dtype names (band_c.h BandDataType)
_DTYPE_TO_C = {
    "float32": 1, "int32": 2, "uint8": 3, "int64": 4, "bool": 6,
    "int16": 7, "complex64": 8, "int8": 9, "float16": 10, "float64": 11,
}


def dtype_to_c(name: str) -> int:
    return _DTYPE_TO_C.get(name, 0)
