"""band-tpu: a TPU-native multi-DNN quantized-inference serving engine.

Re-imagines Band (MobiSys'22, reference Luolin0826/band) for TPU:
INT8/UINT8 TFLite models execute as XLA/Pallas programs on TPU devices,
coordinated by Band's planner/scheduler suite with SLO-aware dispatch.

Quick start::

    import band_tpu as bt

    cfg = (bt.RuntimeConfigBuilder()
           .add_scheduler(bt.SchedulerType.ROUND_ROBIN)
           .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.TPU, device_ids=(0,)))
           .build())
    engine = bt.Engine.create(cfg)
    model = bt.Model.from_path("mobilenet_v2_quant.tflite")
    mid = engine.register_model(model)
    outputs = engine.request_sync(mid, [image_u8])
"""

from .common import (  # noqa: F401
    DeviceFlag,
    Job,
    JobStatus,
    RequestOption,
    SchedulerType,
    SubgraphKey,
    SubgraphPreparationType,
    WorkerType,
)
from .config import (  # noqa: F401
    MonitorConfig,
    PlannerConfig,
    ProfileConfig,
    RuntimeConfig,
    RuntimeConfigBuilder,
    SubgraphConfig,
    WorkerConfig,
    WorkerSpec,
    config_from_dict,
    config_from_json,
)
from .errors import (  # noqa: F401
    BandError,
    ConfigError,
    DeadlineExceeded,
    ExecutionError,
    LoweringError,
    ModelError,
    NotFound,
)
from .ir.model import Model  # noqa: F401
from .runtime.engine import Engine  # noqa: F401
from .runtime.tensor import StagedInput, Tensor  # noqa: F401
from .tracing.job_tracer import tracer  # noqa: F401

__version__ = "0.1.0"
