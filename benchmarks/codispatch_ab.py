"""Interleaved co-dispatch A/B: serving rate with multi-model window
fusion off (co_dispatch=1) vs on (co_dispatch=3), cycling arms
round-robin inside ONE process so both arms sample every transport
phase (methodology of depth_interleaved_ab.py).  Medians per arm over
3 cycles.  Run SOLO on the chip.

Fusion targets the serving floor's per-dispatch submission term
(docs/performance.md round-5 RTT accounting: ~4 ms/window of tunneled
submission + ~3.4 ms host control plane at the 1924 req/s median) by
serving the 3-model cycle's three b32 windows as ONE XLA program.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np
import jax

import band_tpu as bt
from band_tpu.runtime.tensor import StagedInput

DATA = "/root/reference/band/test/data"
MODELS = [
    f"{DATA}/mobilenet_v2_1.0_224_quant.tflite",
    f"{DATA}/retinaface_mbv2_quant_160.tflite",
    f"{DATA}/ICN_quant.tflite",
]
N = int(os.environ.get("AB_REQUESTS", "3000"))
ARMS = [int(x) for x in os.environ.get("AB_CODISPATCH", "1,3").split(",")]
CYCLES = int(os.environ.get("AB_CYCLES", "3"))
MAXB = int(os.environ.get("AB_MAX_BATCH", "32"))
DEPTH = int(os.environ.get("AB_DEPTH", "8"))


def measure(co_dispatch: int, device, max_batch: int = None) -> tuple:
    max_batch = MAXB if max_batch is None else max_batch
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.TPU,
                                  device_ids=(0,), max_batch=max_batch,
                                  dispatch_depth=DEPTH,
                                  co_dispatch=co_dispatch,
                                  stuck_timeout_ms=120_000))
        .profile_warmups(1)
        .profile_runs(1)
        .build()
    )
    cfg.compilation_cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    eng = bt.Engine.create(cfg)
    try:
        rng = np.random.default_rng(0)
        mids, feeds = [], []
        for p in MODELS:
            mid = eng.register_model(bt.Model.from_path(p))
            mids.append(mid)
            g = eng.model_record(mid).model.graph
            ins = []
            for t in g.inputs:
                td = g.tensor(t)
                shape = [max(s, 1) for s in td.shape]
                info = np.iinfo(td.dtype)
                arr = rng.integers(info.min, info.max + 1,
                                   shape).astype(td.dtype)
                ins.append(StagedInput(arr).stage(device))
            feeds.append(ins)
        eng.wait_buckets_ready(timeout=900)
        if co_dispatch > 1:
            ok = eng.warm_co_dispatch(mids, batch=max_batch, timeout=900)
            print(f"  combo warm: {ok}", file=sys.stderr, flush=True)
        warm = [eng.request_async(mids[i % 3], feeds[i % 3])
                for i in range(9)]
        eng.wait_all(warm, timeout=300)

        def stream(n):
            t0 = time.perf_counter()
            ids = []
            while len(ids) < n:
                m = (len(ids) // max_batch) % 3
                k = min(max_batch, n - len(ids))
                ids += eng.request_async_batch([mids[m]] * k,
                                               [feeds[m]] * k)
            eng.wait_all(ids, timeout=600)
            last = eng.planner.get_finished_job(ids[-1])
            if last is not None and last.final_outputs:
                _ = np.asarray(
                    next(iter(last.final_outputs.values()))).ravel()[0]
            return time.perf_counter() - t0

        stream(max(N // 4, 256))  # warm the stream path
        t1 = stream(N)
        t2 = stream(2 * N)
        dt = t2 - t1
        if dt < 0.05 * t2:
            dt = t2 / 2.0
        print(
            f"  combos built: {len(eng._combo_state)}, "
            f"distinct sigs missed: {len(eng._combo_misses)}",
            file=sys.stderr, flush=True,
        )
        return N / dt, eng.co_dispatch_count
    finally:
        eng.shutdown()


def main():
    device = jax.devices()[0]
    results = {a: [] for a in ARMS}
    fused = {a: [] for a in ARMS}
    for c in range(CYCLES):
        for a in ARMS:
            r, nf = measure(a, device)
            results[a].append(round(r, 1))
            fused[a].append(nf)
            print(f"cycle {c} co_dispatch {a}: {r:.1f} req/s "
                  f"({nf} fused dispatches)",
                  file=sys.stderr, flush=True)
    out = {
        str(a): {
            "runs": v,
            "median": statistics.median(v),
            "fused_dispatches": fused[a],
        }
        for a, v in results.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
