"""Same-phase A/B: exact vs fast numerics whole-model on-chip times.

Serial-chain differencing (docs/performance.md methodology) at b1 and
b32 for the 3-model mix, exact and fast programs interleaved within one
process so the comparison shares a transport phase.  Run SOLO on the
chip (dev-notes item 15).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np
import jax
import jax.numpy as jnp

from band_tpu.backend.program import build_program
from band_tpu.tflite.parser import parse_tflite_file

DATA = "/root/reference/band/test/data"
MODELS = [
    ("mobilenet_v2_1.0_224_quant", f"{DATA}/mobilenet_v2_1.0_224_quant.tflite"),
    ("retinaface_mbv2_quant_160", f"{DATA}/retinaface_mbv2_quant_160.tflite"),
    ("ICN_quant", f"{DATA}/ICN_quant.tflite"),
]
B = int(os.environ.get("AB_BATCH", "32"))


def chain_ms(prog, params, device, batch, rng):
    g = prog.graph
    td = g.tensor(g.inputs[0])
    shape = [max(s, 1) for s in td.shape]
    if np.issubdtype(td.dtype, np.integer):
        info = np.iinfo(td.dtype)
        mk = lambda: rng.integers(info.min, info.max + 1, shape).astype(td.dtype)
    else:
        mk = lambda: rng.standard_normal(shape).astype(td.dtype)
    if batch == 1:
        fn = prog.make_fn()

        def chained(params, x, n):
            def body(i, carry):
                outs = fn(params, [carry])
                s = outs[0].ravel()[0].astype(jnp.int32)
                return (carry.astype(jnp.int32) + (s & 1)).astype(carry.dtype)
            return jax.lax.fori_loop(0, n, body, x)

        x = jax.device_put(mk(), device)
        iters = (8, 24)
    else:
        fnb = prog.make_fn(batch_hint=batch)
        bfn = jax.vmap(fnb, in_axes=(None, 0))

        def chained(params, xb, n):
            def body(i, carry):
                outs = bfn(params, [carry])
                s = outs[0].reshape(batch, -1)[:, 0].astype(jnp.int32)
                s = s.reshape((batch,) + (1,) * (carry.ndim - 1))
                return (carry.astype(jnp.int32) + (s & 1)).astype(carry.dtype)
            return jax.lax.fori_loop(0, n, body, xb)

        x = jax.device_put(np.stack([mk() for _ in range(batch)]), device)
        iters = (4, 12)
    cf = jax.jit(chained)

    def run(n):
        t0 = time.perf_counter()
        _ = np.asarray(cf(params, x, n).ravel()[0])
        return time.perf_counter() - t0

    run(2)
    n1, n2 = iters
    t1s, t2s = [], []
    for _ in range(3):
        t1s.append(run(n1))
        t2s.append(run(n2))
    return (min(t2s) - min(t1s)) / (n2 - n1) * 1000.0


def main():
    device = jax.devices()[0]
    print(f"device: {device}", file=sys.stderr)
    rng = np.random.default_rng(0)
    out = {}
    for name, path in MODELS:
        g = parse_tflite_file(path)
        progs = {}
        for mode, exact in (("exact", True), ("fast", False)):
            prog = build_program(g, range(len(g.ops)), exact=exact,
                                 conv_mode="int8")
            params = {k: jax.device_put(v, device)
                      for k, v in prog.params.items()}
            progs[mode] = (prog, params)
        for batch in (1, B):
            row = {}
            # interleave modes within the same phase window
            for mode in ("exact", "fast"):
                prog, params = progs[mode]
                ms = chain_ms(prog, params, device, batch, rng)
                row[mode] = round(ms / batch, 4)
            key = f"{name}@b{batch}"
            row["speedup"] = round(row["exact"] / row["fast"], 3) \
                if row["fast"] > 0 else -1
            out[key] = row
            print(key, row, file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
