"""Accuracy gate: agreement between band-tpu lowerings and the TFLite
interpreter over random inputs.

The acceptance criterion for INT8 parity (BASELINE.md: accuracy within
the reference models' stated delta at the same bit-width).  Reports
per-output max |diff| in quantized units, exact-match fraction, and
top-1 agreement for classification-shaped outputs.

Usage: python -m band_tpu.tools.evaluate model.tflite [n_samples]
"""

from __future__ import annotations

import json
import sys
from typing import Dict

import numpy as np


def evaluate(path: str, n_samples: int = 8, conv_mode: str = None) -> Dict:
    import jax

    import tensorflow as tf

    from ..backend.program import build_program
    from ..tflite.parser import parse_tflite_file

    conv_mode = conv_mode or (
        "f32_split" if jax.default_backend() == "cpu" else "int8"
    )
    it = tf.lite.Interpreter(
        model_path=path,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES
        ),
    )
    it.allocate_tensors()
    g = parse_tflite_file(path)
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode=conv_mode)
    fn = jax.jit(prog.make_fn())
    params = {k: np.asarray(v) for k, v in prog.params.items()}

    rng = np.random.default_rng(0)
    stats: Dict[str, Dict] = {}
    top1_agree = 0
    top1_total = 0
    for _ in range(n_samples):
        feeds = {}
        for d in it.get_input_details():
            shape, dt = d["shape"], d["dtype"]
            if np.issubdtype(dt, np.integer):
                info = np.iinfo(dt)
                feeds[d["index"]] = rng.integers(
                    info.min, info.max + 1, shape
                ).astype(dt)
            else:
                feeds[d["index"]] = rng.standard_normal(shape).astype(dt)
        for idx, arr in feeds.items():
            it.set_tensor(idx, arr)
        it.invoke()
        outs = fn(params, [feeds[t] for t in prog.input_ids])
        ours = {t: np.asarray(o) for t, o in zip(prog.output_ids, outs)}
        for d in it.get_output_details():
            ref = it.get_tensor(d["index"])
            o = ours[d["index"]]
            key = d["name"] or str(d["index"])
            st = stats.setdefault(
                key, {"max_diff": 0.0, "exact_frac": [], "dtype": str(ref.dtype)}
            )
            if np.issubdtype(ref.dtype, np.integer):
                diff = np.abs(
                    o.astype(np.int64) - ref.astype(np.int64)
                )
                st["max_diff"] = max(st["max_diff"], int(diff.max()))
                st["exact_frac"].append(float((diff == 0).mean()))
            else:
                diff = np.abs(o - ref)
                st["max_diff"] = max(st["max_diff"], float(diff.max()))
                st["exact_frac"].append(float((diff < 1e-5).mean()))
            if ref.ndim == 2 and ref.shape[0] == 1 and ref.shape[1] >= 10:
                top1_total += 1
                if int(np.argmax(o)) == int(np.argmax(ref)):
                    top1_agree += 1
    for st in stats.values():
        st["exact_frac"] = float(np.mean(st["exact_frac"]))
    report = {
        "model": path.rsplit("/", 1)[-1],
        "samples": n_samples,
        "conv_mode": conv_mode,
        "outputs": stats,
    }
    if top1_total:
        report["top1_agreement"] = top1_agree / top1_total
    return report


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m band_tpu.tools.evaluate model.tflite "
              "[n_samples]", file=sys.stderr)
        return 2
    n = int(argv[1]) if len(argv) > 1 else 8
    print(json.dumps(evaluate(argv[0], n), indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
