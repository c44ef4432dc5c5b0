"""Summarize a JAX device trace (xplane.pb) by kernel and source line.

The tunneled dev transport's 2-5x wall-clock swings make chain-timing
A/Bs treacherous (docs/dev-notes.md); DEVICE time from an xprof trace
is phase-immune and attributes cost to the lowering source line that
emitted each HLO (jax carries source provenance into the trace).  This
is how the round-3 lowering wins/regressions were found.

Usage:
    # capture: jax.profiler.start_trace(dir); run; stop_trace()
    python -m band_tpu.tools.xprof_summary /tmp/xprof_trace [top_n]

Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python when the
installed tensorboard-plugin protos predate the protobuf runtime (the
tool re-execs itself with it set).
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys
from typing import Dict, Optional, Tuple


def _ensure_pure_python_protobuf() -> None:
    if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
        os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
        os.execv(sys.executable, [sys.executable] + sys.argv)


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def summarize(
    trace_dir: str, top_n: int = 20
) -> Dict[str, object]:
    """Aggregate device-plane op durations.  Returns {"total_ms",
    "modules": {name: ms}, "ops": [(ms, name, category, source,
    shape)], "by_source": [(ms, source)]}."""
    space = load_xspace(trace_dir)
    out: Dict[str, object] = {"total_ms": 0.0, "modules": {}, "ops": [],
                              "by_source": []}
    for plane in space.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        agg: collections.Counter = collections.Counter()
        info: Dict[str, Tuple[str, str, str]] = {}
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    nm = md.display_name or md.name
                    out["modules"][nm] = out["modules"].get(nm, 0.0) + (
                        ev.duration_ps / 1e9
                    )
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                nm = md.display_name or md.name
                agg[nm] += ev.duration_ps
                if nm not in info:
                    st = {}
                    for s in list(ev.stats) + list(md.stats):
                        k = stat_names.get(s.metadata_id, "?")
                        st[k] = s.str_value or s.int64_value
                    info[nm] = (
                        str(st.get("hlo_category", "")),
                        str(st.get("source", "")),
                        str(st.get("shape_with_layout", "")),
                        str(st.get("tf_op", "")),
                    )
        total = sum(agg.values())
        out["total_ms"] = float(out["total_ms"]) + total / 1e9
        by_src: collections.Counter = collections.Counter()
        by_op: collections.Counter = collections.Counter()
        for nm, ps in agg.items():
            by_src[info[nm][1]] += ps
            # graph-op attribution: the program builder wraps each op's
            # lowering in jax.named_scope("opNNN_NAME"), which rides the
            # HLO op_name into the trace's tf_op stat
            tf_op = info[nm][3]
            m = re.search(r"op\d+_\w+", tf_op)
            by_op[m.group(0) if m else (tf_op.rsplit("/", 1)[-1] or "?")] += ps
        out["ops"] = [
            (ps / 1e9, nm) + info[nm][:3]
            for nm, ps in agg.most_common(top_n)
        ]
        out["by_source"] = [
            (ps / 1e9, src) for src, ps in by_src.most_common(top_n)
        ]
        out["by_graph_op"] = [
            (ps / 1e9, op) for op, ps in by_op.most_common(top_n)
        ]
    return out


def main(argv: Optional[list] = None) -> int:
    _ensure_pure_python_protobuf()
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    top_n = int(argv[1]) if len(argv) > 1 else 20
    s = summarize(argv[0], top_n)
    for nm, ms in s["modules"].items():
        print(f"module {ms:9.3f} ms  {nm}")
    print(f"device ops total: {s['total_ms']:.3f} ms")
    print("== top ops")
    for ms, nm, cat, src, shape in s["ops"]:
        print(f"  {ms:8.4f} ms  {nm[:34]:36.36}{cat[:18]:18.18}"
              f"{src.split('/')[-1][:22]:24.24}{shape[:40]}")
    print("== by source line")
    for ms, src in s["by_source"]:
        print(f"  {ms:8.4f} ms  {src}")
    print("== by graph op (named scopes)")
    for ms, opname in s["by_graph_op"]:
        print(f"  {ms:8.4f} ms  {opname}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
