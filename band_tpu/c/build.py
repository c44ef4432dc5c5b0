"""Build libband_tpu_c.so (the C ABI over the engine).

Usage: ``python -m band_tpu.c.build [out_dir]``; also importable
(``build()``) so tests can build on demand.  Links against the
interpreter's libpython so the library can be used from plain C programs
(reference analogue: script/build_c_api.py driving bazel).
"""

from __future__ import annotations

import os
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))


def build(out_dir: str | None = None, quiet: bool = False) -> str:
    out_dir = out_dir or HERE
    src = os.path.join(HERE, "band_c.cc")
    out = os.path.join(out_dir, "libband_tpu_c.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    ldver = sysconfig.get_config_var("LDVERSION")
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        src,
        f"-I{include}",
        f"-L{libdir}",
        f"-lpython{ldver}",
        f"-Wl,-rpath,{libdir}",
    ]
    if not quiet:
        print(" ".join(cmd + ["-o", out]))
    import subprocess

    from ..native_build import atomic_build

    try:
        atomic_build(cmd, out, timeout=300, check=True)
    except subprocess.CalledProcessError as e:
        if e.stderr:  # surface the compiler diagnostics
            sys.stderr.write(
                e.stderr.decode("utf-8", "replace")
                if isinstance(e.stderr, bytes) else str(e.stderr)
            )
        raise
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
