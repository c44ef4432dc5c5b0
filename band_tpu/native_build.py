"""Shared native-library build helper.

All three on-demand builders (planner decision core, image kernels,
C ABI) publish atomically: compile to a pid-suffixed temp path, then
`os.replace` into place, so a concurrent process can never dlopen a
half-written library.  Stale temp litter from crashed builds is swept
on the way in.
"""

from __future__ import annotations

import glob
import os
import subprocess
import time
from typing import Sequence

# temp litter younger than this may belong to a live concurrent build
# in another process; only genuinely stale leftovers are swept
_STALE_TMP_SECONDS = 600.0


def atomic_build(
    cmd_prefix: Sequence[str],
    lib_path: str,
    timeout: float = 120.0,
    check: bool = False,
) -> bool:
    """Run `cmd_prefix + ["-o", <tmp>]`, then atomically publish
    `lib_path`.  Returns success; raises instead when `check` is set."""
    now = time.time()
    for stale in glob.glob(f"{lib_path}.tmp*"):
        try:
            if now - os.path.getmtime(stale) > _STALE_TMP_SECONDS:
                os.unlink(stale)
        except OSError:
            pass
    tmp = f"{lib_path}.tmp{os.getpid()}"
    try:
        subprocess.run(
            list(cmd_prefix) + ["-o", tmp],
            check=True,
            capture_output=True,
            timeout=timeout,
        )
        os.replace(tmp, lib_path)
        return True
    except Exception:
        if check:
            raise
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass
