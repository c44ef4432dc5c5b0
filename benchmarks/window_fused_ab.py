"""Interleaved window-size A/B UNDER co-dispatch fusion: b32 vs b64
windows with the 3-model cycle fused into one XLA program per round.

The round-5 depth/window sweep measured "b64 no better than b32" —
but that experiment predates co-dispatch, where each window was its
own dispatch and the per-dispatch submission cost dominated.  Under
fusion the per-program fixed cost (submission + transport gap) is
amortized over co_dispatch x window requests, so doubling the window
halves that term per request; the b64 batched roofline itself is only
~4% above b32, so any gain measured here is fixed-cost amortization,
not device efficiency.  Methodology: arms cycled round-robin in ONE
process (every arm samples every transport phase), medians of 3 —
same as depth_interleaved_ab.py.  Run SOLO on the chip.
"""
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

import codispatch_ab as ab

ARMS = [int(x) for x in os.environ.get("AB_WINDOW_ARMS", "32,64").split(",")]
CYCLES = int(os.environ.get("AB_CYCLES", "3"))
CO = int(os.environ.get("AB_CODISPATCH_ON", "3"))


def main():
    device = jax.devices()[0]
    results = {a: [] for a in ARMS}
    fused = {a: [] for a in ARMS}
    for c in range(CYCLES):
        for a in ARMS:
            r, nf = ab.measure(CO, device, max_batch=a)
            results[a].append(round(r, 1))
            fused[a].append(nf)
            print(
                f"cycle {c} max_batch {a}: {r:.1f} req/s "
                f"({nf} fused dispatches)",
                file=sys.stderr, flush=True,
            )
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
