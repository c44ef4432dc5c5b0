"""Depth/window sweep of the 3-model serving stream (VERDICT r4
next-round #1): runs bench.py's inner measurement once per
(dispatch_depth, max_batch) point, sequentially and solo on the chip,
and prints one summary table.  Each point differences (N, 2N) streams
like the official bench; the batched roofline comes from the cached
onchip table.  Run during a single transport phase if possible.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
POINTS = [
    # (depth, max_batch)
    (8, 32),   # shipped defaults
    (4, 32),
    (16, 32),
    (8, 16),
    (8, 64),
    (16, 64),
]


def run_point(depth, batch):
    env = dict(os.environ)
    env.update({
        "BENCH_DEPTH": str(depth),
        "BENCH_MAX_BATCH": str(batch),
        "BENCH_RUNS": "1",
        "BENCH_FIVE_MODEL_MS": "0",
        "BENCH_ONCHIP_BUDGET_S": "300",
    })
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"), "--inner"],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("INNER_RESULT:"):
            r = json.loads(line[len("INNER_RESULT:"):])
            return {
                "depth": depth, "max_batch": batch,
                "req_s": r["req_s"],
                "runs": r.get("runs"),
                "ratio_b1": r.get("ratio_vs_roofline"),
                "ratio_batched": r.get("ratio_vs_batched_roofline"),
                "roofline_batched": r.get("roofline_req_s_batched"),
                "rtt_ms": r.get("rtt_probe_ms"),
                "wall_s": round(time.time() - t0, 1),
            }
    sys.stderr.write(proc.stderr[-3000:] + "\n")
    return {"depth": depth, "max_batch": batch, "error": "no result",
            "wall_s": round(time.time() - t0, 1)}


def main():
    out = []
    for depth, batch in POINTS:
        print(f"=== depth={depth} max_batch={batch}", file=sys.stderr,
              flush=True)
        r = run_point(depth, batch)
        print(json.dumps(r), file=sys.stderr, flush=True)
        out.append(r)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
