#!/usr/bin/env python
"""Run bench.py across a config matrix and print a comparison table.

Each row re-invokes bench.py in a subprocess (fresh JAX runtime) with the
corresponding env; the persistent compilation cache makes repeat geometry
compiles cheap.  Use after a tunnel outage to re-validate the headline number
and to measure the default-off int8 paths (docs/architecture.md items 14-15).

    python tools/bench_matrix.py                 # standard matrix
    python tools/bench_matrix.py --iters 10 --quick
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MATRIX = [
    ("fused+shared b128 (headline)", {}),
    ("fused+shared b128 int8-det", {"BENCH_INT8_DET": "1"}),
    ("fused+shared b128 int8-mem", {"BENCH_INT8": "1"}),
    ("fused+shared b128 int8-both", {"BENCH_INT8_DET": "1", "BENCH_INT8": "1"}),
    ("fused+shared b128 int8-det-static", {"BENCH_INT8_DET": "1", "BENCH_INT8_STATIC": "1"}),
    ("fused+shared b256", {"BENCH_BATCH": "256"}),
    ("detector-only b128", {"BENCH_TRACK": "0"}),
    # Pallas-kernel trials (VERDICT r1 item 3): flash memory readout, and the
    # proto-resolution mask decode — pallas kernel vs matched-work XLA control
    ("fused+flash-readout b128", {"BENCH_FLASH": "1"}),
    ("proto-res decode XLA b128", {"BENCH_PROTO_RES": "1"}),
    ("proto-res decode Pallas b128", {"BENCH_PALLAS_PROTO": "1"}),
    # BASELINE config 5: fused VideoSpeedPipeline E2E (det+cls+analytics)
    ("e2e-config5 pipeline b32", {"BENCH_MODE": "e2e", "BENCH_BATCH": "32"}),
]

QUICK = MATRIX[:2]


def run_one(label, env_over, iters):
    env = dict(os.environ)
    env.update(env_over)
    env["BENCH_ITERS"] = str(iters)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=3000, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"label": label, "error": "timeout"}
    line = next(
        (l for l in out.stdout.splitlines() if l.startswith("{")), None)
    if line is None:
        return {"label": label, "error": out.stderr.strip()[-200:]}
    d = json.loads(line)
    d["label"] = label
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    rows = []
    for label, env_over in (QUICK if args.quick else MATRIX):
        r = run_one(label, env_over, args.iters)
        rows.append(r)
        fps = r.get("value")
        err = r.get("error")
        print(f"{label:36s}  " + (f"{fps:8.1f} fps" if fps else f"ERR {err}"),
              flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
