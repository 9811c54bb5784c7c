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
    # the PUBLISHED configuration: self-contained tracker encoder, exact
    # window4 (per-frame-equivalent semantics), full-res ids — one (fps, IoU)
    # headline pair with docs/tracker_quality.md (VERDICT r2 item 1)
    ("quality-default b128 (headline)", {}),
    ("quality-default, exact window8", {"BENCH_WINDOW": "8"}),
    ("legacy window approx (r2 semantics)", {"BENCH_EXACT": "0"}),
    ("long-term tier on", {"BENCH_LT": "1"}),
    ("shared-pyramid (throughput experiment)", {"BENCH_SHARED": "1"}),
    ("int8 detector (dynamic scales)", {"BENCH_INT8_DET": "1"}),
    ("int8 detector (static scales)", {"BENCH_INT8_DET": "1", "BENCH_INT8_STATIC": "1"}),
    ("int8 memory ring", {"BENCH_INT8": "1"}),
    ("quality-default b256", {"BENCH_BATCH": "256"}),
    ("detector-only b128", {"BENCH_TRACK": "0"}),
    # BASELINE config 5: fused VideoSpeedPipeline — end-to-end (tunnel H2D
    # participates) and device-stage isolated (frames pre-staged; VERDICT r2
    # item 5)
    ("e2e-config5 pipeline b32", {"BENCH_MODE": "e2e", "BENCH_BATCH": "32"}),
    ("e2e-config5 device-stage b32", {"BENCH_MODE": "e2e_device", "BENCH_BATCH": "32"}),
    # Pallas-kernel trials (retired after the r2 on-chip verdict — XLA wins at
    # these shapes; rerun with --pallas to revalidate)
]

PALLAS_ROWS = [
    ("fused+flash-readout b128", {"BENCH_FLASH": "1"}),
    ("proto-res decode XLA b128", {"BENCH_PROTO_RES": "1"}),
    ("proto-res decode Pallas b128", {"BENCH_PALLAS_PROTO": "1"}),
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
    ap.add_argument("--pallas", action="store_true",
                    help="also rerun the retired Pallas-kernel trial rows")
    args = ap.parse_args()

    matrix = QUICK if args.quick else MATRIX + (PALLAS_ROWS if args.pallas else [])
    rows = []
    for label, env_over in matrix:
        r = run_one(label, env_over, args.iters)
        rows.append(r)
        fps = r.get("value")
        err = r.get("error")
        print(f"{label:36s}  " + (f"{fps:8.1f} fps" if fps else f"ERR {err}"),
              flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
