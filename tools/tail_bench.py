#!/usr/bin/env python
"""Microbench: decode-tail variants at the serving geometry (VERDICT r4 item 5).

The decode tail is the headline bench's worst profiled stage under XLA
(~5% MXU, 38 ms/b64 at 480×864 — docs/bench_matrix_r3.md).  This tool times
the three implementations on the current backend with the shipped tracker
geometry and batch:

  dense    MaskDecoder.decode_tail (vmap)          — the numerics reference
  subpix   network.decode_tail_subpix               — parity-packed XLA convs
  pallas   ops/pallas/decode_tail.decode_tail_pallas — fused single kernel

    python tools/tail_bench.py [--batch 64] [--objects 2] [--iters 20]
Prints one JSON line per variant (ms/batch, frames/sec-equivalent).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--objects", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from yolo_puncture_tpu.track import reference_tracker_geometry
    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_puncture_tpu.track.network import PropagationNetwork, decode_tail_subpix
    from yolo_puncture_tpu.ops.pallas.decode_tail import decode_tail_pallas

    h, w = reference_tracker_geometry((720, 1280), args.size)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    core = TrackerCore(image_size=(h, w), max_objects=args.objects,
                       mem_frames=8, dtype=dtype)
    V = core.variables
    rng = np.random.default_rng(0)
    N, No = args.batch, args.objects
    hidden = jnp.asarray(rng.standard_normal((N, No, core.h16, core.w16, 128)),
                         dtype)
    f8p = jnp.asarray(rng.standard_normal((N, 2 * core.h16, 2 * core.w16, 64)),
                      dtype)
    f4p = jnp.asarray(rng.standard_normal((N, 4 * core.h16, 4 * core.w16, 64)),
                      dtype)
    interp = jax.default_backend() == "cpu"

    def tail_dense(h_, f8, f4):
        return core.net.apply(V, h_, f8, f4, method=PropagationNetwork.decode_tail)

    variants = {
        "dense": jax.jit(lambda: jax.vmap(tail_dense)(hidden, f8p, f4p)),
        "subpix": jax.jit(
            lambda: decode_tail_subpix(V, hidden, f8p, f4p, dtype=dtype)),
        "pallas": jax.jit(
            lambda: decode_tail_pallas(V, hidden, f8p, f4p, dtype=dtype,
                                       interpret=interp)),
    }
    ref = None
    for name, fn in variants.items():
        out = jax.block_until_ready(fn())  # compile
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            scale = float(np.max(np.abs(ref))) or 1.0
            assert err / scale < 0.12, f"{name} diverges from dense: {err}"
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({
            "variant": name, "ms_per_batch": round(ms, 3),
            "batch": N, "objects": No, "geometry": [h, w],
            "frames_per_sec": round(N / (ms / 1e3), 1),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
