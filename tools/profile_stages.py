#!/usr/bin/env python
"""Per-stage timing of the fused bench pipeline on the real TPU.

Times cumulative PREFIXES of the fused program (letterbox; +detector forward;
+select/decode; +pyramid-adapter encode; +propagation) and differences
consecutive prefixes to attribute per-stage cost.  Uses the honest
chained-timing protocol (docs/architecture.md item 6): each prefix is jitted
once, iterations chain through a carried checksum folded into the input frames
(so iteration N+1 depends on N), and ONE host fetch at the end forces the
chain — `block_until_ready` is dispatch-only on the axon remote plugin and a
synchronous fetch costs ~30 ms, so per-iteration fetches would swamp the
signal.

Usage: python tools/profile_stages.py  [BENCH_BATCH=128 BENCH_ITERS=10]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from yolo_puncture_tpu.models.yolo import YOLOModel
from yolo_puncture_tpu.ops.letterbox import letterbox, letterbox_params
from yolo_puncture_tpu.ops.nms import select_detections
from yolo_puncture_tpu.ops.masks import decode_masks
from yolo_puncture_tpu.track import reference_tracker_geometry
from yolo_puncture_tpu.track.core import TrackerCore


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    imgsz = int(os.environ.get("BENCH_IMGSZ", "640"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    model = YOLOModel(version="v10", scale="s", nc=1, task="segment", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    )
    shared = os.environ.get("BENCH_SHARED", "0") != "0"
    core = TrackerCore(
        image_size=reference_tracker_geometry((720, 1280)), max_objects=4,
        mem_frames=8, mem_every=4, enable_long_term=False, dtype=jnp.bfloat16,
        subpix_tail=True, pyramid_adapter=shared,
    )
    mem0 = core.memory._replace(active=core.memory.active.at[0].set(True))
    trk_vars = core.variables
    _r, (new_w, new_h), (left, top) = letterbox_params(720, 1280, imgsz)
    content_box = (
        (top / imgsz, (top + new_h) / imgsz),
        (left / imgsz, (left + new_w) / imgsz),
    )

    # Each stage returns (chk, mem); `upto` selects the prefix depth.
    def pipeline(variables, mem, frames_u8, conf, chk, upto):
        imgs, r, pad = letterbox(frames_u8, imgsz, dtype=jnp.bfloat16, bgr_to_rgb=True)
        if upto == 0:
            return chk + imgs.astype(jnp.float32)[:, ::97, ::97].sum(), mem
        out = model.apply(variables, imgs)
        if upto == 1:
            return chk + out["proto"].astype(jnp.float32)[:, ::37, ::37].sum(), mem
        det = select_detections(out, nms_free=True, conf_thres=conf, max_det=8)
        masks = decode_masks(
            out["proto"], det["coeffs"][:, :1], det["boxes"][:, :1],
            (imgsz, imgsz), upsample=True, threshold=0.5,
        )
        chk = (
            chk
            + det["boxes"][:, 0].astype(jnp.float32).sum()
            + masks[:, 0].astype(jnp.int32)[:, ::37, ::37].sum()
        )
        if upto == 2:
            return chk, mem
        if shared:
            pyr = out["pyramid"]
            keys, skips = core.encode_pyramid(
                trk_vars, pyr["P3"], pyr["P4"], pyr["P5"], content_box=content_box
            )
        else:
            from yolo_puncture_tpu.track.network import PropagationNetwork

            th, tw = core.image_size
            B = frames_u8.shape[0]
            timgs = (
                jax.image.resize(
                    frames_u8.astype(jnp.bfloat16), (B, th, tw, 3), "bilinear"
                )
                / 255.0
            )
            if upto == 25:  # resize-only stage
                return chk + timgs.astype(jnp.float32)[:, ::97, ::97].sum(), mem
            keys, skips = core.net.apply(
                trk_vars, timgs, method=PropagationNetwork.encode_key
            )
        if upto == 3:
            return chk + keys.astype(jnp.float32)[:, ::13, ::13].sum(), mem
        if upto == 35:
            # memory-coupled scan ONLY (readout + head + sensory + writes) —
            # no decode tail, no ids
            import jax as _jax

            B = keys.shape[0]
            W = 4
            nw = B // W

            def body(memory, inp):
                keys_w, f16_w = inp
                memory, hidden, _ = core._propagate_scan_core(
                    trk_vars, memory, keys_w, f16_w, exact=True
                )
                return memory, hidden

            mem2, hidden = _jax.lax.scan(
                body, mem,
                (keys.reshape(nw, W, *keys.shape[1:]),
                 skips["f16"].reshape(nw, W, *skips["f16"].shape[1:])),
            )
            chk = chk + hidden.astype(jnp.float32)[:, :, :, ::7, ::7].sum()
            return chk, mem2
        if upto == 4:
            mem, ids_s4 = core.propagate_frames(
                trk_vars, mem, keys, skips, window=4, exact=True
            )
            chk = chk + ids_s4[:, ::16, ::16].astype(jnp.int32).sum()
            return chk, mem
        mem, ids = core.propagate_frames(
            trk_vars, mem, keys, skips, window=4, exact=True, full_res_ids=True
        )
        chk = chk + ids[:, ::64, ::64].astype(jnp.int32).sum()
        return chk, mem

    names = ["letterbox", "+detector fwd", "+select/decode"]
    uptos = [0, 1, 2]
    if not shared:
        names.append("+tracker resize")
        uptos.append(25)
    names += ["+trk encode", "+scan (no tail)", "+propagate (s4 ids)", "+full-res ids"]
    uptos += [3, 35, 4, 5]
    steps = [
        jax.jit(lambda v, m, f, c, k, u=u: pipeline(v, m, f, c, k, u))
        for u in uptos
    ]

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch, 720, 1280, 3), dtype=np.uint8)
    )
    conf = jnp.float32(0.25)

    times = []
    for name, step in zip(names, steps):
        chk, mem = step(variables, mem0, frames, conf, jnp.float32(0))
        np.asarray(chk)  # compile + settle
        t0 = time.perf_counter()
        chk = jnp.float32(0)
        mem = mem0
        for _ in range(iters):
            # fold chk into the frames so each iteration depends on the last
            f = frames + (chk.astype(jnp.uint8) & jnp.uint8(0))
            chk, mem = step(variables, mem, f, conf, chk)
        np.asarray(chk)  # one fetch forces the chain
        dt = (time.perf_counter() - t0) / iters
        times.append(dt)
        print(f"{name:16s} cumulative {dt * 1e3:8.2f} ms/batch", flush=True)

    print("\nPer-stage attribution (consecutive diffs):")
    prev = 0.0
    for name, t in zip(names, times):
        print(f"  {name:16s} {max(t - prev, 0.0) * 1e3:8.2f} ms")
        prev = t
    total = times[-1]
    print(f"\nTotal {total * 1e3:.2f} ms/batch  →  {batch / total:.1f} fps")


if __name__ == "__main__":
    main()
