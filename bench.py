#!/usr/bin/env python
"""Headline benchmark: frames/sec/chip, YOLOv10-S seg + DEVA propagation, 640×640.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 500 (BASELINE.json north star: ≥500 frames/sec/chip on
TPU v5e for YOLOv10-S seg+DEVA).

Protocol: streaming video.  Each iteration processes one batch of frames through
ONE device program (BENCH_FUSED=1, default): letterbox → YOLOv10-S seg forward
bf16 → NMS-free top-k → proto-mask decode of the best instance → DEVA-style
windowed propagation whose ring-buffer memory is carried ACROSS batches (true
stateful streaming, reference semantics).  The propagation stage consumes the
detector's letterboxed tensor (resized 640→480 on device) — raw frames are read
exactly once per batch.  BENCH_FUSED=0 keeps the two-program split (detector
program + tracker program, each reading the raw frames).  Timed steady-state on
the real chip.

Sync protocol: on the axon remote-TPU plugin ``jax.block_until_ready`` returns
before execution finishes (dispatch-only), and every synchronous host fetch
costs a ~30 ms tunnel round trip.  The timed region therefore creates an
on-device dependency chain instead of fetching per iteration: det_step folds a
checksum of its per-frame outputs into a carried scalar (so iteration N+1's
program depends on N's outputs), the tracker already chains through its memory
state, and ONE host fetch of (checksum, ids) at the end forces the whole chain
— total fetch cost is one round trip, not one per iteration.  Masks stay on
device (the fused pipeline consumes them on-device).
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# Orchestrator layer (parent process).
#
# The axon remote-TPU tunnel has multi-hour outage windows and can also flap
# for a few minutes at a time.  Round 1's single 180 s probe turned one flap
# into a 0.0 fps official record (BENCH_r01.json).  The parent process now
# spends the whole watchdog budget trying:
#   phase 1 — cheap probe subprocesses (fresh JAX backend each time, so a hung
#             backend never wedges the parent) with escalating backoff until
#             one completes a real device computation;
#   phase 2 — measurement child (BENCH_CHILD=1 runs the original bench below).
#             A mid-run stall is killed by pid and retried; the persistent
#             compile cache (~/.jax_cache) makes retries skip recompilation.
# Success → re-emit the child's JSON line, exit 0.  Exhausted budget → one
# bail JSON line with attempt history, nonzero exit.
# ---------------------------------------------------------------------------

# Most recent value measured on the real chip (the axon tunnel has multi-hour
# outages); reported alongside a bail so an infra failure at bench time is
# distinguishable from a perf regression.  value/vs_baseline in the bail line
# stay 0.0: nothing was measured THIS run.
LAST_MEASURED = {
    "fps": 860.4, "date": "2026-08-21",
    "config": "quality-default r4: self-contained encoder, exact window4, "
              "full-res ids, max_objects=2, b128 (the shipped default — the "
              "r3 'b128 exhausts HBM' claim was falsified once the fp32 "
              "decode-tail materialization was removed), honest 480x864 "
              "geometry (docs/bench_matrix_r4.md)",
}

# the axon plugin force-registers at jax import and ignores the JAX_PLATFORMS
# env var; honor it via jax.config so CPU smoke-testing of this script works
_PROBE_SRC = (
    "import os, numpy as np, jax;"
    "p = os.environ.get('JAX_PLATFORMS');"
    "jax.config.update('jax_platforms', p) if p else None;"
    "import jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "print('PROBE_OK', float(np.asarray((x @ x).sum())))"
)


def _run_probe(timeout_s: float) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return "PROBE_OK" in (r.stdout or "")
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def _orchestrate() -> None:
    budget = float(os.environ.get("BENCH_WATCHDOG_SECS", "2700"))
    t_start = time.time()
    deadline = t_start + budget - 30.0
    history = []

    # Phase 1: probe until the device answers (or budget gone).
    probe_ok = False
    backoff = 30.0
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        t = min(150.0, max(30.0, deadline - time.time()))
        t_p = time.time()
        if _run_probe(t):
            probe_ok = True
            history.append(f"probe#{attempt} ok ({time.time()-t_p:.0f}s)")
            break
        history.append(f"probe#{attempt} fail ({time.time()-t_p:.0f}s)")
        if time.time() + backoff >= deadline:
            break
        time.sleep(backoff)
        backoff = min(backoff * 2.0, 300.0)

    if not probe_ok:
        print(json.dumps({
            "metric": "frames/sec/chip at 640x640 (YOLOv10-S seg+DEVA)",
            "value": 0.0, "unit": "frames/sec", "vs_baseline": 0.0,
            "error": "device unreachable after retries: " + "; ".join(history),
            "last_measured_on_chip": LAST_MEASURED,
        }), flush=True)
        sys.exit(2)

    # Phase 2: measurement child, retried on stall/failure.
    child_env = dict(os.environ)
    child_env["BENCH_CHILD"] = "1"
    child_env.setdefault("BENCH_PROBE_TIMEOUT", "120")
    m_attempt = 0
    last_err = "no measurement attempt fit in budget"
    while time.time() < deadline - 120.0:
        m_attempt += 1
        remaining = deadline - time.time()
        # first attempt may cold-compile (~5 min/program remote); later
        # attempts hit the persistent compile cache
        per_attempt = min(remaining, 1500.0 if m_attempt == 1 else 900.0)
        child_env["BENCH_WATCHDOG_SECS"] = str(max(60.0, per_attempt - 15.0))
        t_m = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=child_env, capture_output=True, text=True,
                timeout=per_attempt,
            )
            out_lines = [ln for ln in (r.stdout or "").splitlines()
                         if ln.startswith("{")]
            if out_lines:
                parsed = json.loads(out_lines[-1])
                if parsed.get("value", 0) > 0:
                    history.append(f"measure#{m_attempt} ok ({time.time()-t_m:.0f}s)")
                    print(out_lines[-1], flush=True)
                    sys.exit(0)
                last_err = parsed.get("error", f"rc={r.returncode}")
            else:
                tail = ((r.stderr or "").strip().splitlines() or ["no output"])[-1]
                last_err = f"rc={r.returncode}: {tail[:200]}"
        except subprocess.TimeoutExpired:
            last_err = f"measurement child hung > {per_attempt:.0f}s"
        history.append(f"measure#{m_attempt} fail ({time.time()-t_m:.0f}s): {last_err}")
        # quick re-probe before burning another long attempt
        if time.time() < deadline - 180.0 and not _run_probe(120.0):
            history.append("re-probe fail")
            time.sleep(min(60.0, max(0.0, deadline - time.time() - 120.0)))

    print(json.dumps({
        "metric": "frames/sec/chip at 640x640 (YOLOv10-S seg+DEVA)",
        "value": 0.0, "unit": "frames/sec", "vs_baseline": 0.0,
        "error": f"all attempts failed: {last_err}",
        "attempts": history,
        "last_measured_on_chip": LAST_MEASURED,
    }), flush=True)
    sys.exit(3)


if __name__ == "__main__" and os.environ.get("BENCH_CHILD") != "1":
    _orchestrate()  # exits; measurement below runs only in the child

import jax

if os.environ.get("JAX_PLATFORMS"):  # axon plugin ignores the env var (see above)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np


def _bail(reason: str, code: int) -> None:
    print(json.dumps({
        "metric": "frames/sec/chip at 640x640 (YOLOv10-S seg+DEVA)",
        "value": 0.0, "unit": "frames/sec", "vs_baseline": 0.0,
        "error": reason,
        "last_measured_on_chip": LAST_MEASURED,
    }), flush=True)
    os._exit(code)


def _probe_device(timeout_s: float = 180.0) -> None:
    """The remote-TPU tunnel can hang indefinitely (accepts connections but
    never answers — even ``jax.devices()`` blocks).  Probe a tiny computation
    on a watchdog so the driver gets a clean error line instead of a hang."""
    done = threading.Event()

    def probe():
        np.asarray(jnp.ones((4, 4)).sum())
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        _bail(f"device unreachable (probe hung > {timeout_s:.0f}s)", 2)


def _global_watchdog(limit_s: float) -> None:
    """If the tunnel dies mid-run every fetch hangs forever; bound the whole
    bench.  Healthy runs (incl. ~5 min/program cold remote compiles) finish
    well inside the default 45 min."""
    def fire():
        _bail(f"bench exceeded {limit_s:.0f}s (tunnel stall?)", 3)

    t = threading.Timer(limit_s, fire)
    t.daemon = True
    t.start()


def _main_e2e():
    """BENCH_MODE=e2e — BASELINE config 5: the full fused VideoSpeedPipeline
    (letterbox → detector → best-box → mask decode → 380² crop → classifier on
    device; polygon/min-rect/key-frame/state-machine on host).  Reference
    semantics: /root/reference/dev_tools/auto_speed_calc.py:36-140."""
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    imgsz = int(os.environ.get("BENCH_IMGSZ", "640"))

    from yolo_puncture_tpu.pipeline.runner import VideoSpeedPipeline
    from yolo_puncture_tpu.predict.predictor import YOLO
    from yolo_puncture_tpu.tasks.classify import ClassifierNet

    det = YOLO("yolo10s-seg", nc=1, dtype=jnp.bfloat16)
    cls_net = ClassifierNet("efficientnet_b3", dtype=jnp.bfloat16)
    pipe = VideoSpeedPipeline(det, cls_net, device_batch=batch, imgsz=imgsz)

    # domain-representative frames (textured background + one needle-like bar):
    # pure noise makes the random-weight detector emit speckle masks whose
    # host-side contour/min-rect pass is pathologically expensive — real
    # footage has one compact instance per frame
    rng = np.random.default_rng(0)
    n_frames = batch * iters
    base = rng.integers(60, 120, size=(720, 1280, 3), dtype=np.uint8)
    frames = []
    for i in range(n_frames):
        f = base.copy()
        x = 100 + (i * 3) % 900
        f[200:520, x:x + 40] = 235
        frames.append(f)
    # warmup/compile on one batch
    pipe.process_frames(frames[:batch], fps=30.0)
    t0 = time.perf_counter()
    out = pipe.process_frames(frames, fps=30.0)
    dt = time.perf_counter() - t0
    assert len(out.lens) == n_frames
    fps = n_frames / dt
    print(json.dumps({
        "metric": "E2E frames/sec/chip (VideoSpeedPipeline det+cls+analytics, config 5)",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 3),
    }))


def _main_e2e_device():
    """BENCH_MODE=e2e_device — config 5's DEVICE stage in isolation (VERDICT r2
    item 5): the same fused VideoSpeedPipeline program (letterbox → detector →
    best-box → mask decode → 380² crop → classifier), timed with the frame
    batch PRE-STAGED on device and iterations chained through the conf input,
    so neither the remote tunnel's ~8 MB/s H2D (the e2e row's bottleneck) nor
    per-iteration fetches participate.  One host fetch forces the chain."""
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    imgsz = int(os.environ.get("BENCH_IMGSZ", "640"))

    from yolo_puncture_tpu.pipeline.runner import VideoSpeedPipeline
    from yolo_puncture_tpu.predict.predictor import YOLO
    from yolo_puncture_tpu.tasks.classify import ClassifierNet

    det = YOLO("yolo10s-seg", nc=1, dtype=jnp.bfloat16)
    cls_net = ClassifierNet("efficientnet_b3", dtype=jnp.bfloat16)
    pipe = VideoSpeedPipeline(det, cls_net, device_batch=batch, imgsz=imgsz)
    step = pipe._step_fn((720, 1280))

    rng = np.random.default_rng(0)
    base = rng.integers(60, 120, size=(batch, 720, 1280, 3), dtype=np.uint8)
    for i in range(batch):
        x = 100 + (i * 3) % 900
        base[i, 200:520, x:x + 40] = 235
    frames = jnp.asarray(base)  # staged ONCE, outside the timed region

    def one(chk):
        # conf depends on the previous iteration's outputs → iterations chain
        conf = jnp.float32(0.25) + 0.0 * chk
        out = step(det.variables, cls_net.variables, frames, conf)
        return (
            chk
            + out["box"].astype(jnp.float32).sum()
            + out["conf"].astype(jnp.float32).sum()
            + out["cls_prob"].sum()
            + out["mask_lb"][:, ::37, ::37].astype(jnp.int32).sum()
        )

    chk = one(jnp.float32(0))
    np.asarray(chk)  # warmup/compile, forced
    t0 = time.perf_counter()
    chk = jnp.float32(0)
    for _ in range(iters):
        chk = one(chk)
    np.asarray(chk)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(json.dumps({
        "metric": "config-5 device-stage frames/sec/chip "
                  "(VideoSpeedPipeline det+cls, frames pre-staged)",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 3),
    }))


def main():
    _probe_device(float(os.environ.get("BENCH_PROBE_TIMEOUT", "180")))
    _global_watchdog(float(os.environ.get("BENCH_WATCHDOG_SECS", "2700")))
    mode = os.environ.get("BENCH_MODE", "stream")
    if mode == "e2e":
        return _main_e2e()
    if mode == "e2e_device":
        return _main_e2e_device()
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    imgsz = int(os.environ.get("BENCH_IMGSZ", "640"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    track = os.environ.get("BENCH_TRACK", "1") != "0"

    from yolo_puncture_tpu.models.yolo import YOLOModel
    from yolo_puncture_tpu.ops.letterbox import letterbox
    from yolo_puncture_tpu.ops.nms import select_detections
    from yolo_puncture_tpu.ops.masks import decode_masks

    model = YOLOModel(version="v10", scale="s", nc=1, task="segment", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    )

    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    mem = track_fn = core = None
    if track:
        try:
            if fused:
                from yolo_puncture_tpu.track import reference_tracker_geometry
                from yolo_puncture_tpu.track.core import TrackerCore

                # Defaults = the PUBLISHED quality configuration (VERDICT r2
                # item 1): self-contained tracker encoder (the 0.82-IoU
                # default, docs/tracker_quality.md) with per-frame-EXACT
                # windowed propagation (BENCH_EXACT=1: sensory GRU threaded
                # through every frame; ring readout batched per write window —
                # numerically equal to the per-frame step() scan, see
                # tests/test_track.py::test_exact_windowed_matches_per_frame).
                # BENCH_SHARED=1 opts into the throughput-first shared-pyramid
                # adapter (0.245 IoU holdout — experiment, not the headline).
                shared = os.environ.get("BENCH_SHARED", "0") != "0"
                int8_mem = os.environ.get("BENCH_INT8", "0") != "0"
                # BENCH_FLASH=1: Pallas flash memory-readout trial (VERDICT r1
                # item 3) — mutually exclusive with quantized memory
                flash = os.environ.get("BENCH_FLASH", "0") != "0"
                # BENCH_LT=1: long-term prototype tier engaged (the reference
                # formula only enables it for videos ≳390 frames;
                # yolo_with_deva.py:242-245)
                long_term = os.environ.get("BENCH_LT", "0") != "0"
                # reference DEVA geometry: min-side 480 at the 720p source
                # aspect, /16-padded → (480, 864).  A 480² square would do
                # ~2× less readout work than the reference stage.
                # max_objects=2 matches the quality protocol exactly
                # (tools/eval_tracker_quality.py measures the holdout IoU at
                # 2 slots) and the puncture domain (the reference pipeline
                # tracks the single best-conf needle, app.py:97; DEVA at
                # conf=0.9 + small-object suppression yields 1-2 instances).
                # BENCH_MAXOBJ=4/8 measures the higher-capacity configs.
                core = TrackerCore(
                    image_size=reference_tracker_geometry((720, 1280)),
                    max_objects=int(os.environ.get("BENCH_MAXOBJ", "2")),
                    mem_frames=8,
                    mem_every=int(os.environ.get("BENCH_WINDOW", "4")),
                    enable_long_term=long_term, dtype=jnp.bfloat16,
                    subpix_tail=os.environ.get("BENCH_SUBPIX", "1") != "0",
                    # BENCH_PALLAS_TAIL=1: fused Pallas decode-tail kernel
                    # (VERDICT r4 item 5 — the ~5% MXU profiled worst stage)
                    pallas_tail=os.environ.get("BENCH_PALLAS_TAIL", "0") != "0",
                    pyramid_adapter=shared,
                    quantized_memory=int8_mem, flash_readout=flash,
                    # bf16 affinity (BENCH_AFF16=0 opts out): halves the
                    # (Q, M) softmax intermediate — the profiled bottleneck
                    # (tools/profile_stages.py: propagate = 53% of the batch)
                    affinity_bf16=os.environ.get("BENCH_AFF16", "1") != "0",
                )
                mem = core.memory._replace(active=core.memory.active.at[0].set(True))
            else:
                from yolo_puncture_tpu.track import build_bench_tracker

                mem, track_fn = build_bench_tracker(imgsz=imgsz, dtype=jnp.bfloat16)
        except Exception as e:  # tracker unavailable → detector-only bench
            print(f"# tracker disabled: {e}", file=sys.stderr)
            track_fn = core = None

    # Pallas proto-decode trial (VERDICT r1 item 3): BENCH_PALLAS_PROTO=1 decodes
    # all max_det candidate masks at PROTO resolution with the fused Pallas
    # kernel; BENCH_PROTO_RES=1 is the matched-work XLA control (same semantics,
    # decode_masks upsample=False).  Default path stays the retina-res XLA
    # decode of the best instance (the served predict contract).
    pallas_proto = os.environ.get("BENCH_PALLAS_PROTO", "0") != "0"
    proto_res = pallas_proto or os.environ.get("BENCH_PROTO_RES", "0") != "0"
    if pallas_proto:
        from yolo_puncture_tpu.ops.pallas.proto_decode import proto_decode_pallas

        _pallas_interp = jax.default_backend() == "cpu"

    def bench_decode(out, det):
        if proto_res:
            if pallas_proto:
                stride = imgsz // out["proto"].shape[1]
                return jax.vmap(
                    lambda p, c, b: proto_decode_pallas(
                        p, c, b, threshold=0.5, interpret=_pallas_interp
                    )
                )(out["proto"], det["coeffs"],
                  det["boxes"].astype(jnp.float32) / stride)
            return decode_masks(
                out["proto"], det["coeffs"], det["boxes"],
                (imgsz, imgsz), upsample=False, threshold=0.5,
            )
        return decode_masks(
            out["proto"], det["coeffs"][:, :1], det["boxes"][:, :1],
            (imgsz, imgsz), upsample=True, threshold=0.5,
        )

    int8_det = os.environ.get("BENCH_INT8_DET", "0") != "0"
    from yolo_puncture_tpu.nn.quant import int8_convs

    # BENCH_INT8_STATIC=1: calibrate static activation scales on one batch of
    # bench-statistics frames (PTQ serving config — absmax reductions gone)
    act_scales = None
    if int8_det and os.environ.get("BENCH_INT8_STATIC", "0") != "0":
        from yolo_puncture_tpu.nn.quant import collect_act_scales

        _rng = np.random.default_rng(7)
        _cal = jnp.asarray(_rng.integers(0, 255, size=(4, 720, 1280, 3), dtype=np.uint8))
        _imgs, _, _ = letterbox(_cal, imgsz, dtype=jnp.bfloat16, bgr_to_rgb=True)
        act_scales = collect_act_scales(
            lambda b: model.apply(variables, b), [_imgs], percentile=100.0
        )
        print(f"# static int8: {len(act_scales)} calibrated conv scales", file=sys.stderr)

    @jax.jit
    def det_step(variables, frames_u8, conf, chk):
        imgs, r, pad = letterbox(frames_u8, imgsz, dtype=jnp.bfloat16, bgr_to_rgb=True)
        with int8_convs(int8_det, act_scales=act_scales):
            out = model.apply(variables, imgs)
        det = select_detections(out, nms_free=True, conf_thres=conf, max_det=8)
        masks = bench_decode(out, det)
        boxes = det["boxes"][:, 0]
        scores = det["scores"][:, 0]
        valid = det["valid"][:, 0]
        mask = masks[:, 0].astype(jnp.uint8)
        # fold per-frame outputs into the carried checksum: the next iteration's
        # program (and the final single fetch) depends on THIS batch's results
        chk = (
            chk
            + boxes.astype(jnp.float32).sum()
            + scores.astype(jnp.float32).sum()
            + valid.sum()
            + mask[:, ::37, ::37].astype(jnp.int32).sum()
        )
        return {"boxes": boxes, "scores": scores, "valid": valid, "mask": mask,
                "chk": chk}

    fused_step = None
    if core is not None:
        from yolo_puncture_tpu.ops.letterbox import letterbox_params
        from yolo_puncture_tpu.track.network import PropagationNetwork

        trk_vars = core.variables
        th, tw = core.image_size
        # letterbox content region of the 640² detector square, as fractions
        # of the pyramid extent (720p: rows [140, 500) of 640, full cols)
        _r, (new_w, new_h), (left, top) = letterbox_params(720, 1280, imgsz)
        content_box = (
            (top / imgsz, (top + new_h) / imgsz),
            (left / imgsz, (left + new_w) / imgsz),
        )

        @jax.jit
        def fused_step(variables, mem, frames_u8, conf, chk):
            imgs, r, pad = letterbox(
                frames_u8, imgsz, dtype=jnp.bfloat16, bgr_to_rgb=True
            )
            with int8_convs(int8_det, act_scales=act_scales):
                out = model.apply(variables, imgs)
            det = select_detections(out, nms_free=True, conf_thres=conf, max_det=8)
            masks = bench_decode(out, det)
            if core.pyramid_adapter:
                # shared backbone: the tracker reads the detector's P3/P4/P5
                # pyramid (already computed for THIS batch) through 1×1
                # projections + matmul resizes — no second encoder, no second
                # read of the raw frames (PyramidAdapter docstring).  The
                # content_box restricts sampling to the letterbox CONTENT
                # region so the rectangular tracker grid reads undistorted
                # content, not the pad bands.
                pyr = out["pyramid"]
                keys, skips = core.encode_pyramid(
                    trk_vars, pyr["P3"], pyr["P4"], pyr["P5"],
                    content_box=content_box,
                )
            else:
                # self-contained tracker encoder on a 480² resize of the raw
                # frames (measured faster than resampling the letterboxed
                # tensor; both stages live in ONE program either way)
                B = frames_u8.shape[0]
                timgs = (
                    jax.image.resize(
                        frames_u8.astype(jnp.bfloat16), (B, th, tw, 3), "bilinear"
                    )
                    / 255.0
                )
                keys, skips = core.net.apply(
                    trk_vars, timgs, method=PropagationNetwork.encode_key
                )
            # full_res_ids: logits upsampled to 480×864 before aggregation +
            # argmax — the serving step() output order (the s4-argmax shortcut
            # under-segments thin objects; docs/tracker_quality.md)
            mem, ids = core.propagate_frames(
                trk_vars, mem, keys, skips,
                window=int(os.environ.get("BENCH_WINDOW", "4")),
                exact=os.environ.get("BENCH_EXACT", "1") != "0",
                full_res_ids=True,
            )
            boxes = det["boxes"][:, 0]
            scores = det["scores"][:, 0]
            valid = det["valid"][:, 0]
            mask = masks[:, 0].astype(jnp.uint8)
            chk = (
                chk
                + boxes.astype(jnp.float32).sum()
                + scores.astype(jnp.float32).sum()
                + valid.sum()
                + mask[:, ::37, ::37].astype(jnp.int32).sum()
                + ids[:, ::64, ::64].astype(jnp.int32).sum()
            )
            return {"boxes": boxes, "scores": scores, "valid": valid,
                    "mask": mask, "ids": ids, "chk": chk}, mem

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch, 720, 1280, 3), dtype=np.uint8)
    )
    conf = jnp.float32(0.25)

    # warmup / compile (np.asarray forces real completion; block_until_ready
    # is dispatch-only on the axon remote plugin)
    chk = jnp.float32(0)
    if fused_step is not None:
        out, mem = fused_step(variables, mem, frames, conf, chk)
        np.asarray(out["chk"])
    else:
        out = det_step(variables, frames, conf, chk)
        np.asarray(out["chk"])
        if track_fn is not None:
            mem, ids = track_fn(mem, frames)
            np.asarray(ids[0, 0, :4])

    t0 = time.perf_counter()
    chk = jnp.float32(0)
    if fused_step is not None:
        for _ in range(iters):
            out, mem = fused_step(variables, mem, frames, conf, chk)
            chk = out["chk"]
        np.asarray(chk)  # ONE fetch forces the whole chain (chk + memory)
    else:
        for _ in range(iters):
            out = det_step(variables, frames, conf, chk)
            chk = out["chk"]
            if track_fn is not None:
                mem, ids = track_fn(mem, frames)
        # ONE fetch forces the detector chain (chk) and the tracker chain (ids)
        np.asarray(chk)
        if track_fn is not None:
            np.asarray(ids[0, 0, :4])
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    result = {
        "metric": "frames/sec/chip at 640x640 (YOLOv10-S seg"
        + ("+DEVA" if (track_fn is not None or fused_step is not None) else "")
        + ")",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
