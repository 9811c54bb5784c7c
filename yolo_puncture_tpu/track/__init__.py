from yolo_puncture_tpu.track.core import (  # noqa: F401
    TrackerCore,
    ObjectInfo,
    FrameInfo,
    ObjectManager,
)
from yolo_puncture_tpu.track.saver import (  # noqa: F401
    ResultSaver,
    flush_buffer,
    get_input_frame_for_deva,
)
from yolo_puncture_tpu.track.memory import MemoryState, init_memory  # noqa: F401


def reference_tracker_geometry(frame_hw, min_side: int = 480):
    """DEVA-equivalent processing geometry for a (h0, w0) source frame: resize
    the MIN side to ``min_side`` keeping aspect (get_input_frame_for_deva,
    yolo_with_deva.py:120), pad each side UP to /16 (DEVA pad_divide_by).
    720p → (480, 864).  Returns (th, tw)."""
    h0, w0 = frame_hw
    r = min_side / min(h0, w0)
    th = -(-round(h0 * r) // 16) * 16
    tw = -(-round(w0 * r) // 16) * 16
    return int(th), int(tw)


def build_bench_tracker(
    imgsz: int = 640,
    dtype=None,
    min_side: int = 480,
    jit: bool = True,
    window: int = 4,
    frame_hw=(720, 1280),
):
    """Benchmark helper: STREAMING propagation over frame batches.

    Returns (initial_memory, fn(memory, frames_u8) → (memory, ids)) so the caller
    carries the ring-buffer memory across batches — true streaming like the
    reference's stateful DEVA loop — and every batch reuses ONE executable.

    TPU structure: the frame-independent key encoder runs batched over all B
    frames in one pass (MXU-efficient).  With ``window=w > 1`` the memory-
    dependent stage uses TrackerCore.propagate_window: all w frames of a write
    window read the same ring memory, so readout/decode batch in parallel and
    the sequential scan shrinks w× (write cadence = w, replacing mem_every —
    w=4 writes DENSER than the reference's mem_every=5 default).  ``window=1``
    falls back to the exact per-frame sequential scan.  Geometry matches the
    reference DEVA stage: min-side ``min_side`` at the SOURCE frame's aspect
    ratio, /16-padded (reference_tracker_geometry; 480×864 for the 720p bench
    input — NOT a 480² square, which would be ~2× less readout work than the
    reference stage).  Long-term memory stays off per the reference's
    enablement formula for short windows (yolo_with_deva.py:242-245).
    """
    import jax
    import jax.numpy as jnp

    core = TrackerCore(
        image_size=reference_tracker_geometry(frame_hw, min_side),
        max_objects=4, mem_frames=8,
        mem_every=window if window > 1 else 5,
        enable_long_term=False, dtype=dtype or jnp.float32,
    )
    # seed one active object so readout/decode do real work
    mem0 = core.memory._replace(active=core.memory.active.at[0].set(True))
    variables = core.variables
    h, w = core.image_size

    from yolo_puncture_tpu.track.network import PropagationNetwork

    def run(memory, frames_u8):
        B = frames_u8.shape[0]
        imgs = (
            jax.image.resize(
                frames_u8.astype(jnp.bfloat16), (B, h, w, 3), "bilinear"
            )
            / 255.0
        )
        keys, skips = core.net.apply(
            variables, imgs, method=PropagationNetwork.encode_key
        )

        if window > 1:
            memory, ids_s4 = core.propagate_frames(variables, memory, keys, skips, window)
        else:
            def body(memory, inp):
                key, f4, f8, f16 = inp
                skips0 = {"f4": f4, "f8": f8, "f16": f16}
                readout, memory = core._read(key, memory)
                # decode at stride 4: full-res upsample happens ONCE, batched, below
                prob_s4, prob_s16, sensory = core._decode_and_update(
                    variables, memory, skips0, readout, full_res=False
                )
                memory = memory._replace(sensory=sensory)
                do_write = (memory.frame_idx % core.mem_every == 0) & jnp.any(
                    memory.active
                )
                memory = core._write(
                    variables, memory, key, f16, prob_s16[1:], do_write
                )
                memory = memory._replace(frame_idx=memory.frame_idx + 1)
                return memory, jnp.argmax(prob_s4, axis=0).astype(jnp.uint8)

            memory, ids_s4 = jax.lax.scan(
                body, memory, (keys, skips["f4"], skips["f8"], skips["f16"])
            )
        # batched nearest ×4 upsample of the id maps outside the scan
        ids = jnp.repeat(jnp.repeat(ids_s4, 4, axis=1), 4, axis=2)
        return memory, ids

    if jit:
        return mem0, jax.jit(run, donate_argnums=(0,))
    return mem0, run
