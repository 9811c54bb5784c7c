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


def build_bench_tracker(imgsz: int = 640, dtype=None, min_side: int = 480, jit: bool = True):
    """Benchmark helper: jitted sequential propagation over a frame batch.

    Returns fn(frames_u8 (B, H, W, 3)) → per-frame prob argmax (B, h, w) int32,
    scanning the tracker step over the batch (DEVA propagation is sequential —
    the scan keeps the ring-buffer memory as carry, all on device).

    Geometry matches the reference DEVA stage: the tracker input is resized to
    min-side ``size=480`` (yolo_with_deva.py get_input_frame_for_deva contract),
    independent of the detector's 640² letterbox.
    """
    import jax
    import jax.numpy as jnp

    # benchmark geometry: 4 object slots (puncture videos track 1-2 needles),
    # 8-frame working memory (DEVA max_mid_term_frames default is 10)
    # long-term memory stays off: the reference enables it only when
    # vid_length/(max_mid−min_mid)·num_prototypes ≥ max_long_term_elements
    # (yolo_with_deva.py:242-245) — false for streaming 32-frame windows.
    core = TrackerCore(
        image_size=(min_side, min_side), max_objects=4, mem_frames=8,
        enable_long_term=False, dtype=dtype or jnp.float32,
    )
    # seed one active object so readout/decode do real work
    import numpy as np

    mem = core.memory._replace(active=core.memory.active.at[0].set(True))
    variables = core.variables
    h, w = core.image_size

    from yolo_puncture_tpu.track.network import PropagationNetwork

    def run(frames_u8):
        B = frames_u8.shape[0]
        imgs = (
            jax.image.resize(
                frames_u8.astype(jnp.bfloat16), (B, h, w, 3), "bilinear"
            )
            / 255.0
        )
        # frame-INDEPENDENT work batched over all frames in one pass: the key
        # encoder is ~40% of the per-frame step; at B=32 it amortizes per-op
        # overhead and fills the MXU.  Only the memory-dependent readout →
        # decode → sensory → ring-write stays sequential (lax.scan).
        keys, skips = core.net.apply(
            variables, imgs, method=PropagationNetwork.encode_key
        )

        def body(memory, inp):
            key, f4, f8, f16 = inp
            skips0 = {"f4": f4, "f8": f8, "f16": f16}
            readout, memory = core._read(key, memory)
            prob, sensory = core._decode_and_update(variables, memory, skips0, readout)
            memory = memory._replace(sensory=sensory)
            do_write = (memory.frame_idx % core.mem_every == 0) & jnp.any(memory.active)
            memory = core._write(variables, memory, key, skips0, prob, do_write)
            memory = memory._replace(frame_idx=memory.frame_idx + 1)
            return memory, jnp.argmax(prob, axis=0).astype(jnp.int32)

        _, ids = jax.lax.scan(
            body, mem, (keys, skips["f4"], skips["f8"], skips["f16"])
        )
        return ids

    return jax.jit(run) if jit else run
