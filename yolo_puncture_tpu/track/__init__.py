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


def build_bench_tracker(imgsz: int = 640, dtype=None):
    """Benchmark helper: jitted sequential propagation over a frame batch.

    Returns fn(frames_u8 (B, H, W, 3)) → per-frame prob argmax (B, h, w) int32,
    scanning the tracker step over the batch (DEVA propagation is sequential —
    the scan keeps the ring-buffer memory as carry, all on device).
    """
    import jax
    import jax.numpy as jnp

    # benchmark geometry: 4 object slots (puncture videos track 1-2 needles),
    # 8-frame working memory (DEVA max_mid_term_frames default is 10)
    core = TrackerCore(
        image_size=(imgsz, imgsz), max_objects=4, mem_frames=8,
        dtype=dtype or jnp.float32,
    )
    # seed one active object so readout/decode do real work
    import numpy as np

    mem = core.memory._replace(active=core.memory.active.at[0].set(True))
    variables = core.variables
    h, w = core.image_size

    @jax.jit
    def run(frames_u8):
        imgs = (
            jax.image.resize(
                frames_u8.astype(jnp.float32), (frames_u8.shape[0], h, w, 3), "bilinear"
            )
            / 255.0
        )

        def body(memory, img):
            prob, memory = core._step_impl(variables, memory, img)
            return memory, jnp.argmax(prob, axis=0).astype(jnp.int32)

        _, ids = jax.lax.scan(body, mem, imgs)
        return ids

    return run
