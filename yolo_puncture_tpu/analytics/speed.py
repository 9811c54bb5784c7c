"""Insertion-speed state machine.

Exact behavioral port of the per-frame analytics loop shared by the Gradio app and
the batch CLI (yolo_seg/app.py:129-176, dev_tools/auto_speed_calc.py:96-122):

  per frame: cls (repaired 0/1), smoothed length, detection-present flag →
  * cls==0, not inserted, detected → push length into a CONFIRMATION_FRAMES(5)-deep
    rolling calibration window
  * cls==1 with empty window → seed window with current length
  * actual_len = 20 mm if cls==0 else 20·len/mean(window)
  * at idx == insert_start_frame → inserted = True
  * cls==1 ∧ inserted ∧ actual_len ≤ 18 mm → end frame; speed = 2 mm / (Δframes/fps)

Two implementations: ``insertion_state_machine`` (host, reference-exact, including
the empty-window ``continue``) and ``insertion_state_machine_jax`` (a
``lax.scan`` with a fixed-shape rolling buffer for the fused on-device pipeline —
SURVEY.md §7.4).  Equivalence is pinned by tests/test_analytics.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

INIT_SHAFT_LEN = 20.0
MOVE_THRESHOLD = 2.0
CONFIRMATION_FRAMES = 5


@dataclass
class SpeedResult:
    start_frame: Optional[int]
    end_frame: Optional[int]
    speed_mm_s: Optional[float]
    actual_lens: np.ndarray  # per-frame calibrated shaft length (mm), NaN if skipped


def insertion_state_machine(
    classes: Sequence[int],
    smooth_lens: Sequence[float],
    detected: Sequence[bool],
    insert_start_frame: int,
    fps: float,
    init_shaft_len: float = INIT_SHAFT_LEN,
    move_threshold: float = MOVE_THRESHOLD,
    confirmation_frames: int = CONFIRMATION_FRAMES,
) -> SpeedResult:
    pixel_len_arr: list = []
    inserted = False
    end_frame = None
    speed = None
    n = len(classes)
    actual_lens = np.full(n, np.nan)

    for idx in range(n):
        cls = classes[idx]
        rect_len = smooth_lens[idx]
        if cls == 0 and not inserted and detected[idx]:
            pixel_len_arr.append(rect_len)
            if len(pixel_len_arr) > confirmation_frames:
                pixel_len_arr.pop(0)
        if cls == 1 and len(pixel_len_arr) == 0:
            pixel_len_arr.append(rect_len)
        if len(pixel_len_arr) == 0:
            continue  # auto_speed_calc.py:110-111 guard
        mean_len = sum(pixel_len_arr) / len(pixel_len_arr)
        # zero-length calibration (all-dropout video) → reference raises
        # ZeroDivisionError; treat as uncalibratable instead
        actual_len = (
            init_shaft_len
            if (cls == 0 or mean_len <= 0)
            else init_shaft_len * rect_len / mean_len
        )
        actual_lens[idx] = actual_len

        if idx == insert_start_frame:
            inserted = True

        if cls == 1 and inserted and actual_len <= init_shaft_len - move_threshold:
            # keep looping after the trigger like the reference (its renderer uses
            # the ongoing actual_len); re-trigger is impossible: inserted resets and
            # idx == insert_start_frame never recurs.
            inserted = False
            end_frame = idx
            interval_time = max(1, end_frame - insert_start_frame) / fps
            speed = move_threshold / interval_time

    return SpeedResult(
        start_frame=insert_start_frame,
        end_frame=end_frame,
        speed_mm_s=speed,
        actual_lens=actual_lens,
    )


def insertion_state_machine_jax(
    classes,
    smooth_lens,
    detected,
    insert_start_frame,
    fps: float,
    init_shaft_len: float = INIT_SHAFT_LEN,
    move_threshold: float = MOVE_THRESHOLD,
    confirmation_frames: int = CONFIRMATION_FRAMES,
):
    """lax.scan version: fixed (confirmation_frames,) ring buffer, no host sync.

    Returns (start_frame, end_frame, speed, actual_lens); end_frame = -1 and
    speed = 0.0 when insertion to 2 mm depth is never observed.
    """
    import jax
    import jax.numpy as jnp

    K = confirmation_frames
    classes = jnp.asarray(classes, jnp.int32)
    lens = jnp.asarray(smooth_lens, jnp.float32)
    detected = jnp.asarray(detected, bool)
    start = jnp.asarray(insert_start_frame, jnp.int32)

    def step(carry, inp):
        buf, count, pos, inserted, end_frame, speed = carry
        idx, cls, rect_len, det = inp

        push0 = (cls == 0) & (~inserted) & det
        push1 = (cls == 1) & (count == 0)
        push = push0 | push1
        # ring-buffer write at pos; count saturates at K.  Overwriting the slot at
        # ``pos`` once full == the reference's pop(0)/append FIFO.
        buf = jnp.where(push, buf.at[pos].set(rect_len), buf)
        pos = jnp.where(push, (pos + 1) % K, pos)
        count = jnp.where(push, jnp.minimum(count + 1, K), count)

        have = count > 0
        mean = jnp.where(
            have, jnp.sum(buf * (jnp.arange(K) < count)) / jnp.maximum(count, 1), 1.0
        )
        actual_len = jnp.where(
            (cls == 0) | (mean <= 0),
            init_shaft_len,
            init_shaft_len * rect_len / jnp.where(mean <= 0, 1.0, mean),
        )
        actual_out = jnp.where(have, actual_len, jnp.nan)

        inserted = jnp.where((idx == start) & have, True, inserted)
        first = end_frame < 0
        trigger = (
            (cls == 1) & inserted & (actual_len <= init_shaft_len - move_threshold)
            & have & first
        )
        end_frame = jnp.where(trigger, idx, end_frame)
        interval = jnp.maximum(1, idx - start).astype(jnp.float32) / fps
        speed = jnp.where(trigger, move_threshold / interval, speed)
        inserted = jnp.where(trigger, False, inserted)
        return (buf, count, pos, inserted, end_frame, speed), actual_out

    n = classes.shape[0]
    init = (
        jnp.zeros(K, jnp.float32),
        jnp.int32(0),
        jnp.int32(0),
        jnp.asarray(False),
        jnp.int32(-1),
        jnp.float32(0.0),
    )
    inputs = (jnp.arange(n, dtype=jnp.int32), classes, lens, detected)
    (buf, count, pos, inserted, end_frame, speed), actual_lens = jax.lax.scan(
        step, init, inputs
    )
    return start, end_frame, speed, actual_lens
