"""Fixed-shape hierarchical memory state for temporal propagation.

The DEVA/XMem sensory/mid/long-term hierarchy (SURVEY.md §5.7) maps to:
  * sensory   — per-object GRU hidden at stride 16 (updated every frame)
  * working   — ring buffer of T_mem (key, value) frames in HBM; ``valid`` marks
                filled slots; overwrite order == FIFO (mid-term analog)
  * long-term — prototype consolidation (planned; ring capacity covers the
                19-video reference workload: videos fit single-chip HBM)

Everything is a pytree of fixed-shape arrays → the whole step stays one XLA
program (lax-friendly, no recompiles as memory "grows").
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from yolo_puncture_tpu.track.network import KEY_DIM, SENSORY_DIM, VALUE_DIM


class MemoryState(NamedTuple):
    keys: jax.Array       # (T, HW, Ck)
    values: jax.Array     # (No, T, HW, Cv)
    valid: jax.Array      # (T,) bool — slot filled
    write_pos: jax.Array  # () int32 — next ring slot
    sensory: jax.Array    # (No, H16, W16, Cs)
    active: jax.Array     # (No,) bool — object slot in use
    frame_idx: jax.Array  # () int32


def init_memory(
    h16: int, w16: int, max_objects: int, mem_frames: int, dtype=jnp.float32
) -> MemoryState:
    hw = h16 * w16
    return MemoryState(
        keys=jnp.zeros((mem_frames, hw, KEY_DIM), dtype),
        values=jnp.zeros((max_objects, mem_frames, hw, VALUE_DIM), dtype),
        valid=jnp.zeros((mem_frames,), bool),
        write_pos=jnp.zeros((), jnp.int32),
        sensory=jnp.zeros((max_objects, h16, w16, SENSORY_DIM), dtype),
        active=jnp.zeros((max_objects,), bool),
        frame_idx=jnp.zeros((), jnp.int32),
    )


def write_memory(
    state: MemoryState, key_flat: jax.Array, value_flat: jax.Array, do_write
) -> MemoryState:
    """Conditionally write (key, value) into the ring slot at write_pos."""
    pos = state.write_pos
    keys = jnp.where(
        do_write, state.keys.at[pos].set(key_flat), state.keys
    )
    values = jnp.where(
        do_write, state.values.at[:, pos].set(value_flat), state.values
    )
    valid = jnp.where(do_write, state.valid.at[pos].set(True), state.valid)
    write_pos = jnp.where(
        do_write, (pos + 1) % state.keys.shape[0], pos
    ).astype(jnp.int32)
    return state._replace(keys=keys, values=values, valid=valid, write_pos=write_pos)


def engaged(state: MemoryState) -> jax.Array:
    return jnp.any(state.valid)
