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
    keys: jax.Array       # (T, HW, Ck)   — working (mid-term) ring (fp or int8)
    values: jax.Array     # (No, T, HW, Cv)                         (fp or int8)
    valid: jax.Array      # (T,) bool — slot filled
    write_pos: jax.Array  # () int32 — next ring slot
    usage: jax.Array      # (T, HW) fp32 — accumulated attention mass per element
    lt_keys: jax.Array    # (P, Ck)       — long-term prototype bank
    lt_values: jax.Array  # (No, P, Cv)
    lt_valid: jax.Array   # (P,) bool
    lt_pos: jax.Array     # () int32 — next long-term write position
    sensory: jax.Array    # (No, H16, W16, Cs)
    active: jax.Array     # (No,) bool — object slot in use
    frame_idx: jax.Array  # () int32
    k_scale: jax.Array    # (T,) fp32 — per-slot int8 key scales (0 when fp)
    v_scale: jax.Array    # (No, T) fp32 — per-object-slot int8 value scales


def init_memory(
    h16: int,
    w16: int,
    max_objects: int,
    mem_frames: int,
    dtype=jnp.float32,
    num_prototypes: int = 128,
    value_dim: int = VALUE_DIM,
    quantized: bool = False,
) -> MemoryState:
    """``quantized=True`` stores the working ring as int8 with per-slot scales
    (half the HBM of bf16, s8 MXU matmuls in the readout); the long-term bank
    stays in ``dtype`` (TrackerCore forbids long-term + quantized)."""
    hw = h16 * w16
    ring_dtype = jnp.int8 if quantized else dtype
    return MemoryState(
        keys=jnp.zeros((mem_frames, hw, KEY_DIM), ring_dtype),
        values=jnp.zeros((max_objects, mem_frames, hw, value_dim), ring_dtype),
        valid=jnp.zeros((mem_frames,), bool),
        write_pos=jnp.zeros((), jnp.int32),
        usage=jnp.zeros((mem_frames, hw), jnp.float32),
        lt_keys=jnp.zeros((num_prototypes, KEY_DIM), dtype),
        lt_values=jnp.zeros((max_objects, num_prototypes, value_dim), dtype),
        lt_valid=jnp.zeros((num_prototypes,), bool),
        lt_pos=jnp.zeros((), jnp.int32),
        sensory=jnp.zeros((max_objects, h16, w16, SENSORY_DIM), dtype),
        active=jnp.zeros((max_objects,), bool),
        frame_idx=jnp.zeros((), jnp.int32),
        k_scale=jnp.zeros((mem_frames,), jnp.float32),
        v_scale=jnp.zeros((max_objects, mem_frames), jnp.float32),
    )


def consolidate(state: MemoryState, n_move: int, do_it) -> MemoryState:
    """Long-term consolidation (DEVA/XMem memory compaction, SURVEY.md §5.7):
    compress the OLDEST working-ring slot into ``n_move`` prototypes chosen by
    accumulated attention usage, append them to the long-term bank (FIFO), and
    free the slot.

    Runs inside the jitted step under ``do_it`` (typically: ring about to wrap).
    top_k here is over one frame's HW elements and fires once per mem_every·T
    frames — negligible amortized cost.
    """

    def run(state: MemoryState) -> MemoryState:
        oldest = state.write_pos  # next overwrite target == oldest slot when full
        usage = state.usage[oldest]                       # (HW,)
        k = n_move
        _, idx = jax.lax.top_k(usage, k)                  # (k,)
        proto_keys = state.keys[oldest][idx]              # (k, Ck)
        proto_vals = state.values[:, oldest][:, idx]      # (No, k, Cv)

        P = state.lt_keys.shape[0]
        pos = state.lt_pos
        # FIFO write of k prototypes with wraparound
        slots = (pos + jnp.arange(k)) % P
        lt_keys = state.lt_keys.at[slots].set(proto_keys)
        lt_values = state.lt_values.at[:, slots].set(proto_vals)
        lt_valid = state.lt_valid.at[slots].set(True)
        return state._replace(
            lt_keys=lt_keys,
            lt_values=lt_values,
            lt_valid=lt_valid,
            lt_pos=(pos + k) % P,
            valid=state.valid.at[oldest].set(False),
            usage=state.usage.at[oldest].set(0.0),
        )

    return jax.lax.cond(do_it, run, lambda s: s, state)


def write_memory(
    state: MemoryState, key_flat: jax.Array, value_flat: jax.Array, do_write
) -> MemoryState:
    """Conditionally write (key, value) into the ring slot at write_pos.

    With an int8 ring (init_memory(quantized=True)) the fp inputs are
    symmetrically quantized here — once per write, amortized over every
    readout that touches the slot — and the per-slot scales stored alongside.
    """
    pos = state.write_pos
    k_scale, v_scale = state.k_scale, state.v_scale
    if state.keys.dtype == jnp.int8:
        kf = key_flat.astype(jnp.float32)
        ks = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-8) / 127.0
        key_flat = jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8)
        vf = value_flat.astype(jnp.float32)               # (No, HW, Cv)
        vs = jnp.maximum(jnp.max(jnp.abs(vf), axis=(1, 2)), 1e-8) / 127.0
        value_flat = jnp.clip(
            jnp.round(vf / vs[:, None, None]), -127, 127
        ).astype(jnp.int8)
        k_scale = jnp.where(do_write, k_scale.at[pos].set(ks), k_scale)
        v_scale = jnp.where(do_write, v_scale.at[:, pos].set(vs), v_scale)
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
    return state._replace(
        keys=keys, values=values, valid=valid, write_pos=write_pos,
        k_scale=k_scale, v_scale=v_scale,
    )


def engaged(state: MemoryState) -> jax.Array:
    return jnp.any(state.valid)
