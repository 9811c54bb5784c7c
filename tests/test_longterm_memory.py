"""Long-term prototype consolidation (SURVEY §5.7 memory-compaction contract)."""

import jax.numpy as jnp
import numpy as np

from yolo_puncture_tpu.track.memory import consolidate, init_memory, write_memory
from yolo_puncture_tpu.track.network import VALUE_DIM


def _filled_memory(T=4, hw_side=4, No=2, P=8):
    mem = init_memory(hw_side, hw_side, No, T, jnp.float32, num_prototypes=P)
    hw = hw_side * hw_side
    for t in range(T):
        key = jnp.full((hw, 64), float(t + 1))
        val = jnp.full((No, hw, VALUE_DIM), float(t + 1))
        mem = write_memory(mem, key, val, jnp.asarray(True))
    return mem


def test_consolidate_moves_top_usage_elements():
    mem = _filled_memory()
    hw = 16
    # oldest slot is write_pos (ring full → 0); give elements 3 and 7 high usage
    usage = mem.usage.at[0, 3].set(10.0).at[0, 7].set(5.0)
    mem = mem._replace(usage=usage)
    out = consolidate(mem, n_move=2, do_it=jnp.asarray(True))
    assert bool(out.lt_valid[0]) and bool(out.lt_valid[1])
    assert not bool(out.lt_valid[2])
    # prototypes carry the oldest slot's key payload (all 1.0)
    np.testing.assert_allclose(np.asarray(out.lt_keys[0]), 1.0)
    # the consolidated working slot is freed and its usage reset
    assert not bool(out.valid[0])
    assert float(out.usage[0].sum()) == 0.0
    assert int(out.lt_pos) == 2


def test_consolidate_noop_when_disabled():
    mem = _filled_memory()
    out = consolidate(mem, n_move=2, do_it=jnp.asarray(False))
    assert not bool(out.lt_valid.any())
    assert bool(out.valid.all())


def test_consolidate_fifo_wraparound():
    mem = _filled_memory(P=4)
    mem = mem._replace(lt_pos=jnp.int32(3))
    out = consolidate(mem, n_move=2, do_it=jnp.asarray(True))
    # slots 3 and 0 written (wrap)
    assert bool(out.lt_valid[3]) and bool(out.lt_valid[0])
    assert int(out.lt_pos) == 1


def test_step_accumulates_usage_and_reads_longterm():
    from yolo_puncture_tpu.track import TrackerCore, ObjectInfo

    t = TrackerCore(
        image_size=(64, 64), max_objects=2, mem_frames=2, mem_every=1,
        num_prototypes=4, max_long_term_elements=16, enable_long_term=True,
    )
    rng = np.random.default_rng(0)
    mask = np.zeros((64, 64), np.int32)
    mask[20:40, 20:40] = 1
    t.incorporate_detection(rng.integers(0, 255, (64, 64, 3), np.uint8), mask,
                            [ObjectInfo(id=1)])
    for i in range(4):  # mem_every=1, ring of 2 → consolidation must fire
        t.step(rng.integers(0, 255, (64, 64, 3), np.uint8))
    assert bool(np.asarray(t.memory.lt_valid).any()), "long-term bank never filled"
    # readout with engaged memory must have ACCUMULATED attention usage — the
    # signal the top-usage consolidation ranking depends on (>= 0 was vacuous)
    assert float(np.asarray(t.memory.usage).sum()) > 0
