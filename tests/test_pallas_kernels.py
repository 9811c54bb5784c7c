"""Pallas kernels vs XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_puncture_tpu.ops.pallas.mem_attention import memory_readout_pallas
from yolo_puncture_tpu.ops.pallas.proto_decode import proto_decode_pallas
from yolo_puncture_tpu.track.network import memory_readout

rng = np.random.default_rng(0)


def test_proto_decode_matches_xla():
    Hp, Wp, nm, N = 32, 32, 32, 8
    protos = jnp.asarray(rng.normal(size=(Hp, Wp, nm)), jnp.float32)
    coeffs = jnp.asarray(rng.normal(size=(N, nm)), jnp.float32)
    boxes = jnp.asarray(
        np.stack([rng.uniform(0, 10, N), rng.uniform(0, 10, N),
                  rng.uniform(20, 32, N), rng.uniform(20, 32, N)], -1),
        jnp.float32,
    )
    got = proto_decode_pallas(protos, coeffs, boxes, threshold=0.5, interpret=True)

    # reference: einsum + sigmoid + crop + threshold
    logits = jnp.einsum("nm,hwm->nhw", coeffs, protos)
    masks = jax.nn.sigmoid(logits)
    ys = jnp.arange(Hp, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(Wp, dtype=jnp.float32)[None, None, :]
    inside = (
        (xs >= boxes[:, 0, None, None]) & (xs < boxes[:, 2, None, None])
        & (ys >= boxes[:, 1, None, None]) & (ys < boxes[:, 3, None, None])
    )
    ref = ((masks * inside) > 0.5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_proto_decode_soft_output():
    Hp, Wp, nm, N = 16, 32, 32, 4
    protos = jnp.asarray(rng.normal(size=(Hp, Wp, nm)), jnp.float32)
    coeffs = jnp.asarray(rng.normal(size=(N, nm)), jnp.float32)
    boxes = jnp.tile(jnp.array([0.0, 0, 32, 16]), (N, 1))
    got = proto_decode_pallas(protos, coeffs, boxes, threshold=None, interpret=True)
    ref = jax.nn.sigmoid(jnp.einsum("nm,hwm->nhw", coeffs, protos))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_memory_readout_pallas_matches_full_softmax():
    Q, M, Ck, Cv, No = 256, 1024, 64, 128, 4
    q = jnp.asarray(rng.normal(size=(Q, Ck)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(M, Ck)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(No, M, Cv)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=M) > 0.3)

    got = memory_readout_pallas(q, k, v, valid, interpret=True)
    ref = memory_readout(q, k, v, valid, top_k=M)  # full softmax
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_memory_readout_pallas_all_invalid():
    Q, M, Ck, Cv, No = 256, 512, 64, 128, 2
    q = jnp.asarray(rng.normal(size=(Q, Ck)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(M, Ck)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(No, M, Cv)), jnp.float32)
    valid = jnp.zeros((M,), bool)
    got = np.asarray(memory_readout_pallas(q, k, v, valid, interpret=True))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_memory_readout_pallas_padded_shapes():
    """Q not a tile multiple and M not a 256-multiple exercise internal padding."""
    import jax.numpy as jnp
    from yolo_puncture_tpu.ops.pallas.mem_attention import memory_readout_pallas
    from yolo_puncture_tpu.track.network import memory_readout_dense

    rng = np.random.default_rng(5)
    Q, M, Ck, No, Cv = 52, 300, 64, 3, 32
    q = jnp.asarray(rng.standard_normal((Q, Ck)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((M, Ck)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((No, M, Cv)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=M) > 0.3)
    got = np.asarray(memory_readout_pallas(q, k, v, valid, interpret=True))
    want = np.asarray(memory_readout_dense(q, k, v, valid))
    assert got.shape == (No, Q, Cv)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decode_tail_pallas_matches_exact():
    """Fused Pallas decode tail (interpret mode on CPU) reproduces the exact
    MaskDecoder.decode_tail within fp tolerance (same reassociated algebra as
    decode_tail_subpix — tests/test_track.py::test_subpix_tail_matches_exact)."""
    import jax
    import jax.numpy as jnp

    from yolo_puncture_tpu.ops.pallas.decode_tail import decode_tail_pallas
    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_puncture_tpu.track.network import PropagationNetwork

    core = TrackerCore(image_size=(32, 64), max_objects=2, mem_frames=4)
    V = core.variables
    rng = np.random.default_rng(5)
    N, No, C = 2, core.max_objects, 128
    hidden = jnp.asarray(
        rng.standard_normal((N, No, core.h16, core.w16, C)), jnp.float32
    )
    f8p = jnp.asarray(
        rng.standard_normal((N, 2 * core.h16, 2 * core.w16, 64)), jnp.float32
    )
    f4p = jnp.asarray(
        rng.standard_normal((N, 4 * core.h16, 4 * core.w16, 64)), jnp.float32
    )

    def tail(h, f8, f4):
        return core.net.apply(V, h, f8, f4, method=PropagationNetwork.decode_tail)

    exact = np.asarray(jax.vmap(tail)(hidden, f8p, f4p))
    got = np.asarray(
        decode_tail_pallas(V, hidden, f8p, f4p, dtype=jnp.float32, interpret=True)
    )
    assert got.shape == exact.shape
    np.testing.assert_allclose(got, exact, rtol=2e-4, atol=2e-4)


def test_core_pallas_tail_flag_dispatch():
    """TrackerCore(pallas_tail=True)._decode_tail_batch routes through the
    fused kernel (interpret on CPU) and matches the exact tail."""
    import jax
    import jax.numpy as jnp

    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_puncture_tpu.track.network import PropagationNetwork

    core = TrackerCore(image_size=(32, 64), max_objects=2, mem_frames=4,
                       pallas_tail=True)
    assert core.pallas_tail
    V = core.variables
    rng = np.random.default_rng(9)
    N, No, C = 1, core.max_objects, 128
    hidden = jnp.asarray(
        rng.standard_normal((N, No, core.h16, core.w16, C)), jnp.float32)
    f8p = jnp.asarray(
        rng.standard_normal((N, 2 * core.h16, 2 * core.w16, 64)), jnp.float32)
    f4p = jnp.asarray(
        rng.standard_normal((N, 4 * core.h16, 4 * core.w16, 64)), jnp.float32)

    def tail(h, f8, f4):
        return core.net.apply(V, h, f8, f4, method=PropagationNetwork.decode_tail)

    exact = np.asarray(jax.vmap(tail)(hidden, f8p, f4p))
    got = np.asarray(core._decode_tail_batch(V, hidden, f8p, f4p))
    np.testing.assert_allclose(got, exact, rtol=2e-4, atol=2e-4)
