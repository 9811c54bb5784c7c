"""Pallas TPU kernel: memory-attention readout (flash-style online softmax).

The tracker's hot op (SURVEY.md §3.2: query-key affinity softmax over memory
elements + value readout).  For each query-pixel tile this kernel streams the
memory (keys + per-object values) through VMEM, keeping a running max/denominator
(online softmax) and No value accumulators — affinity logits never materialize in
HBM.  Invalid ring slots are masked with -inf.

Numerics: full softmax over memory (the XLA path's top-k sparsification is a
readout-quality knob, not a compile-shape requirement; tests compare against the
XLA full-softmax reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, valid_ref, out_ref, m_ref, l_ref, acc_ref):
    # grid: (Q_tiles, M_tiles); blocks: q (TQ, Ck), k (TM, Ck), v (No, TM, Cv),
    # valid (1, TM) fp {0,1}; out (No, TQ, Cv); scratch: m (TQ, 1), l (TQ, 1),
    # acc (No, TQ, Cv)
    mi = pl.program_id(1)
    n_m = pl.num_programs(1)

    @pl.when(mi == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ck = q_ref.shape[-1]
    scale = ck ** -0.5
    logits = (
        jnp.dot(q_ref[:], k_ref[:].T, preferred_element_type=jnp.float32) * scale
    )  # (TQ, TM)
    logits = jnp.where(valid_ref[0, :][None, :] > 0, logits, -jnp.inf)

    m_prev = m_ref[:]                                   # (TQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(logits, -1, keepdims=True))
    # guard fully-masked rows: exp(-inf - -inf) — replace -inf rows with 0 shift
    shift = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p = jnp.exp(logits - shift)                         # (TQ, TM), 0 where -inf
    correction = jnp.exp(jnp.where(jnp.isfinite(m_prev), m_prev - shift, -jnp.inf))
    correction = jnp.where(jnp.isfinite(m_prev), correction, 0.0)

    l_ref[:] = l_ref[:] * correction + jnp.sum(p, -1, keepdims=True)
    m_ref[:] = m_new

    No = v_ref.shape[0]
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),     # (TQ, TM) × (No, TM, Cv)
        preferred_element_type=jnp.float32,
    )  # → (TQ, No, Cv)
    acc_ref[:] = acc_ref[:] * correction[None, :, :] + jnp.transpose(pv, (1, 0, 2))

    @pl.when(mi == n_m - 1)
    def _finish():
        denom = jnp.maximum(l_ref[:], 1e-9)
        out_ref[:] = (acc_ref[:] / denom[None, :, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def memory_readout_pallas(query_key, mem_keys, mem_values, mem_valid, interpret: bool = False):
    """query_key (Q, Ck); mem_keys (M, Ck); mem_values (No, M, Cv);
    mem_valid (M,) bool → readout (No, Q, Cv).

    Tiling: every Q-tile streams the ENTIRE value bank once, so total HBM
    traffic is ≈ ceil(Q/TQ)·(No·M·Cv) — TQ is chosen as LARGE as the VMEM
    accumulator (No·TQ·Cv·4 B) allows, not a fixed 128: at the tracker's shapes
    (Q≈3600, M≈7200, No=4, Cv=128) that is 2 value sweeps (~30 MB) instead of
    the dense path's (Q, M) fp32 affinity materialization (~100 MB × 2 passes).
    Inputs stream in their stored dtype (bf16 in the bench pipeline); logits,
    softmax statistics, and accumulators are fp32 in VMEM.  Q and M are padded
    internally (padded memory is masked invalid; padded queries are sliced off).
    """
    Q, Ck = query_key.shape
    M = mem_keys.shape[0]
    No, _, Cv = mem_values.shape
    # accumulator budget ~1.5 MB of the ~16 MB VMEM: acc f32 + double-buffered
    # out blocks + q + 2×v-blocks must fit ALONGSIDE the full kernel output,
    # which XLA likes to place in VMEM (S(1)) for the consumer.  TQ divides Q
    # into even sweeps so padding waste stays minimal; each sweep re-streams the
    # value bank once (traffic = n_sweeps · No·M·Cv · 2 B — still ≪ the dense
    # path's (Q, M) fp32 affinity materialization).
    TQ_max = max(128, min(8 * (3 * 2 ** 19 // (No * Cv * 4) // 8), 2048))
    if Q <= TQ_max:
        TQ = -(-Q // 16) * 16
    else:
        n_sweeps = -(-Q // TQ_max)
        TQ = -(-(-(-Q // n_sweeps)) // 16) * 16
    # large memory tiles: fewer grid steps (each step has fixed Mosaic overhead
    # that dwarfs the actual matmul at these shapes)
    TM = 1024 if M >= 1024 else 256
    Qp = -(-Q // TQ) * TQ
    Mp = -(-M // TM) * TM
    if Qp != Q:
        query_key = jnp.pad(query_key, ((0, Qp - Q), (0, 0)))
    if Mp != M:
        mem_keys = jnp.pad(mem_keys, ((0, Mp - M), (0, 0)))
        mem_values = jnp.pad(mem_values, ((0, 0), (0, Mp - M), (0, 0)))
        mem_valid = jnp.pad(mem_valid, (0, Mp - M))
    Qf, Mf = Qp, Mp

    out = pl.pallas_call(
        _kernel,
        grid=(Qf // TQ, Mf // TM),
        in_specs=[
            pl.BlockSpec((TQ, Ck), lambda qi, mi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, Ck), lambda qi, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((No, TM, Cv), lambda qi, mi: (0, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda qi, mi: (0, mi), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (No, TQ, Cv), lambda qi, mi: (0, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((No, Qf, Cv), mem_values.dtype),
        scratch_shapes=[
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((No, TQ, Cv), jnp.float32),
        ],
        interpret=interpret,
    )(
        query_key,
        mem_keys,
        mem_values,
        mem_valid.astype(jnp.float32).reshape(1, Mf),
    )
    return out[:, :Q] if Qf != Q else out
