"""TrackerCore — the DEVAInferenceCore-compatible temporal propagation engine.

API contract (usage sites yolo_with_deva.py:91-208, SURVEY.md §2.2 'DEVA inference
core'): ``step(image, mask, objects)`` propagates one frame through memory
attention; ``incorporate_detection(image, mask, segments_info, incremental=True)``
merges new detections with propagated objects; temporary buffer +
``vote_in_temporary_buffer(keyframe_selection='first')`` for semionline voting;
``next_voting_frame``, ``add_to_temporary_buffer``, ``clear_buffer``,
``enabled_long_id``, ``object_manager``.

Device design: one jitted ``_step`` (encode → memory readout → decode → sensory
update → conditional ring write) and one jitted ``_incorporate`` (same, plus
IoU-greedy identity matching against a one-hot detection mask) — both fixed-shape
(max_objects padding, T_mem ring).  Host keeps only id bookkeeping and the voting
buffer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_puncture_tpu.track.memory import (
    MemoryState,
    consolidate,
    init_memory,
    write_memory,
)
from yolo_puncture_tpu.track.network import (
    PropagationNetwork,
    SENSORY_DIM,
    memory_readout_dense,
    memory_readout_dense_int8,
    soft_aggregate,
)


def match_detections(prop_masks, active, det_onehot, det_valid, overlap_thresh=0.6):
    """Greedy identity matching: detections vs propagated masks (pure, testable).

    prop_masks (No, H, W) {0,1}; active (No,); det_onehot (No, H, W); det_valid (No,).
    A detection merges into an active slot when (in priority order) IoU > 0.5,
    OR the slot's propagated mask is covered by the detection
    (intersection / prop-area > ``overlap_thresh`` — keeps identity through
    propagation-quality dips where the remnant mask is a shrunken/fragmented
    version of the detected object and strict IoU would spawn a duplicate
    slot), OR IoU > 0.25 (weak match: in a sparse scene the overlapping slot
    is still the best explanation of the detection); otherwise it claims the
    first free slot (DEVA incorporate_detection incremental=True semantics).

    Three overlap-suppression guards (VERDICT r4 item 1 — id churn with a real
    detector in the loop; reference operates at conf 0.9 precisely so none of
    these cases arise, yolo_with_deva.py:59):
      * one detection per slot per call — a later (lower-confidence, the
        predictor emits conf-sorted) detection cannot overwrite a slot already
        claimed this call;
      * duplicate-detection suppression — a detection whose mask containment vs
        an earlier USED detection exceeds ``overlap_thresh`` is dropped instead
        of spawning (the from-scratch v10 o2o head emits low-conf duplicates);
      * ghost-kill — an active slot no detection claimed, whose propagated mask
        is covered (intersection / prop-area > ``overlap_thresh``) by a mask
        some detection DID claim, is a duplicate slot of an object now owned
        elsewhere and is deactivated (two-slots-one-object churn would
        otherwise split the object's pixels via soft aggregation indefinitely).

    Returns (merged_masks, active, det_to_slot).
    """
    No = prop_masks.shape[0]
    prop_area = prop_masks.sum((1, 2))
    det_area = det_onehot.sum((1, 2))
    inter = jnp.einsum("nhw,mhw->nm", prop_masks, det_onehot)
    union = prop_area[:, None] + det_area[None, :] - inter
    pair_ok = active[:, None] & det_valid[None, :]
    iou = jnp.where(pair_ok, inter / jnp.maximum(union, 1.0), -1.0)
    # directional coverage: fraction of the PROPAGATED mask covered by the det
    covered_by = jnp.where(
        pair_ok, inter / jnp.maximum(prop_area[:, None], 1.0), -1.0
    )
    dinter = jnp.einsum("nhw,mhw->nm", det_onehot, det_onehot)
    dcontain = dinter / jnp.maximum(
        jnp.minimum(det_area[:, None], det_area[None, :]), 1.0
    )

    def assign_det(j, carry):
        merged, act, det_to_slot, claimed, used = carry
        dup = jnp.any(used & det_valid & (dcontain[:, j] > overlap_thresh))
        col_iou = jnp.where(claimed, -1.0, iou[:, j])
        col_cov = jnp.where(claimed, -1.0, covered_by[:, j])
        best_iou = jnp.argmax(col_iou)
        best_cov = jnp.argmax(col_cov)
        m_iou = col_iou[best_iou] > 0.5
        m_cov = col_cov[best_cov] > overlap_thresh
        m_weak = col_iou[best_iou] > 0.25
        matched = (m_iou | m_cov | m_weak) & det_valid[j] & ~dup
        best = jnp.where(m_iou | (~m_cov & m_weak), best_iou, best_cov)
        free = jnp.argmin(act)  # first inactive slot (False < True)
        has_free = ~act[free]
        new_obj = det_valid[j] & ~matched & ~dup & has_free
        slot = jnp.where(matched, best, free)
        use = matched | new_obj
        merged = jnp.where(use, merged.at[slot].set(det_onehot[j]), merged)
        act = jnp.where(use, act.at[slot].set(True), act)
        claimed = jnp.where(use, claimed.at[slot].set(True), claimed)
        used = used.at[j].set(use)
        det_to_slot = det_to_slot.at[j].set(jnp.where(use, slot, -1))
        return merged, act, det_to_slot, claimed, used

    merged0 = prop_masks * active[:, None, None]
    init = (
        merged0,
        active,
        jnp.full((No,), -1, jnp.int32),
        jnp.zeros((No,), bool),
        jnp.zeros((No,), bool),
    )
    merged, act, det_to_slot, claimed, used = jax.lax.fori_loop(0, No, assign_det, init)
    covered = jnp.max(jnp.where(used[None, :], covered_by, -1.0), axis=1)
    ghost = act & ~claimed & (covered > overlap_thresh)
    act = act & ~ghost
    merged = merged * act[:, None, None].astype(merged.dtype)
    return merged, act, det_to_slot


@dataclasses.dataclass
class ObjectInfo:
    """Reference ObjectInfo surface (yolo_with_deva.py:19,85)."""

    id: int
    score: float = 1.0
    category_id: int = 0


@dataclasses.dataclass
class FrameInfo:
    """Reference FrameInfo surface (yolo_with_deva.py:123-126)."""

    image: np.ndarray
    mask: Optional[np.ndarray]
    segments_info: Optional[List[ObjectInfo]]
    ti: int
    info: dict
    image_np: Optional[np.ndarray] = None

    @property
    def name(self):
        return self.info["frame"][0]


class ObjectManager:
    """slot index ↔ object id mapping (DEVA object_manager analog)."""

    def __init__(self, max_objects: int):
        self.max_objects = max_objects
        self.slot_to_info: Dict[int, ObjectInfo] = {}
        self._next_id = 1

    def allocate(self, slot: int, info: Optional[ObjectInfo] = None) -> ObjectInfo:
        if info is None:
            info = ObjectInfo(id=self._next_id)
        self._next_id = max(self._next_id, info.id + 1)
        self.slot_to_info[slot] = info
        return info

    def release(self, slot: int) -> None:
        """Free a slot (object deleted after repeated missed detections)."""
        self.slot_to_info.pop(slot, None)

    @property
    def all_obj_ids(self):
        return [o.id for o in self.slot_to_info.values()]


class TrackerCore:
    def __init__(
        self,
        config: Optional[dict] = None,
        variables=None,
        image_size: Tuple[int, int] = (480, 864),
        max_objects: int = 8,
        mem_frames: int = 16,
        mem_every: int = 5,
        top_k: int = 30,
        num_prototypes: int = 128,
        max_long_term_elements: int = 4096,
        enable_long_term: bool = True,
        dtype=jnp.float32,
        seed: int = 0,
        subpix_tail: bool = False,
        pallas_tail: bool = False,
        flash_readout: bool = False,
        pyramid_adapter: bool = False,
        pyramid_channels=(128, 256, 512),
        quantized_memory: bool = False,
        exact_windows: bool = True,
        affinity_bf16: bool = False,
    ):
        self.subpix_tail = bool(subpix_tail)
        # pallas_tail: run the whole decode tail as one fused Pallas kernel per
        # (frame, object) cell (ops/pallas/decode_tail.py) — the stride-4
        # per-object activations never leave VMEM.  Supersedes subpix_tail
        # when set (same packed-subpixel algebra, kernel-resident).
        self.pallas_tail = bool(pallas_tail)
        # int8 working ring: keys/values stored s8 with per-slot scales; both
        # readout matmuls run s8xs8->s32 on the MXU (within 1e-4 propagation
        # IoU of fp on the shipped checkpoint, delta +0.00001 on 16 eval
        # clips).  The long-term prototype bank has no int8
        # path, so quantized memory requires enable_long_term=False.
        self.quantized_memory = bool(
            (config or {}).get("quantized_memory", quantized_memory)
        )
        # Pallas flash readout: streams the value bank instead of materializing
        # the (Q, M) affinity; no attention-usage signal, so it requires the
        # long-term consolidation path (which consumes usage) to be off.
        self.flash_readout = bool(flash_readout)
        self.config = config or {}
        # exact_windows: windowed batch paths (step_batch, propagate_frames)
        # thread the sensory GRU per frame — numerically the per-frame step()
        # scan at windowed throughput (test_exact_windowed_matches_per_frame).
        # False restores the legacy window approximation (deep-update once per
        # window).
        self.exact_windows = bool(self.config.get("exact_windows", exact_windows))
        # bf16 (Q, M) affinity: halves the readout's largest intermediate;
        # softmax statistics stay fp32 (precision headroom proven by the s8
        # path — see memory_readout_dense)
        self.affinity_bf16 = bool(self.config.get("affinity_bf16", affinity_bf16))
        self.mem_every = int(self.config.get("mem_every", mem_every))
        self.top_k = int(self.config.get("top_k", top_k))
        self.num_prototypes = int(self.config.get("num_prototypes", num_prototypes))
        self.enable_long_term = bool(self.config.get("enable_long_term", enable_long_term))
        lt_capacity = min(
            int(self.config.get("max_long_term_elements", max_long_term_elements)), 8192
        )
        if not self.enable_long_term:
            lt_capacity = 8  # vestigial slots (never valid) keep shapes uniform
        self.max_objects = max_objects
        h, w = image_size
        assert h % 16 == 0 and w % 16 == 0, "image_size must be /16"
        self.image_size = (h, w)
        self.h16, self.w16 = h // 16, w // 16
        self.num_prototypes = min(self.num_prototypes, self.h16 * self.w16)
        if self.enable_long_term and lt_capacity < self.num_prototypes:
            # consolidate() FIFO-writes num_prototypes entries per eviction; a
            # bank smaller than one write would scatter duplicate slots
            # (silent corruption) — reject the config instead.
            raise ValueError(
                f"max_long_term_elements ({lt_capacity}) must be >= "
                f"num_prototypes ({self.num_prototypes})"
            )
        self.dtype = dtype
        self.pyramid_adapter = bool(pyramid_adapter)
        self.net = PropagationNetwork(
            dtype=dtype, with_pyramid_adapter=self.pyramid_adapter,
            pyramid_channels=tuple(pyramid_channels),
        )
        if variables is None:
            # jit the init: eager tracing dispatches one tiny compile per
            # primitive (minutes on CPU); jitted it's a single compile
            variables = jax.jit(self.net.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3), jnp.float32)
            )
        elif isinstance(variables, (str, bytes)):
            # msgpack weights path (apps/train_tracker.py output)
            from flax import serialization

            template = jax.jit(self.net.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3), jnp.float32)
            )
            with open(variables, "rb") as f:
                variables = serialization.from_bytes(template, f.read())
        self.variables = variables
        # memory lives in the compute dtype (bf16 halves readout-matmul cost and
        # HBM traffic; softmax statistics stay fp32 inside the readout)
        if self.quantized_memory and self.enable_long_term:
            raise ValueError(
                "quantized_memory requires enable_long_term=False (the "
                "long-term prototype bank has no int8 readout path)"
            )
        if self.quantized_memory and self.flash_readout:
            raise ValueError(
                "quantized_memory and flash_readout are mutually exclusive "
                "(the Pallas flash kernel has no int8 path; the int8 branch "
                "would silently shadow the flag)"
            )
        self.memory: MemoryState = init_memory(
            self.h16, self.w16, max_objects, mem_frames, dtype,
            num_prototypes=lt_capacity, value_dim=self.net.value_dim,
            quantized=self.quantized_memory,
        )
        self.object_manager = ObjectManager(max_objects)
        # object deletion after consecutive missed detections (DEVA
        # max_missed_detection_count semantics): counts kept host-side so no
        # device fetch is needed per incorporate
        self.max_missed = int(self.config.get("max_missed_detection_count", 10))
        # overlap-suppression threshold for identity matching / duplicate
        # suppression / ghost-kill in match_detections (VERDICT r4 item 1)
        self.overlap_suppress = float(self.config.get("overlap_suppress", 0.6))
        self._missed: Dict[int, int] = {}

        # semionline voting state (reference surface)
        self.frame_buffer: List[FrameInfo] = []
        self.next_voting_frame = 0
        self.curr_ti = -1
        self._long_id = False

        self._jit_step = jax.jit(self._step_impl)
        self._jit_incorporate = jax.jit(self._incorporate_impl)
        self._jit_window = jax.jit(self._window_impl)
        self._jit_align = jax.jit(self._align_impl)
        # feature-level programs (encode once, reuse across voting chains —
        # the image_feature_store analog of DEVA, yolo_with_deva.py:95-97)
        self._jit_encode1 = jax.jit(self._encode1_impl)
        self._jit_step_feats = jax.jit(self._step_from_feats)
        self._jit_incorporate_feats = jax.jit(self._incorporate_from_feats)

    # ------------------------------------------------------------------
    # device programs
    # ------------------------------------------------------------------

    def _encode1_impl(self, variables, image):
        """Encode ONE frame → (key (H16, W16, Ck), skips0 single-frame dict)."""
        key, skips = self.net.apply(
            variables, image[None], method=PropagationNetwork.encode_key
        )
        return key[0], {k: v[0] for k, v in skips.items()}

    def _encode_and_read(self, variables, image, memory: MemoryState):
        key, skips = self.net.apply(
            variables, image[None], method=PropagationNetwork.encode_key
        )
        skips0 = {k: v[0] for k, v in skips.items()}
        readout, memory = self._read(key[0], memory)
        return key[0], skips0, readout, memory

    def _read(self, key, memory: MemoryState):
        """Dense MXU readout over [working ring ‖ long-term prototypes];
        accumulates attention usage on the working entries (consolidation signal)."""
        q = key.reshape(-1, key.shape[-1])
        T, HW = memory.keys.shape[:2]
        if self.quantized_memory:
            readout, usage = memory_readout_dense_int8(
                q, memory.keys, memory.k_scale, memory.values, memory.v_scale,
                memory.valid, out_dtype=self.dtype, return_usage=True,
            )
            memory = memory._replace(usage=memory.usage + usage)
            return readout.reshape(self.max_objects, self.h16, self.w16, -1), memory
        mem_keys = jnp.concatenate(
            [memory.keys.reshape(T * HW, -1), memory.lt_keys], axis=0
        )
        mem_vals = jnp.concatenate(
            [memory.values.reshape(self.max_objects, T * HW, -1), memory.lt_values],
            axis=1,
        )
        mem_valid = jnp.concatenate([jnp.repeat(memory.valid, HW), memory.lt_valid])
        if self.enable_long_term:
            readout, usage = memory_readout_dense(
                q, mem_keys, mem_vals, mem_valid, return_usage=True,
                affinity_bf16=self.affinity_bf16,
            )
            memory = memory._replace(
                usage=memory.usage + usage[: T * HW].reshape(T, HW)
            )
        else:
            # usage feeds only long-term consolidation; skipping it saves one
            # full pass over the (Q, M) weights per readout
            readout = memory_readout_dense(
                q, mem_keys, mem_vals, mem_valid, affinity_bf16=self.affinity_bf16
            )
        readout = readout.reshape(self.max_objects, self.h16, self.w16, -1)
        return readout, memory

    def _read_window(self, keys_w, memory: MemoryState):
        """Readout for a whole window of frames in ONE pair of MXU matmuls.

        keys_w: (w, H16, W16, Ck).  Within a write window the memory is
        constant, so all w frames' queries stack into one (w·HW, M) affinity —
        w× fewer, w× larger matmuls than per-frame readout (the per-frame scan
        at 30×30 queries is latency-bound, not FLOP-bound).  Returns
        readout (w, No, H16, W16, Cv) and the usage-updated memory.
        """
        w = keys_w.shape[0]
        q = keys_w.reshape(w * self.h16 * self.w16, keys_w.shape[-1])
        T, HW = memory.keys.shape[:2]
        if self.quantized_memory:
            readout, usage = memory_readout_dense_int8(
                q, memory.keys, memory.k_scale, memory.values, memory.v_scale,
                memory.valid, out_dtype=self.dtype, return_usage=True,
            )
            memory = memory._replace(usage=memory.usage + usage)
            readout = readout.reshape(
                self.max_objects, w, self.h16, self.w16, -1
            ).transpose(1, 0, 2, 3, 4)
            return readout, memory
        mem_keys = jnp.concatenate(
            [memory.keys.reshape(T * HW, -1), memory.lt_keys], axis=0
        )
        mem_vals = jnp.concatenate(
            [memory.values.reshape(self.max_objects, T * HW, -1), memory.lt_values],
            axis=1,
        )
        mem_valid = jnp.concatenate([jnp.repeat(memory.valid, HW), memory.lt_valid])
        if self.flash_readout and not self.enable_long_term:
            from yolo_puncture_tpu.ops.pallas.mem_attention import memory_readout_pallas

            readout = memory_readout_pallas(q, mem_keys, mem_vals, mem_valid).astype(
                mem_vals.dtype
            )
        elif self.enable_long_term:
            readout, usage = memory_readout_dense(
                q, mem_keys, mem_vals, mem_valid, return_usage=True,
                affinity_bf16=self.affinity_bf16,
            )
            memory = memory._replace(
                usage=memory.usage + usage[: T * HW].reshape(T, HW)
            )
        else:
            # no long-term tier → usage is dead state; skip its (Q, M) pass
            readout = memory_readout_dense(
                q, mem_keys, mem_vals, mem_valid, affinity_bf16=self.affinity_bf16
            )
        readout = readout.reshape(
            self.max_objects, w, self.h16, self.w16, -1
        ).transpose(1, 0, 2, 3, 4)
        return readout, memory

    def _propagate_scan_core(
        self, variables, memory: MemoryState, keys_w, f16_w, exact: bool = False
    ):
        """Memory-coupled part of one window: readout → decoder HEAD (stride-16
        hidden + write-mask logits) → sensory deep-update → ring write.

        The expensive stride-4/8 decode tail is memory-independent given the
        hidden state, so callers run it batched OUTSIDE the scan
        (decode_tail).  The write consumes the stride-16 head mask — the old
        path downsampled the stride-4 decode to stride 16 for the value
        encoder anyway, so the information content of the write is unchanged
        (XMem-style deep update at write frames).

        ``exact=False`` (legacy windowed approximation): all w heads read the
        window-start sensory and the GRU deep-updates ONCE from the last
        frame's hidden — the −0.22 IoU knob of docs/tracker_quality.md.

        ``exact=True`` (per-frame-equivalent): the ring readout stays batched
        over the window — bit-exact vs per-frame ``step()`` because the ring
        only changes at window-end writes — while the cheap stride-16 head +
        sensory GRU thread sequentially through the w frames exactly as the
        per-frame serving loop does.  With write cadence == window and the
        window boundary placed right after a write frame this reproduces the
        per-frame scan's semantics at windowed throughput (the readout matmuls
        and the decode tail, where the FLOPs are, stay batched).

        keys_w (w, H16, W16, Ck); f16_w (w, H16, W16, C).
        Returns (memory, hidden (w, No, H16, W16, C), logits16 (w, No, H16, W16)).
        """
        readout, memory = self._read_window(keys_w, memory)

        def headf(ro, sensory):
            return self.net.apply(
                variables, ro, sensory, method=PropagationNetwork.decode_head
            )

        if exact:
            def body(sensory, ro):
                hidden_i, logits16_i = headf(ro, sensory)
                sensory2 = self.net.apply(
                    variables, sensory, hidden_i,
                    method=PropagationNetwork.update_sensory,
                )
                return sensory2, (hidden_i, logits16_i)

            sensory, (hidden, logits16) = jax.lax.scan(
                body, memory.sensory, readout
            )
        else:
            hidden, logits16 = jax.vmap(lambda ro: headf(ro, memory.sensory))(readout)
            sensory = self.net.apply(
                variables, memory.sensory, hidden[-1],
                method=PropagationNetwork.update_sensory,
            )
        act = memory.active.astype(logits16.dtype)
        prob16_last = soft_aggregate(logits16[-1], act)
        memory = memory._replace(sensory=sensory)
        do_write = jnp.any(memory.active)
        if self.enable_long_term:
            occupied = memory.valid[memory.write_pos]
            memory = consolidate(memory, self.num_prototypes, do_write & occupied)
        memory = self._write(
            variables, memory, keys_w[-1], f16_w[-1], prob16_last[1:], do_write
        )
        memory = memory._replace(frame_idx=memory.frame_idx + keys_w.shape[0])
        return memory, hidden, logits16

    def _decode_tail_batch(self, variables, hidden, f8p, f4p):
        """Batched decode tail: hidden (N, No, H16, W16, C), f8p/f4p (N, …) →
        stride-4 logits (N, No, H4, W4) (memory-independent).

        With ``subpix_tail`` the tail runs as low-resolution parity-packed convs
        (network.decode_tail_subpix) — same math, ~none of the stride-4
        per-object HBM traffic."""
        if self.pallas_tail:
            from yolo_puncture_tpu.ops.pallas.decode_tail import decode_tail_pallas

            return decode_tail_pallas(
                variables, hidden, f8p, f4p, dtype=self.dtype,
                interpret=jax.default_backend() == "cpu",
            )
        if self.subpix_tail:
            from yolo_puncture_tpu.track.network import decode_tail_subpix

            return decode_tail_subpix(variables, hidden, f8p, f4p, dtype=self.dtype)

        def tail(h, f8, f4):
            return self.net.apply(
                variables, h, f8, f4, method=PropagationNetwork.decode_tail
            )

        return jax.vmap(tail)(hidden, f8p, f4p)  # (N, No, H4, W4)

    def propagate_window(
        self, variables, memory: MemoryState, keys_w, skips_w, exact=None,
        return_logits: bool = False,
    ):
        """Propagate a window of w frames as one fixed-shape program.

        Windowed semantics (deliberate deviation, validated by
        tests/test_track.py::test_windowed_propagation_quality): readout and
        decode for all w frames batch in parallel against the window-start
        memory and sensory state; the sensory GRU deep-updates ONCE from the
        last frame's decoder features, and the ring write happens ONCE from the
        last frame's stride-16 head mask (XMem-style deep-update-at-write-frame,
        cadence = w ≡ mem_every).  Sequential length per video drops w×.

        ``exact=True`` threads the sensory GRU per frame inside the window
        (per-frame-equivalent semantics — see _propagate_scan_core).  As with
        ``propagate_frames``, equivalence to per-frame ``step()`` requires
        ``w == mem_every`` and a window boundary right after a write frame
        (``memory.frame_idx % mem_every == 1`` at entry); other alignments
        run the windowed approximation (one write at window end).

        keys_w (w, H16, W16, Ck); skips_w dict of (w, ...) arrays (raw f4/f8
        or preprojected f4p/f8p; f16 always).
        Returns (probs (w, No+1, H4, W4), memory).
        """
        if "f4p" in skips_w:
            f4p, f8p = skips_w["f4p"], skips_w["f8p"]
        else:
            proj = self.net.apply(
                variables, {"f4": skips_w["f4"], "f8": skips_w["f8"]},
                method=PropagationNetwork.project_skips,
            )
            f4p, f8p = proj["f4p"], proj["f8p"]
        act = memory.active
        memory, hidden, _ = self._propagate_scan_core(
            variables, memory, keys_w, skips_w["f16"],
            exact=self.exact_windows if exact is None else exact,
        )
        logits_s4 = self._decode_tail_batch(variables, hidden, f8p, f4p)
        if return_logits:
            # callers upsample LOGITS to full res before soft-aggregating —
            # the per-frame step() output order (decode full_res=True).
            # Aggregating at s4 and upsampling probs instead costs real
            # boundary IoU on thin objects (interpolated probabilities place
            # the decision boundary at 50% between cells; interpolated logits
            # extend high-confidence peaks as the trained decoder expects).
            return logits_s4, memory
        actf = act.astype(logits_s4.dtype)
        probs = jax.vmap(lambda lg: soft_aggregate(lg, actf))(logits_s4)
        return probs, memory

    def _decode_and_update(self, variables, memory, skips0, readout, full_res: bool = True):
        logits, hidden_feat, logits_s16 = self.net.apply(
            variables, readout, skips0, memory.sensory,
            method=PropagationNetwork.decode, full_res=full_res,
        )
        sensory = self.net.apply(
            variables, memory.sensory, hidden_feat, method=PropagationNetwork.update_sensory
        )
        act = memory.active.astype(logits.dtype)
        prob = soft_aggregate(logits, act)
        prob_s16 = soft_aggregate(logits_s16, act)
        return prob, prob_s16, sensory

    def _write(self, variables, memory, key, f16, fg_s16, do_write):
        """fg_s16: (No, h16, w16) per-object foreground probs at stride 16."""

        def compute_and_write(memory):
            mask_s16 = fg_s16[..., None]
            value = self.net.apply(
                variables, f16, mask_s16, memory.sensory,
                method=PropagationNetwork.encode_value,
            )
            key_flat = key.reshape(-1, key.shape[-1])
            val_flat = value.reshape(self.max_objects, -1, value.shape[-1])
            return write_memory(memory, key_flat, val_flat, jnp.asarray(True))

        # lax.cond so non-write frames skip the value-encoder entirely
        return jax.lax.cond(do_write, compute_and_write, lambda m: m, memory)

    def _step_impl(self, variables, memory: MemoryState, image):
        key, skips0, readout, memory = self._encode_and_read(variables, image, memory)
        return self._step_from_feats(variables, memory, key, skips0, readout)

    def _step_from_feats(self, variables, memory: MemoryState, key, skips0, readout=None):
        """Propagate one frame from precomputed features (shared-backbone path:
        key/skips come from encode_pyramid instead of the built-in encoder)."""
        if readout is None:
            readout, memory = self._read(key, memory)
        prob, prob_s16, sensory = self._decode_and_update(variables, memory, skips0, readout)
        memory = memory._replace(sensory=sensory)
        do_write = (memory.frame_idx % self.mem_every == 0) & jnp.any(memory.active)
        # long-term consolidation: before overwriting an occupied ring slot,
        # compact its top-usage elements into the prototype bank (SURVEY §5.7)
        if self.enable_long_term:
            occupied = memory.valid[memory.write_pos]
            memory = consolidate(memory, self.num_prototypes, do_write & occupied)
        memory = self._write(
            variables, memory, key, skips0["f16"], prob_s16[1:], do_write
        )
        memory = memory._replace(frame_idx=memory.frame_idx + 1)
        return prob, memory

    def _incorporate_impl(self, variables, memory: MemoryState, image, det_onehot, det_valid):
        """det_onehot: (No_slots, H, W) float — detection masks stacked into slots
        (slot order arbitrary); det_valid: (No_slots,) bool."""
        key, skips0, readout, memory = self._encode_and_read(variables, image, memory)
        return self._incorporate_from_feats(
            variables, memory, key, skips0, det_onehot, det_valid, readout
        )

    def _incorporate_from_feats(
        self, variables, memory: MemoryState, key, skips0, det_onehot, det_valid,
        readout=None,
    ):
        """Incorporate detections from precomputed features (shared-backbone path)."""
        if readout is None:
            readout, memory = self._read(key, memory)
        prob, prob_s16, sensory = self._decode_and_update(variables, memory, skips0, readout)

        prop_masks = (prob[1:] > 0.5).astype(jnp.float32)  # (No, H, W)
        merged, active, det_to_slot = match_detections(
            prop_masks, memory.active, det_onehot, det_valid,
            overlap_thresh=self.overlap_suppress,
        )

        memory = memory._replace(sensory=sensory, active=active)
        # re-aggregate output prob from merged masks (detections authoritative)
        logits = jnp.log(jnp.clip(merged, 1e-6, 1 - 1e-6) / (1 - jnp.clip(merged, 1e-6, 1 - 1e-6)))
        prob_out = soft_aggregate(logits, active.astype(jnp.float32))
        # memory write is unconditional on incorporate (new reference frame);
        # the written mask is the merged DETECTION mask at stride 16
        fg_s16 = jax.image.resize(
            prob_out[1:], (self.max_objects, self.h16, self.w16), method="bilinear"
        )
        memory = self._write(
            variables, memory, key, skips0["f16"], fg_s16, jnp.asarray(True)
        )
        memory = memory._replace(frame_idx=memory.frame_idx + 1)
        return prob_out, memory, det_to_slot

    def encode_pyramid(self, variables, p3, p4, p5, content_box=None):
        """Shared-backbone encode: detector pyramid (batched NHWC) → (keys
        (B, h16, w16, Ck), skips).  Requires ``pyramid_adapter=True``.

        ``content_box`` (fractions of the pyramid extent) restricts sampling to
        the letterbox content region — pass the letterbox geometry so a
        rectangular tracker grid reads undistorted content (PyramidAdapter
        docstring)."""
        assert self.pyramid_adapter, "TrackerCore(pyramid_adapter=True) required"
        return self.net.apply(
            variables, p3, p4, p5, (self.h16, self.w16),
            method=PropagationNetwork.encode_from_pyramid,
            content_box=content_box,
        )

    def propagate_frames(
        self, variables, memory: MemoryState, keys, skips, window: int,
        exact=None, return_logits: bool = False, full_res_ids: bool = False,
    ):
        """Scan ``propagate_window`` over B = nw·window encoded frames.

        ``exact=True``: per-frame-equivalent semantics (sensory GRU threaded
        through every frame, ring readout still batched per window — see
        _propagate_scan_core).  Write cadence stays ``window`` either way.
        Per-frame equivalence additionally requires ``window == mem_every``
        (enforced below: any other window silently changes the write cadence
        vs ``step()``) and the window boundary to sit right after a write
        frame — i.e. ``memory.frame_idx % mem_every == 1`` at entry, the state
        ``step()`` leaves after a frame whose write fired.  Misaligned entry
        still runs, with writes at window ends instead of the per-frame
        phase (the windowed approximation, measured at −0.001 IoU in
        docs/tracker_quality_serving.md).

        keys (B, H16, W16, Ck); skips dict of (B, ...) arrays.  Returns
        (memory, ids_s4 (B, H4, W4) uint8) — argmax id maps at stride 4 — or:
          * ``return_logits=True`` → (memory, logits_s4 (B, No, H4, W4)):
            callers upsample LOGITS to full res and soft-aggregate (the
            per-frame step() output order);
          * ``full_res_ids=True`` → (memory, ids (B, H, W) uint8): the
            logits-upsample → aggregate → argmax chain done here, batched
            (serving-faithful ids; XLA fuses the upsample into the argmax).
        """
        B = keys.shape[0]
        assert B % window == 0, f"batch {B} must be a multiple of window {window}"
        nw = B // window
        exact_req = self.exact_windows if exact is None else exact
        if exact_req and window != self.mem_every:
            raise ValueError(
                f"exact=True requires window == mem_every "
                f"({self.mem_every}); got window={window}. A different window "
                f"changes the ring-write cadence vs per-frame step() — pass "
                f"exact=False for the windowed approximation at this cadence."
            )

        # 1×1 skip projections AND the stride-4/8 decode tail are memory-
        # independent: only readout → head → sensory → write scans; the tail
        # runs batched over ALL B frames afterwards (full MXU utilization)
        proj = self.net.apply(
            variables, skips, method=PropagationNetwork.project_skips
        )
        act = memory.active

        def wshape(a):
            return a.reshape(nw, window, *a.shape[1:])

        exact = exact_req

        def body(memory, inp):
            keys_w, f16_w = inp
            memory, hidden, _ = self._propagate_scan_core(
                variables, memory, keys_w, f16_w, exact=exact
            )
            return memory, hidden

        memory, hidden = jax.lax.scan(
            body, memory, (wshape(keys), wshape(skips["f16"]))
        )
        hidden = hidden.reshape(B, *hidden.shape[2:])  # (B, No, H16, W16, C)
        logits_s4 = self._decode_tail_batch(variables, hidden, proj["f8p"], proj["f4p"])
        if return_logits:
            return memory, logits_s4
        actf = act.astype(logits_s4.dtype)
        if full_res_ids:
            from yolo_puncture_tpu.ops.masks import upsample_bilinear_matmul

            h, w = self.image_size
            logits = upsample_bilinear_matmul(
                logits_s4.reshape(-1, *logits_s4.shape[2:]), h, w
            ).reshape(*logits_s4.shape[:2], h, w)
            probs = jax.vmap(lambda lg: soft_aggregate(lg, actf))(logits)
            return memory, jnp.argmax(probs, axis=1).astype(jnp.uint8)
        probs = jax.vmap(lambda lg: soft_aggregate(lg, actf))(logits_s4)
        ids_s4 = jnp.argmax(probs, axis=1).astype(jnp.uint8)
        return memory, ids_s4

    def _window_impl(self, variables, memory: MemoryState, images_w):
        """Encode + propagate a window of frames; returns full-res probs.

        Upsamples LOGITS to full res, then soft-aggregates — the same output
        order as the per-frame step() (decode full_res=True), so step_batch
        is output-identical to a step() loop, not just trajectory-identical."""
        keys, skips = self.net.apply(
            variables, images_w, method=PropagationNetwork.encode_key
        )
        act = memory.active
        logits_s4, memory = self.propagate_window(
            variables, memory, keys, skips, return_logits=True
        )
        h, w = self.image_size
        from yolo_puncture_tpu.ops.masks import upsample_bilinear_matmul

        logits = upsample_bilinear_matmul(
            logits_s4.reshape(-1, *logits_s4.shape[2:]), h, w
        ).reshape(*logits_s4.shape[:2], h, w)
        actf = act.astype(logits.dtype)
        probs = jax.vmap(lambda lg: soft_aggregate(lg, actf))(logits)
        return probs, memory

    def _align_impl(self, variables, img_dst, img_src, onehot_src):
        """Project per-object masks from src-frame coords into dst-frame coords
        via key-affinity correspondence (the same matching mechanism the memory
        readout uses; DEVA achieves this alignment by backward propagation).

        img_* (H, W, 3) float[0,1]; onehot_src (No, H, W) {0,1}.
        Returns per-object probs in dst coords (No, H, W) float.
        """
        imgs = jnp.stack([img_dst, img_src])
        keys, _ = self.net.apply(
            variables, imgs, method=PropagationNetwork.encode_key
        )
        # sharpen the affinity (×4 logit temperature): cross-frame alignment
        # wants near-argmax correspondence, not the soft blend the trained
        # readout uses against its multi-frame memory
        q = keys[0].reshape(-1, keys.shape[-1]) * 4.0    # dst queries (HW, Ck)
        k = keys[1].reshape(-1, keys.shape[-1])          # src keys
        m16 = jax.image.resize(
            onehot_src, (onehot_src.shape[0], self.h16, self.w16), method="bilinear"
        ).reshape(onehot_src.shape[0], -1, 1)            # (No, HW, 1) as "values"
        valid = jnp.ones((k.shape[0],), bool)
        probs = memory_readout_dense(q, k, m16.astype(keys.dtype), valid)
        probs = probs.reshape(onehot_src.shape[0], self.h16, self.w16)
        h, w = self.image_size
        from yolo_puncture_tpu.ops.masks import upsample_bilinear_matmul

        return upsample_bilinear_matmul(probs.astype(jnp.float32), h, w)

    def _pack_id_mask(self, mask: np.ndarray):
        """Integer id mask → (onehot (No, H, W) f32, valid (No,), ids list),
        resized to self.image_size (nearest) if needed."""
        import cv2

        h, w = self.image_size
        m = np.asarray(mask)
        if m.shape != (h, w):
            m = cv2.resize(m.astype(np.int32), (w, h), interpolation=cv2.INTER_NEAREST)
        ids = [i for i in np.unique(m) if i != 0][: self.max_objects]
        onehot = np.zeros((self.max_objects, h, w), np.float32)
        valid = np.zeros((self.max_objects,), bool)
        for j, i in enumerate(ids):
            onehot[j] = m == i
            valid[j] = True
        return onehot, valid, m, ids

    def encode_frame_features(self, image: np.ndarray):
        """Encode one frame to reusable (key, skips) features — the
        image_feature_store analog (frames encoded once, reused across the
        voting chains and any step-from-features call)."""
        return self._jit_encode1(self.variables, self._prep_image(image))

    def propagate_mask_backward(
        self, images: Sequence[np.ndarray], mask_src: np.ndarray,
        conf: float = 0.5, feats: Optional[Sequence] = None,
    ) -> np.ndarray:
        """Project ``mask_src`` (id mask in ``images[-1]`` coords) into
        ``images[0]`` coords by TRUE backward propagation — DEVA's spatial
        alignment mechanism (deva vote_in_temporary_buffer propagates each
        buffered detection back to the keyframe before voting).

        A SCRATCH memory (same pytree shapes as ``self.memory`` → the jitted
        step/incorporate programs cache-hit) is seeded with the detection at
        the last frame, then stepped through ``images[-2], …, images[0]``;
        the probability emitted at ``images[0]`` is the detection expressed in
        keyframe coordinates.  ``self.memory`` is untouched.

        ``feats``: optional pre-encoded per-frame features
        (encode_frame_features) aligned with ``images`` — callers running
        several chains over the same buffer encode each frame ONCE instead of
        once per chain.
        """
        assert len(images) >= 2, "need [dst, …, src] with at least two frames"
        onehot, valid, m, ids = self._pack_id_mask(mask_src)
        if not ids:
            return np.zeros(self.image_size, np.asarray(mask_src).dtype)
        if feats is None:
            feats = [self.encode_frame_features(im) for im in images]
        assert len(feats) == len(images)
        scratch = jax.tree.map(jnp.zeros_like, self.memory)
        key_s, skips_s = feats[-1]
        prob, scratch, det_to_slot = self._jit_incorporate_feats(
            self.variables, scratch, key_s, skips_s,
            jnp.asarray(onehot), jnp.asarray(valid),
        )
        for key, skips0 in reversed(feats[:-1]):
            prob, scratch = self._jit_step_feats(
                self.variables, scratch, key, skips0
            )
        prob = np.asarray(prob)          # (No+1, H, W); channel 0 = background
        det_to_slot = np.asarray(det_to_slot)
        out = np.zeros(self.image_size, np.asarray(mask_src).dtype)
        best = prob.argmax(0)
        for j, i in enumerate(ids):
            slot = int(det_to_slot[j])
            if slot < 0:
                continue
            out[(best == slot + 1) & (prob[slot + 1] > conf)] = i
        return out

    def align_mask_to(self, image_dst, image_src, mask_src: np.ndarray) -> np.ndarray:
        """Host API: integer id mask in src-frame coords → id mask aligned to
        dst-frame coords (ids preserved; 0 = background/unmatched)."""
        img_d = self._prep_image(image_dst)
        img_s = self._prep_image(image_src)
        onehot, _valid, m, ids = self._pack_id_mask(mask_src)
        h, w = self.image_size
        probs = np.asarray(
            self._jit_align(self.variables, img_d, img_s, jnp.asarray(onehot))
        )
        out = np.zeros((h, w), m.dtype)
        best = probs.argmax(0)
        conf = probs.max(0)
        for j, i in enumerate(ids):
            out[(best == j) & (conf > 0.4)] = i
        return out

    # ------------------------------------------------------------------
    # host API (reference surface)
    # ------------------------------------------------------------------

    def _prep_image(self, image: np.ndarray) -> jnp.ndarray:
        """HWC uint8/float RGB → fixed (H, W, 3) float in [0,1]."""
        import cv2

        h, w = self.image_size
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        return jnp.asarray(img.astype(np.float32) / 255.0)

    def step(self, image, mask=None, objects=None):
        """Propagate one frame.  Returns prob (No+1, H, W) numpy."""
        if mask is not None:
            seg_info = (
                [ObjectInfo(id=i + 1) for i in range(int(np.max(mask)))]
                if objects is None
                else objects
            )
            return self.incorporate_detection(image, mask, seg_info)
        self.curr_ti += 1
        img = self._prep_image(image)
        prob, self.memory = self._jit_step(self.variables, self.memory, img)
        return np.asarray(prob)

    def step_batch(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """Propagate a run of detection-free frames in windows of ``mem_every``.

        Windowed fast path (propagate_window semantics: batched readout/decode
        per write window, sensory deep-update at write frames — validated by
        tests/test_track.py::test_windowed_propagation_quality).  A trailing
        partial window (T not a multiple of ``mem_every``, e.g. the serving
        scheduler's detection_every-1 runs) is propagated with per-frame
        ``step()`` calls — per-frame semantics by construction, so the run
        neither writes a padded duplicate frame into the ring nor advances
        ``frame_idx`` past the real frame count (round-3 padded the window by
        repeating the final frame, which did both).  Returns probs
        (T, No+1, H, W).
        """
        T = len(images)
        if T == 0:
            h, w = self.image_size
            return np.zeros((0, self.max_objects + 1, h, w), np.float32)
        w = max(1, self.mem_every)
        prepped = [self._prep_image(im) for im in images]
        rem = T % w
        outs = []
        for i in range(0, T - rem, w):
            chunk = jnp.stack(prepped[i : i + w])
            probs, self.memory = self._jit_window(self.variables, self.memory, chunk)
            outs.append(np.asarray(probs))
        for i in range(T - rem, T):
            prob, self.memory = self._jit_step(self.variables, self.memory, prepped[i])
            outs.append(np.asarray(prob)[None])
        self.curr_ti += T
        return np.concatenate(outs, axis=0)

    def incorporate_detection(self, image, mask, segments_info, incremental: bool = True):
        """mask: (H, W) integer id mask (ids index segments_info order, 1-based)."""
        import cv2

        self.curr_ti += 1
        img = self._prep_image(image)
        h, w = self.image_size
        m = np.asarray(mask)
        if hasattr(m, "device"):  # jax array ok via asarray
            m = np.asarray(m)
        if m.shape != (h, w):
            m = cv2.resize(m.astype(np.int32), (w, h), interpolation=cv2.INTER_NEAREST)
        No = self.max_objects
        onehot = np.zeros((No, h, w), np.float32)
        valid = np.zeros((No,), bool)
        infos = list(segments_info or [])[:No]
        for j, info in enumerate(infos):
            onehot[j] = m == (j + 1)
            valid[j] = onehot[j].sum() > 0
        prob, self.memory, det_to_slot = self._jit_incorporate(
            self.variables, self.memory, img, jnp.asarray(onehot), jnp.asarray(valid)
        )
        det_to_slot = np.asarray(det_to_slot)
        for j, info in enumerate(infos):
            slot = int(det_to_slot[j])
            if slot >= 0 and slot not in self.object_manager.slot_to_info:
                # a new slot gets a FRESH global id when the incoming segment id
                # is already in use (auto_segment numbers segments 1..n per
                # call, so a spawned second object would otherwise collide with
                # an established object's external id — DEVA's ObjectManager
                # likewise assigns new global ids on incorporation)
                if info.id in self.object_manager.all_obj_ids:
                    info = ObjectInfo(
                        id=self.object_manager._next_id,
                        score=info.score,
                        category_id=info.category_id,
                    )
                self.object_manager.allocate(slot, info)
        # ghost-kill bookkeeping: match_detections may deactivate a duplicate
        # slot of an object now owned elsewhere — purge it immediately
        new_active = np.asarray(self.memory.active)
        matched = {int(s) for s in det_to_slot if s >= 0}
        for slot in list(self.object_manager.slot_to_info):
            if not new_active[slot] and slot not in matched:
                self._release_slot(slot)
        # object deletion (DEVA max_missed_detection_count): a tracked object
        # unmatched by detections for max_missed consecutive incorporate calls
        # frees its slot (and purges its per-slot memory) so long videos never
        # exhaust the fixed max_objects slots on transient objects
        for slot in list(self.object_manager.slot_to_info):
            if slot in matched:
                self._missed[slot] = 0
            else:
                self._missed[slot] = self._missed.get(slot, 0) + 1
                if self._missed[slot] >= self.max_missed:
                    self._release_slot(slot)
        return np.asarray(prob)

    def _release_slot(self, slot: int) -> None:
        """Deactivate a slot and purge its memory so a future object reusing
        the slot never reads the deleted object's values."""
        self.memory = self.memory._replace(
            active=self.memory.active.at[slot].set(False),
            values=self.memory.values.at[slot].set(0),
            lt_values=self.memory.lt_values.at[slot].set(0),
            sensory=self.memory.sensory.at[slot].set(0),
        )
        self.object_manager.release(slot)
        self._missed.pop(slot, None)

    # -- semionline buffer / voting (yolo_with_deva.py:132-187 surface) -----

    def add_to_temporary_buffer(self, frame_info: FrameInfo):
        self.frame_buffer.append(frame_info)

    def clear_buffer(self):
        self.frame_buffer = []

    def vote_in_temporary_buffer(self, keyframe_selection: str = "first"):
        """Pixel-majority vote over the buffered detection masks.

        Objects are anchored to the keyframe ('first'); a keyframe object survives
        if its mask region is detected (IoU>0.5 with some object) in ≥ half the
        buffered frames.  Returns (ti, voted mask, segments_info) like DEVA.

        With ``config['align_voting']`` each buffered detection is first
        projected into keyframe coordinates so fast-moving objects still
        accumulate votes.  Two alignment modes:
          * ``'propagate'`` — TRUE backward propagation through the buffered
            frames with a scratch memory (propagate_mask_backward), DEVA's
            exact mechanism;
          * any other truthy value — single-hop key-affinity correspondence
            (align_mask_to), cheaper (one program vs a chain of steps).
        """
        assert keyframe_selection == "first"
        assert self.frame_buffer, "empty voting buffer"
        keyframe = self.frame_buffer[0]
        key_mask = np.asarray(keyframe.mask)
        key_infos = list(keyframe.segments_info or [])
        n_frames = len(self.frame_buffer)
        align = self.config.get("align_voting", False)

        def img_of(fi):
            return fi.image_np if fi.image_np is not None else fi.image

        # propagate mode: encode every buffered frame ONCE up front; the i-th
        # chain reuses the cached features (without this, frame k re-encodes
        # in every chain i>k — O(n²) encoder passes per vote)
        feat_cache = (
            [self.encode_frame_features(img_of(f)) for f in self.frame_buffer]
            if align == "propagate" and len(key_infos)
            else None
        )
        votes = {j: 1 for j in range(1, len(key_infos) + 1)}
        for i, fi in enumerate(self.frame_buffer[1:], start=1):
            if not votes:  # no keyframe objects — nothing to vote on
                break
            m = np.asarray(fi.mask)
            if align == "propagate":
                chain = [img_of(f) for f in self.frame_buffer[: i + 1]]
                m = self.propagate_mask_backward(
                    chain, m, feats=feat_cache[: i + 1]
                )
            elif align:
                m = self.align_mask_to(img_of(keyframe), img_of(fi), m)
            if m.shape != key_mask.shape:
                import cv2

                m = cv2.resize(
                    m.astype(np.int32), key_mask.shape[::-1], interpolation=cv2.INTER_NEAREST
                )
            for j in list(votes):
                a = key_mask == j
                if not a.any():
                    continue
                ids, counts = np.unique(m[a], return_counts=True)
                best = ids[np.argmax(counts)]
                if best == 0:
                    continue
                b = m == best
                iou = (a & b).sum() / max((a | b).sum(), 1)
                if iou > 0.5:
                    votes[j] += 1
        keep = [j for j, v in votes.items() if v >= max(1, (n_frames + 1) // 2)]
        out_mask = np.zeros_like(key_mask)
        new_infos = []
        for new_id, j in enumerate(keep, start=1):
            out_mask[key_mask == j] = new_id
            new_infos.append(key_infos[j - 1])
        return keyframe.ti, out_mask, new_infos

    def enabled_long_id(self):
        self._long_id = True

    @property
    def memory_engaged(self) -> bool:
        return bool(np.asarray(self.memory.valid).any())
